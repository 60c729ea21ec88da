"""Block matching costs: SAD and Hadamard SATD, batched.

Counterpart: kvazaar `picture` / sad/satd strategies (Compression group,
avx2/sse41 `*_sad_*`, `*_satd_*`).  Used for intra mode decision now and
integer motion estimation later; formulated as matmuls (MXU) over mode/block
batches.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


_H8 = jnp.asarray(_hadamard(8))
_H4 = jnp.asarray(_hadamard(4))


def sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences over trailing 2 dims."""
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


def satd8(diff: jnp.ndarray) -> jnp.ndarray:
    """8x8 Hadamard SATD of residual blocks (..., 8, 8) -> (...,)."""
    t = jnp.matmul(_H8, jnp.matmul(diff, _H8, preferred_element_type=jnp.int32),
                   preferred_element_type=jnp.int32)
    return (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 2) >> 2


def satd4(diff: jnp.ndarray) -> jnp.ndarray:
    t = jnp.matmul(_H4, jnp.matmul(diff, _H4, preferred_element_type=jnp.int32),
                   preferred_element_type=jnp.int32)
    return (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 1) >> 1


def satd_blocks(a: jnp.ndarray, b: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """SATD of (..., N, N) vs (..., N, N) tiled into `block`-sized Hadamards."""
    n = a.shape[-1]
    diff = (a - b).astype(jnp.int32)
    if n < block:
        return satd4(diff) if n == 4 else sad(a, b)
    bs = n // block
    d = diff.reshape(*diff.shape[:-2], bs, block, bs, block).swapaxes(-3, -2)
    per = satd8(d) if block == 8 else satd4(d)
    return jnp.sum(per, axis=(-2, -1))
