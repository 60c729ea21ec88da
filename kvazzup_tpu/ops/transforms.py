"""HEVC integer transforms as batched device ops.

Forward DCT/DST (encoder side, HM-compatible scaling) and the normative
inverse transform (H.265 8.6.4) with exact integer arithmetic.  Both are
expressed as two matrix multiplications over a batch of blocks — the shape
XLA tiles straight onto the MXU (SURVEY.md §7: transform/quant is a
speed-of-light target).

Counterpart: kvazaar Reconstruction group `transform.c` + strategies
(avx2/sse41 dct kernels) — here one batched formulation replaces the SIMD
dispatch (/root/reference survey §2.6: "dispatch = jit specialization").

Bit depth is fixed at 8 in v1; the shift constants below take bitDepth=8.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import tables

# device-resident transform matrices
_MAT = {n: jnp.asarray(tables.dct_matrix(n), dtype=jnp.int32) for n in (4, 8, 16, 32)}
_DST4 = jnp.asarray(tables.DST4, dtype=jnp.int32)


def _matmul(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.int32)


def _rshift_round(x, shift: int):
    return (x + (1 << (shift - 1))) >> shift


def fwd_transform(resid: jnp.ndarray, log2: int, dst: bool = False) -> jnp.ndarray:
    """Forward transform of residual blocks.

    resid: (..., N, N) int32 with N = 1 << log2 (rows = y, cols = x).
    Returns coefficient blocks (..., N, N) int32, [vertical freq][horizontal
    freq] — i.e. C = M @ R @ M^T with HM scaling (stage shifts log2-1 and
    log2+6 for 8-bit).
    """
    n = 1 << log2
    m = _DST4 if (dst and n == 4) else _MAT[n]
    s1 = log2 - 1
    s2 = log2 + 6
    tmp = _rshift_round(_matmul(m, resid), s1)
    coef = _rshift_round(_matmul(tmp, m.T), s2)
    return coef


def inv_transform(coef: jnp.ndarray, log2: int, dst: bool = False,
                  bd: int = 8) -> jnp.ndarray:
    """Normative inverse transform (8.6.4): R = M^T @ C @ M with stage
    shifts 7 and 20 - bd, intermediate clipped to 16-bit."""
    n = 1 << log2
    m = _DST4 if (dst and n == 4) else _MAT[n]
    tmp = _rshift_round(_matmul(m.T, coef), 7)
    tmp = jnp.clip(tmp, -32768, 32767)
    res = _rshift_round(_matmul(tmp, m), 20 - bd)
    return jnp.clip(res, -32768, 32767)


def transform_matrices(log2: int, dst: bool = False) -> np.ndarray:
    n = 1 << log2
    return tables.DST4 if (dst and n == 4) else tables.dct_matrix(n)
