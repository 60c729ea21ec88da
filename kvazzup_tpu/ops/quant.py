"""Scalar quantization: encoder quant (HM-compatible) + normative dequant.

Counterpart: kvazaar `quant*.c` / `rdo.c` (Compression group).  Flat scaling
lists (scaling_list_enabled = 0); 8-bit.

QP is a *traced* scalar throughout (shift amounts become vector ops), so a
rate controller can retune QP per frame/CTU without recompilation — the
live-bitrate contract of the reference's ResourceAllocator
(/root/reference/src/media/resourceallocator.cpp:67-104).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.tables import DEQUANT_SCALES, QUANT_SCALES

_QUANT = jnp.asarray(QUANT_SCALES)
_DEQUANT = jnp.asarray(DEQUANT_SCALES)


def _bcast(qp, like):
    """Broadcast a scalar or leading-dims qp array against coefficients."""
    qp = jnp.asarray(qp, jnp.int32)
    while qp.ndim < like.ndim:
        qp = qp[..., None]
    return qp


def quantize(coef: jnp.ndarray, qp, log2: int, intra: bool = True) -> jnp.ndarray:
    """Forward quantization of transform coefficients (..., N, N) -> levels.

    qp may be a scalar or an array matching coef's leading dims (per-CTU
    adaptive QP / ROI)."""
    qp = _bcast(qp, coef)
    per, rem = qp // 6, qp % 6
    qbits = 21 + per - log2  # QUANT_SHIFT(14) + per + transformShift(7-log2)
    offset = jnp.left_shift(jnp.int32(171 if intra else 85), qbits - 9)
    scale = _QUANT[rem]
    mag = jnp.right_shift(jnp.abs(coef) * scale + offset, qbits)
    mag = jnp.clip(mag, 0, 32767)
    return jnp.where(coef < 0, -mag, mag)


def dequantize(level: jnp.ndarray, qp, log2: int) -> jnp.ndarray:
    """Normative scaling (8.6.3) with flat lists (m=16).

    Factored as in HM to keep every intermediate within int32 (the spec's
    `(level*m*levScale << per)` form can overflow 32 bits at high QP):
    right-shift by (bdShift - per) when positive, else left-shift.
    """
    qp = _bcast(qp, level)
    per, rem = qp // 6, qp % 6
    bd_shift = log2 + 3  # BitDepth(8) + log2 + 10 - 15
    scale = _DEQUANT[rem] * 16
    sh = bd_shift - per
    rsh = jnp.maximum(sh, 1)
    d_right = jnp.right_shift(level * scale + jnp.left_shift(1, rsh - 1), rsh)
    d_left = jnp.left_shift(level * scale, jnp.maximum(-sh, 0))
    d = jnp.where(sh > 0, d_right, d_left)
    return jnp.clip(d, -32768, 32767)
