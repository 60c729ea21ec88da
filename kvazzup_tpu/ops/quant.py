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


def _table6(table, rem):
    """table[rem] for a 6-entry table WITHOUT a gather: with traced qp the
    indexed load lowers to a per-element gather on TPU (profiled ~4.5 ms
    per 1080p quantize call); six selects are pure VPU ops."""
    out = jnp.full(rem.shape, int(table[0]), jnp.int32)
    for k in range(1, 6):
        out = jnp.where(rem == k, jnp.int32(int(table[k])), out)
    return out


def _bcast(qp, like):
    """Broadcast a scalar or leading-dims qp array against coefficients."""
    qp = jnp.asarray(qp, jnp.int32)
    while qp.ndim < like.ndim:
        qp = qp[..., None]
    return qp


def _dz_num(intra, like):
    """Deadzone numerator: static bool or traced per-lane array (171/85)."""
    if isinstance(intra, bool):
        return jnp.int32(171 if intra else 85)
    intra = jnp.asarray(intra)
    while intra.ndim < like.ndim:
        intra = intra[..., None]
    return jnp.where(intra, jnp.int32(171), jnp.int32(85))


def _pallas_2d_ok(x) -> bool:
    """Route large flat batches to the fused Pallas kernel on TPU: one
    HBM read+write instead of a chain of fusion-boundary round-trips.
    Small (in-wave, lanes-wide) calls stay on the jnp path — padding to
    the Pallas tile would cost more than it saves."""
    from .pallas_q import pallas_enabled

    return (x.ndim == 2 and x.shape[0] >= 256 and x.shape[1] % 128 == 0
            and pallas_enabled())


def quantize(coef: jnp.ndarray, qp, log2: int, intra=True,
             bd: int = 8) -> jnp.ndarray:
    """Forward quantization of transform coefficients (..., N, N) -> levels.

    qp may be a scalar or an array matching coef's leading dims (per-CTU
    adaptive QP / ROI); `intra` may be a traced per-lane bool array (mixed
    intra/inter waves quantize in ONE pass instead of two)."""
    if bd == 8 and _pallas_2d_ok(coef) and jnp.asarray(qp).ndim <= 1 and (
            isinstance(intra, bool) or jnp.asarray(intra).ndim <= 1):
        from .pallas_q import quantize_2d

        b = coef.shape[0]
        qp_col = jnp.broadcast_to(jnp.asarray(qp, jnp.int32),
                                  (b,)).reshape(b, 1)
        if isinstance(intra, bool):
            dz = jnp.full((b, 1), 171 if intra else 85, jnp.int32)
        else:
            dz = jnp.where(jnp.broadcast_to(jnp.asarray(intra), (b,)),
                           171, 85).astype(jnp.int32).reshape(b, 1)
        return quantize_2d(coef, qp_col, dz, log2)
    qp = _bcast(qp, coef)
    per, rem = qp // 6, qp % 6
    # QUANT_SHIFT(14) + per + transformShift(15 - bd - log2)
    qbits = 29 - bd + per - log2
    offset = jnp.left_shift(_dz_num(intra, coef), qbits - 9)
    scale = _table6(QUANT_SCALES, rem)
    mag = jnp.right_shift(jnp.abs(coef) * scale + offset, qbits)
    mag = jnp.clip(mag, 0, 32767)
    return jnp.where(coef < 0, -mag, mag)


def dequantize(level: jnp.ndarray, qp, log2: int, bd: int = 8) -> jnp.ndarray:
    """Normative scaling (8.6.3) with flat lists (m=16).

    Factored as in HM to keep every intermediate within int32 (the spec's
    `(level*m*levScale << per)` form can overflow 32 bits at high QP):
    right-shift by (bdShift - per) when positive, else left-shift.
    """
    if bd == 8 and _pallas_2d_ok(level) and jnp.asarray(qp).ndim <= 1:
        from .pallas_q import dequantize_2d

        b = level.shape[0]
        qp_col = jnp.broadcast_to(jnp.asarray(qp, jnp.int32),
                                  (b,)).reshape(b, 1)
        return dequantize_2d(level, qp_col, log2, bd)
    qp = _bcast(qp, level)
    per, rem = qp // 6, qp % 6
    bd_shift = bd + log2 - 5  # BitDepth + log2 + 10 - 15
    scale = _table6(DEQUANT_SCALES, rem) * 16
    sh = bd_shift - per
    rsh = jnp.maximum(sh, 1)
    d_right = jnp.right_shift(level * scale + jnp.left_shift(1, rsh - 1), rsh)
    d_left = jnp.left_shift(level * scale, jnp.maximum(-sh, 0))
    d = jnp.where(sh > 0, d_right, d_left)
    return jnp.clip(d, -32768, 32767)


def dequantize_scaled(level: jnp.ndarray, qp, log2: int, m: jnp.ndarray,
                      bd: int = 8) -> jnp.ndarray:
    """Normative scaling (8.6.3) with an explicit ScalingFactor matrix m.

    d = (level * m * levScale[qP%6] << (qP/6) + (1 << (bdShift-1))) >> bdShift
    computed overflow-safely in int32: |level*m*levScale| <= 32767*255*72
    < 2^31; the rare left-shift branch saturates pre-shift (anything that
    large clips to +-32767 afterwards anyway)."""
    qp = _bcast(qp, level)
    per, rem = qp // 6, qp % 6
    bd_shift = bd + log2 - 5
    x = level * (jnp.asarray(m, jnp.int32) * _table6(DEQUANT_SCALES, rem))
    sh = bd_shift - per
    rsh = jnp.maximum(sh, 1)
    d_right = jnp.right_shift(x + jnp.left_shift(1, rsh - 1), rsh)
    lsh = jnp.maximum(-sh, 0)
    x_sat = jnp.clip(x, -(1 << 27), (1 << 27) - 1)
    d_left = jnp.left_shift(x_sat, lsh)
    d = jnp.where(sh > 0, d_right, d_left)
    return jnp.clip(d, -32768, 32767)


def quantize_rdoq(coef: jnp.ndarray, qp, log2: int, lam, intra=True,
                  bd: int = 8) -> jnp.ndarray:
    """Rate-distortion optimized quantization (vectorized RDOQ-lite).

    Per coefficient, compares the deadzone level against level-1 (and 0) by
    distortion + lambda * rate, in exact num-domain units: with
    e = |coef|*Q - l*2^qbits, pixel-domain SSE ~ e^2 * 2^(2(log2-7)) / Q^2,
    so the comparison uses e^2 + lamq * bits with
    lamq = lam * Q^2 * 2^(14 - 2*log2).  Captures the bulk of trellis RDOQ's
    gain as one dense pass (the role of kvazaar's rdo.c / fast_coeff path).
    """
    qp = _bcast(qp, coef)
    per, rem = qp // 6, qp % 6
    qbits = 29 - bd + per - log2
    scale = _table6(QUANT_SCALES, rem)
    lam = jnp.asarray(lam, jnp.float32)
    while lam.ndim < coef.ndim:
        lam = lam[..., None]

    num = jnp.abs(coef) * scale  # exact integer
    offset = jnp.left_shift(_dz_num(intra, coef), qbits - 9)
    l_dz = jnp.right_shift(num + offset, qbits)  # deadzone level (upper cand)

    numf = num.astype(jnp.float32)
    stepf = jnp.exp2(qbits.astype(jnp.float32))
    scalef = scale.astype(jnp.float32)
    # pixel-domain SSE ~ e^2 * 2^(2*(log2 + bd - 15)) / Q^2, so the
    # num-domain rate weight is lam * Q^2 * 2^(30 - 2*bd - 2*log2)
    lamq = lam * scalef * scalef * jnp.exp2(jnp.float32(30 - 2 * bd
                                                        - 2 * log2))

    def bits_of(l):
        return 2.0 * jnp.log2(l + 1.0) + 1.0

    def cost(l):
        lf = l.astype(jnp.float32)
        e = numf - lf * stepf
        rate = jnp.where(l == 0, 0.0, bits_of(lf) + 1.0)  # + sig flag
        return e * e + lamq * rate

    l1 = jnp.maximum(l_dz - 1, 0)
    l2 = jnp.maximum(l_dz - 2, 0)  # allows 1 -> 0 when l_dz == 2? (guarded)
    best = jnp.where(cost(l1) < cost(l_dz), l1, l_dz)
    best = jnp.where((l_dz <= 2) & (cost(l2) < cost(best)), l2, best)
    best = jnp.clip(best, 0, 32767)
    return jnp.where(coef < 0, -best, best)
