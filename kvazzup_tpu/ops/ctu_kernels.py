"""CTU compute as dense matmuls — the MXU formulation of the hot path.

Small (16x16) integer tensor ops waste the TPU's 8x128 vector lanes and
never touch the MXU.  This module reformulates the per-CTU pipeline over
flattened blocks (batch, N*N):

* all-35-mode intra prediction  = one (batch, 130) @ (130, 35*N^2) matmul
  over the [raw | filtered] boundary walk (every HEVC intra mode is a
  linear map of the reference samples up to the final rounding shift; DC
  and the mode-10/26 edge clips are small fixups),
* 2-D DCT stages                = Kronecker-factor (N^2, N^2) matmuls,
* Hadamard SATD                 = one (batch, N^2) @ (N^2, N^2) matmul.

All matmuls run in f32 with exact integer semantics: operands are bounded
so products accumulate below 2^24, with 8-bit limb splitting where inputs
exceed 9 bits.  Every function returns bit-identical results to the
reference ops in transforms.py / intra.py / satd.py (asserted by tests).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import tables
from . import intra as intra_ops
from .satd import _hadamard
from .transforms import transform_matrices

# ---------------------------------------------------------------- helpers


def _mm(x, w):
    return jnp.matmul(x, w, preferred_element_type=jnp.float32)


def exact_matmul_small(x_int, w_f32):
    """Exact integer matmul for |x| * row_sum(|w|) < 2^24."""
    return _mm(x_int.astype(jnp.float32), w_f32).astype(jnp.int32)


def exact_matmul_i17(x_int, w_f32):
    """Exact integer matmul for up-to-17-bit |x| via 8-bit limb split."""
    hi = x_int >> 8
    lo = x_int & 255
    yh = _mm(hi.astype(jnp.float32), w_f32).astype(jnp.int32)
    yl = _mm(lo.astype(jnp.float32), w_f32).astype(jnp.int32)
    return yh * 256 + yl


# ------------------------------------------------------------- transforms


@functools.lru_cache(maxsize=None)
def _kron_stages(log2: int, dst: bool, inverse: bool):
    m = transform_matrices(log2, dst).astype(np.float32)
    n = 1 << log2
    eye = np.eye(n, dtype=np.float32)
    if not inverse:
        # stage1: rows <- M @ R ; stage2: cols <- T @ M^T
        w1 = np.kron(m.T, eye)
        w2 = np.kron(eye, m.T)
    else:
        # stage1: rows <- M^T @ C ; stage2: cols <- T @ M
        w1 = np.kron(m, eye)
        w2 = np.kron(eye, m)
    return w1, w2


def fwd_transform_flat(resid, log2: int, dst: bool = False, bd: int = 8):
    """resid: (..., N^2) int32 in [-(2^bd - 1), 2^bd - 1] -> coeffs.

    Stage-1 shift is log2 + bd - 9 (the encoder-side transform shift);
    stage 2 is bd-invariant."""
    w1, w2 = _kron_stages(log2, dst, inverse=False)
    s1 = log2 + bd - 9
    s2 = log2 + 6
    tmp = (exact_matmul_small(resid, jnp.asarray(w1)) + (1 << (s1 - 1))) >> s1
    return (exact_matmul_i17(tmp, jnp.asarray(w2)) + (1 << (s2 - 1))) >> s2


def inv_transform_flat(coef, log2: int, dst: bool = False, bd: int = 8):
    """coef: (..., N^2) int16-range int32 -> residual (..., N^2).

    Final shift is 20 - bd (8.6.4: bdShift)."""
    w1, w2 = _kron_stages(log2, dst, inverse=True)
    tmp = (exact_matmul_i17(coef, jnp.asarray(w1)) + 64) >> 7
    tmp = jnp.clip(tmp, -32768, 32767)
    res = (exact_matmul_i17(tmp, jnp.asarray(w2))
           + (1 << (19 - bd))) >> (20 - bd)
    return jnp.clip(res, -32768, 32767)


# ------------------------------------------------------------------ SATD


@functools.lru_cache(maxsize=None)
def _satd_weights(log2: int):
    """(N^2, N^2) map computing per-8x8-subblock Hadamard coefficients."""
    n = 1 << log2
    b = min(8, n)
    h = _hadamard(b)
    nsb = n // b
    w = np.zeros((n * n, n * n), np.float32)
    for sy in range(nsb):
        for sx in range(nsb):
            for u in range(b):
                for v in range(b):
                    o = ((sy * nsb + sx) * b + u) * b + v
                    for y in range(b):
                        for x in range(b):
                            w[(sy * b + y) * n + (sx * b + x), o] = h[u, y] * h[v, x]
    return w


def satd_flat(a, b, log2: int):
    """SATD between (..., N^2) blocks; bit-identical to satd.satd_blocks."""
    n = 1 << log2
    bsz = min(8, n)
    # K <= 1024: the (K, K) Hadamard-kron weight must fit VMEM (4 MB at
    # 32x32; the 4096-case block-diagonal stays on the XLA path)
    if (a.ndim == 2 and a.shape[0] >= 256 and a.shape[1] % 128 == 0
            and a.shape[1] <= 1024):
        from .pallas_q import pallas_enabled, satd_2d

        if pallas_enabled():
            return satd_2d(a, b, jnp.asarray(_satd_weights(log2)), log2)
    diff = (a - b).astype(jnp.int32)
    t = exact_matmul_small(diff, jnp.asarray(_satd_weights(log2)))
    nsb = (n // bsz) ** 2
    t = jnp.abs(t).reshape(t.shape[:-1] + (nsb, bsz * bsz)).sum(axis=-1)
    if bsz == 8:
        per = (t + 2) >> 2
    else:
        per = (t + 1) >> 1
    return per.sum(axis=-1)


# ----------------------------------------------------------- intra modes


@functools.lru_cache(maxsize=None)
def _intra_weights(log2: int, is_luma: bool):
    """(130, 35*N^2) weight matrix + bias for the shift-5 main path.

    Modes 2..34 and planar (0) are produced by the matmul; mode 1 (DC) and
    the mode-10/26 edge clips are fixed up separately.  Column layout:
    mode * N^2 + y * N + x; input layout [raw A (65) | filtered A (65)].
    """
    n = 1 << log2
    ln = 4 * n + 1
    shift = max(5, log2 + 1)  # common rounding shift across all matmul rows
    ang_scale = 1 << (shift - 5)
    i1, i2, fr, filt = intra_ops._angular_tables(log2, is_luma)
    w = np.zeros((2 * ln, 35 * n * n), np.float32)
    bias = np.zeros((35 * n * n,), np.float32)
    for m in range(33):
        mode = m + 2
        off = ln if filt[m] else 0
        for y in range(n):
            for x in range(n):
                col = mode * n * n + y * n + x
                w[off + i1[m, y, x], col] += (32 - fr[m, y, x]) * ang_scale
                w[off + i2[m, y, x], col] += fr[m, y, x] * ang_scale
                bias[col] = 16 * ang_scale
    # planar (shift log2+1 rescaled to the common shift)
    scale = (1 << shift) >> (log2 + 1)
    off = ln if (is_luma and n >= 8) else 0
    for y in range(n):
        for x in range(n):
            col = 0 * n * n + y * n + x
            w[off + (2 * n - 1 - y), col] += (n - 1 - x) * scale  # left[y]
            w[off + (2 * n + 1 + x), col] += (n - 1 - y) * scale  # top[x]
            w[off + (3 * n + 1), col] += (x + 1) * scale  # top-right p[N][-1]
            w[off + (n - 1), col] += (y + 1) * scale  # bottom-left p[-1][N]
            bias[col] = n * scale
    return w, bias, shift


def predict_all_modes_flat(a, log2: int, is_luma: bool, bd: int = 8):
    """Batched all-modes intra prediction.

    a: (B, 4N+1) int32 substituted boundary walk.
    Returns (B, 35, N^2) int32 — bit-identical to intra.predict_all_modes.
    """
    mx = (1 << bd) - 1
    n = 1 << log2
    af = intra_ops.filter_refs(a) if is_luma else a
    a2 = jnp.concatenate([a, af], axis=-1)
    w, bias, shift = _intra_weights(log2, is_luma)
    main = (exact_matmul_small(a2, jnp.asarray(w)) + jnp.asarray(bias, jnp.int32)) >> shift
    preds = main.reshape(a.shape[0], 35, n * n)

    top = a[:, 2 * n + 1 : 2 * n + 1 + n]
    left = a[:, 2 * n - 1 : n - 1 : -1]
    corner = a[:, 2 * n]

    # DC (8.4.4.2.5)
    dc = (jnp.sum(top, axis=-1) + jnp.sum(left, axis=-1) + n) >> (log2 + 1)
    dcpred = jnp.broadcast_to(dc[:, None], (a.shape[0], n * n))
    if is_luma and n < 32:
        row0 = (top + 3 * dc[:, None] + 2) >> 2
        col0 = (left + 3 * dc[:, None] + 2) >> 2
        corner_px = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        d2 = dcpred.reshape(-1, n, n)
        d2 = d2.at[:, 0, :].set(row0)
        d2 = d2.at[:, :, 0].set(col0)
        d2 = d2.at[:, 0, 0].set(corner_px)
        dcpred = d2.reshape(-1, n * n)
    preds = preds.at[:, 1, :].set(dcpred)

    if is_luma and n < 32:
        # mode 10 (horizontal): clip-filtered first row; mode 26: first col
        row0 = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1), 0, mx)
        col0 = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1), 0, mx)
        p10 = preds[:, 10].reshape(-1, n, n).at[:, 0, :].set(row0)
        p26 = preds[:, 26].reshape(-1, n, n).at[:, :, 0].set(col0)
        preds = preds.at[:, 10].set(p10.reshape(-1, n * n))
        preds = preds.at[:, 26].set(p26.reshape(-1, n * n))
    return preds


def predict_modes_subset_flat(a, log2: int, is_luma: bool, modes: tuple,
                              bd: int = 8):
    """Subset-of-modes intra prediction (encoder-side search trimming).

    Identical per-mode output to predict_all_modes_flat, but the weight
    matrix is column-sliced to `modes` so the matmul (and the downstream
    SATD) scale with len(modes) instead of 35.  Used by the P-frame
    prepass, where the intra arbiter does not need all 35 candidates.
    """
    n = 1 << log2
    af = intra_ops.filter_refs(a) if is_luma else a
    a2 = jnp.concatenate([a, af], axis=-1)
    w, bias, shift = _intra_weights(log2, is_luma)
    cols = np.concatenate([np.arange(m * n * n, (m + 1) * n * n) for m in modes])
    wsub = np.ascontiguousarray(w[:, cols])
    bsub = np.ascontiguousarray(bias[cols])
    main = (exact_matmul_small(a2, jnp.asarray(wsub))
            + jnp.asarray(bsub, jnp.int32)) >> shift
    preds = main.reshape(a.shape[0], len(modes), n * n)

    mx = (1 << bd) - 1
    top = a[:, 2 * n + 1 : 2 * n + 1 + n]
    left = a[:, 2 * n - 1 : n - 1 : -1]
    corner = a[:, 2 * n]
    if 1 in modes:
        k = modes.index(1)
        dc = (jnp.sum(top, axis=-1) + jnp.sum(left, axis=-1) + n) >> (log2 + 1)
        dcpred = jnp.broadcast_to(dc[:, None], (a.shape[0], n * n))
        if is_luma and n < 32:
            row0 = (top + 3 * dc[:, None] + 2) >> 2
            col0 = (left + 3 * dc[:, None] + 2) >> 2
            corner_px = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
            d2 = dcpred.reshape(-1, n, n)
            d2 = d2.at[:, 0, :].set(row0)
            d2 = d2.at[:, :, 0].set(col0)
            d2 = d2.at[:, 0, 0].set(corner_px)
            dcpred = d2.reshape(-1, n * n)
        preds = preds.at[:, k, :].set(dcpred)
    if is_luma and n < 32:
        if 10 in modes:
            k = modes.index(10)
            row0 = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1), 0, mx)
            pk = preds[:, k].reshape(-1, n, n).at[:, 0, :].set(row0)
            preds = preds.at[:, k].set(pk.reshape(-1, n * n))
        if 26 in modes:
            k = modes.index(26)
            col0 = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1), 0, mx)
            pk = preds[:, k].reshape(-1, n, n).at[:, :, 0].set(col0)
            preds = preds.at[:, k].set(pk.reshape(-1, n * n))
    return preds
