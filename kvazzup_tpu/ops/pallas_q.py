"""Pallas TPU kernels for the quant/SATD hot ops (VERDICT r3 ask #7).

The XLA formulations of quantize/dequantize/SATD sit at 0.2-0.5% of HBM
speed-of-light (tools/sol_audit.py): each is a chain of cheap int32 VPU
ops (or one f32 matmul) whose intermediates round-trip HBM at fusion
boundaries.  One Pallas kernel per op fuses the whole chain over a
(TILE, K) block in VMEM — a single HBM read + write per operand, which
is the binding ceiling for these ops.

Bit-exactness: all arithmetic is the same int32 multiply/shift/select
sequence as ops/quant.py (and the same exact-int-in-f32 matmul as
ctu_kernels.satd_flat), asserted element-identical by
tests/test_pallas_q.py in interpret mode and by the engine pins on TPU.

Kernels activate only on the TPU backend (jax.default_backend() at trace
time); every caller keeps the jnp path as reference and fallback.
KVZ_TPU_NO_PALLAS=1 is the kill switch.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core.tables import DEQUANT_SCALES, QUANT_SCALES

_TILE = 256  # batch rows per grid step


def _interpret() -> bool:
    return bool(os.environ.get("KVZ_TPU_PALLAS_INTERPRET"))


def pallas_enabled() -> bool:
    if _interpret():
        return True
    if os.environ.get("KVZ_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _sel6(table, rem):
    out = jnp.full(rem.shape, int(table[0]), jnp.int32)
    for k in range(1, 6):
        out = jnp.where(rem == k, jnp.int32(int(table[k])), out)
    return out


def _quant_kernel(coef_ref, qp_ref, dz_ref, out_ref, *, log2: int):
    coef = coef_ref[:]
    qp = qp_ref[:]          # (TILE, 1) int32, broadcasts over K
    dz = dz_ref[:]          # (TILE, 1) int32 deadzone numerator (171/85)
    per = qp // 6
    rem = qp % 6
    qbits = 21 + per - log2
    offset = jnp.left_shift(dz, qbits - 9)
    scale = _sel6(QUANT_SCALES, rem)
    mag = jnp.right_shift(jnp.abs(coef) * scale + offset, qbits)
    mag = jnp.clip(mag, 0, 32767)
    out_ref[:] = jnp.where(coef < 0, -mag, mag)


def _dequant_kernel(lev_ref, qp_ref, out_ref, *, log2: int, bd: int):
    lev = lev_ref[:]
    qp = qp_ref[:]
    per = qp // 6
    rem = qp % 6
    bd_shift = bd + log2 - 5
    scale = _sel6(DEQUANT_SCALES, rem) * 16
    sh = bd_shift - per
    rsh = jnp.maximum(sh, 1)
    d_right = jnp.right_shift(lev * scale + jnp.left_shift(1, rsh - 1), rsh)
    d_left = jnp.left_shift(lev * scale, jnp.maximum(-sh, 0))
    d = jnp.where(sh > 0, d_right, d_left)
    out_ref[:] = jnp.clip(d, -32768, 32767)


def _satd_kernel(a_ref, b_ref, w_ref, s_ref, out_ref, *, shift: int):
    """diff -> (TILE, K) @ (K, K) Hadamard kron -> |.| -> per-subblock
    sums via a (K, nsb) 0/1 selector MATMUL (Mosaic rejects the reshape
    form) -> rounding shift -> row sum.  Exact in f32: |t| <= 255*64 and
    each subblock sum <= 16320*64 < 2^24."""
    diff = (a_ref[:] - b_ref[:]).astype(jnp.float32)
    t = jnp.dot(diff, w_ref[:], preferred_element_type=jnp.float32)
    per = jnp.dot(jnp.abs(t), s_ref[:],
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    half = 1 << (shift - 1)
    out_ref[:] = jnp.right_shift(per + half, shift).sum(
        axis=-1, keepdims=True)


def _pad_rows(x, tile):
    b = x.shape[0]
    pb = -(-b // tile) * tile
    if pb == b:
        return x, b
    return jnp.pad(x, ((0, pb - b),) + ((0, 0),) * (x.ndim - 1)), b


def _row_arg(v, b, like_hi=None):
    """Broadcast scalar/(B,) -> (B, 1) int32 column."""
    v = jnp.asarray(v, jnp.int32)
    if v.ndim == 0:
        v = jnp.broadcast_to(v, (b,))
    return v.reshape(b, 1)


@functools.partial(jax.jit, static_argnames=("log2",))
def quantize_2d(coef, qp_col, dz_col, log2: int):
    """coef: (B, K) int32; qp_col/dz_col: (B, 1) int32 -> levels (B, K)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = coef.shape
    coef_p, b0 = _pad_rows(coef, _TILE)
    qp_p, _ = _pad_rows(qp_col, _TILE)
    dz_p, _ = _pad_rows(dz_col, _TILE)
    grid = coef_p.shape[0] // _TILE
    out = pl.pallas_call(
        functools.partial(_quant_kernel, log2=log2),
        out_shape=jax.ShapeDtypeStruct(coef_p.shape, jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(coef_p, qp_p, dz_p)
    return out[:b0]


@functools.partial(jax.jit, static_argnames=("log2", "bd"))
def dequantize_2d(lev, qp_col, log2: int, bd: int = 8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = lev.shape
    lev_p, b0 = _pad_rows(lev, _TILE)
    qp_p, _ = _pad_rows(qp_col, _TILE)
    grid = lev_p.shape[0] // _TILE
    out = pl.pallas_call(
        functools.partial(_dequant_kernel, log2=log2, bd=bd),
        out_shape=jax.ShapeDtypeStruct(lev_p.shape, jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(lev_p, qp_p)
    return out[:b0]


@functools.partial(jax.jit, static_argnames=("log2",))
def satd_2d(a, b, w, log2: int):
    """SATD over (B, N^2) flat block pairs; w = ctu_kernels._satd_weights.
    Returns (B,) int32, bit-identical to ctu_kernels.satd_flat."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, k = a.shape
    n = 1 << log2
    sb = min(8, n)
    nsb = (n // sb) ** 2
    shift = 2 if sb == 8 else 1
    # (K, nsb) subblock selector: column j sums Hadamard-output slots of
    # subblock j (the _satd_weights output is subblock-major)
    sel = np.zeros((k, nsb), np.float32)
    for j in range(nsb):
        sel[j * sb * sb:(j + 1) * sb * sb, j] = 1.0
    a_p, b0 = _pad_rows(a.astype(jnp.int32), _TILE)
    b_p, _ = _pad_rows(b.astype(jnp.int32), _TILE)
    grid = a_p.shape[0] // _TILE
    out = pl.pallas_call(
        functools.partial(_satd_kernel, shift=shift),
        out_shape=jax.ShapeDtypeStruct((a_p.shape[0], 1), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nsb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a_p, b_p, w, jnp.asarray(sel))
    return out[:b0, 0]
