"""All-intra frame encoder: the device-side CTU schedules.

Two schedules over the same per-CTU compute kernel (`_encode_ctu`):

* raster  — one `lax.scan` over CTUs in raster order (correctness baseline).
* wavefront — `lax.scan` over anti-diagonals d = 2r + c with all CTUs of a
  wave evaluated in one vmapped batch.  The 2:1 skew is exactly the HEVC WPP
  dependency pattern (left, above, above-right — SURVEY.md §2.7), so a wave
  never reads samples written in the same wave and the output is bit-exact
  vs the raster schedule.

Memory layout: the in-loop reconstruction lives as flat per-CTU blocks
(nctu, N, N) rather than a 2-D picture — neighbor reference reads become
whole-block row gathers and block writes become row scatters, which map to
efficient DMA on TPU (2-D fancy indexing into a picture-sized buffer
measured ~10x slower).  The picture is assembled once at the end.

Everything inside a CTU step is dense integer math batched over the 35
intra modes — mode sweep, SATD costing, transform, quant, dequant, inverse
transform, reconstruction.  This is the TPU inversion of kvazaar's
search_intra + encoder_state CTU loop (Compression/Control groups in
dependencies/kvazaar_CMakeLists.txt:207-218): instead of a recursive RDO
tree walk per CTU on a thread pool, every candidate is evaluated as one
batched tensor op and selected with an argmin.  v1 tool-set: CTB == CU ==
16x16, one 16x16 luma TU + two 8x8 chroma TUs, 35-mode sweep, SATD +
mode-bit cost.

QP is a traced scalar (rate control retunes it without recompiling —
the live-bitrate contract of the reference's ResourceAllocator,
/root/reference/src/media/resourceallocator.cpp:67-104).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

# The wavefront scans are per-step-latency bound on TPU (hundreds of tiny
# sequential waves at 1080p — BENCH_NOTES "wave-count bound").  Unrolling the
# scan body k-fold cuts while-loop iterations (and their fusion-boundary /
# xs-slice overhead) by k, bit-exactly.  Tunable for compile-time headroom.


def _unroll_env(name: str, default: str) -> int:
    raw = os.environ.get(name, default)
    try:
        val = int(raw)
    except ValueError as e:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from e
    if val < 1:
        raise ValueError(f"{name} must be >= 1, got {val}")
    return val


WAVE_UNROLL = _unroll_env("KVZ_TPU_WAVE_UNROLL", "4")
# The quad (CTB32/64) wave bodies are much larger programs — unroll less to
# keep compile time in check (their wave counts are also 2-4x smaller).
QUAD_UNROLL = _unroll_env("KVZ_TPU_QUAD_UNROLL", "2")

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize, quantize_rdoq
from ..ops.satd import satd_blocks
from ..ops.transforms import fwd_transform, inv_transform

PAD = 32  # retained for decoder compatibility imports


def _mode_bits_table(cand_a, n_modes: int = 35):
    """Approximate mode signalling cost in bits for the SATD decision.

    cand_a: traced scalar (left CU mode); cand_b is always DC at a CTB
    boundary (8.4.2: the above CU lies in another CTB row when CU == CTB).
    """
    cand_b = jnp.int32(1)
    mpm = _mpm_list(cand_a, cand_b)
    modes = jnp.arange(n_modes, dtype=jnp.int32)
    is_mpm0 = modes == mpm[0]
    is_mpm12 = (modes == mpm[1]) | (modes == mpm[2])
    return jnp.where(is_mpm0, 2.0, jnp.where(is_mpm12, 3.0, 6.0))


def _mpm_list(cand_a, cand_b):
    """8.4.2 most-probable-mode list as traced int32 (3,)."""

    def equal_case(a):
        small = a < 2
        return jnp.where(
            small,
            jnp.array([0, 1, 26], dtype=jnp.int32),
            jnp.stack([a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]).astype(jnp.int32),
        )

    def diff_case(a, b):
        m2 = jnp.where(
            (a != 0) & (b != 0), 0, jnp.where((a != 1) & (b != 1), 1, 26)
        ).astype(jnp.int32)
        return jnp.stack([a, b, m2]).astype(jnp.int32)

    return jnp.where(cand_a == cand_b, equal_case(cand_a), diff_case(cand_a, cand_b))


def _gather_refs_blocks(blocks, r, c, n: int, cw: int, ch: int, width: int):
    """Boundary walk A[0..4N] + availability from block-layout recon.

    blocks: (nctu, n, n) int32.  Neighbor blocks are fetched as whole rows
    of the flat block array (left, above-left, above, above-right); the
    walk is then assembled with static slicing.  Left-below samples are
    never available under a CTB-raster coding order, so they carry zeros
    and rely on the substitution mask.
    """
    idx = r * cw + c
    clampi = lambda i: jnp.clip(i, 0, cw * ch - 1)
    blk_l = blocks[clampi(idx - 1)]
    blk_al = blocks[clampi(idx - cw - 1)]
    blk_a = blocks[clampi(idx - cw)]
    blk_ar = blocks[clampi(idx - cw + 1)]

    left_top = blk_l[::-1, n - 1]  # A[N..2N-1]: left column, bottom-of-CU upward
    corner = blk_al[n - 1, n - 1]
    top = blk_a[n - 1, :]
    topright = blk_ar[n - 1, :]
    a_raw = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), left_top, corner[None], top, topright]
    )

    j = jnp.arange(2 * n, dtype=jnp.int32)
    avail_left = c > 0
    avail_above = r > 0
    left_ok = avail_left & (j >= n)
    corner_ok = avail_left & avail_above
    top_ok = avail_above & ((c * n + j) < width) & ((j < n) | (c + 1 < cw))
    avail = jnp.concatenate([left_ok, corner_ok[None], top_ok])
    return a_raw, avail


def _code_block(orig, pred, qp, log2: int, intra: bool = True):
    """transform -> quant -> dequant -> inverse -> recon for one block."""
    resid = orig - pred
    coef = fwd_transform(resid, log2)
    lev = quantize(coef, qp, log2, intra)
    deq = dequantize(lev, qp, log2)
    rec_resid = inv_transform(deq, log2)
    recon = jnp.clip(pred + rec_resid, 0, 255)
    return lev, recon


def _encode_ctu(blk_y, blk_u, blk_v, oy, ou, ov, r, c, cand_a, qp, qp_c, lam, geom):
    """Per-CTU compute: mode decision + code blocks.  No buffer writes.

    oy/ou/ov: original blocks for this CTU ((16,16)/(8,8) — pre-gathered).
    Returns (mode, lev_y, lev_cb, lev_cr, rec_y16, rec_cb8, rec_cr8).
    """
    n = 16
    cw, ch, width = geom
    avail_left = c > 0

    a_raw, avail = _gather_refs_blocks(blk_y, r, c, n, cw, ch, width)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = intra_ops.predict_all_modes(a, 4, True)  # (35, 16, 16)

    cost_satd = satd_blocks(preds, oy[None]).astype(jnp.float32)
    bits = _mode_bits_table(jnp.where(avail_left, cand_a, 1))
    # two-stage decision: SATD-rank, then true RD over the top-K (matches
    # the wavefront batch path bit-for-bit)
    K = 3
    _, cand = jax.lax.top_k(-(cost_satd + lam * bits), K)
    lev_k = []
    rec_k = []
    for k in range(K):
        lv, rc = _code_block(oy, preds[cand[k]], qp, 4)
        lev_k.append(lv)
        rec_k.append(rc)
    lev_k = jnp.stack(lev_k)
    rec_k = jnp.stack(rec_k)
    sse = jnp.sum((rec_k - oy[None]) ** 2, axis=(1, 2)).astype(jnp.float32)
    lev_bits = jnp.sum(
        jnp.where(lev_k != 0, 2.0 * jnp.log2(jnp.abs(lev_k).astype(jnp.float32) + 1.0) + 1.0, 0.0),
        axis=(1, 2),
    )
    rd = sse + (lam * lam) * (lev_bits + bits[cand])
    best_k = jnp.argmin(rd)
    mode = cand[best_k].astype(jnp.int32)
    lev_y = lev_k[best_k]
    rec_y = rec_k[best_k]

    # chroma: derived mode (DM), 8x8
    chroma = []
    for blk_c, oc in ((blk_u, ou), (blk_v, ov)):
        a_raw_c, avail_c = _gather_refs_blocks(blk_c, r, c, n // 2, cw, ch, width // 2)
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        pred_c = intra_ops.predict_mode(ac, 3, False, mode)
        chroma.append(_code_block(oc, pred_c, qp_c, 3))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = chroma
    return mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr


def _encode_ctu_wave(blk_y, blk_u, blk_v, oyw, ouw, ovw, rs, cs, cand_a, qp, qp_c, lam, geom, rdoq=True):
    """Batched per-wave CTU compute on flattened blocks (MXU kernels).

    oyw: (L, 16, 16); rs/cs/cand_a: (L,).  Bit-identical to vmapped
    _encode_ctu (ops/ctu_kernels.py asserts kernel equivalence).
    """
    from ..ops import ctu_kernels as ck

    n = 16
    cw, ch, width = geom
    lanes = rs.shape[0]

    a_raw, avail = jax.vmap(
        _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
    )(blk_y, rs, cs, n, cw, ch, width)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = ck.predict_all_modes_flat(a, 4, True)  # (L, 35, 256)

    oy_flat = oyw.reshape(lanes, n * n)
    cost_satd = ck.satd_flat(preds, oy_flat[:, None, :], 4).astype(jnp.float32)
    bits = jax.vmap(_mode_bits_table)(jnp.where(cs > 0, cand_a, 1))
    lam2 = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (lanes,))[:, None]

    def code_flat(orig, pred, q, log2):
        resid = orig - pred
        coef = ck.fwd_transform_flat(resid, log2)
        if rdoq:
            lev = quantize_rdoq(coef, q, log2, (lam2 * lam2)[:, 0], True)
        else:
            lev = quantize(coef, q, log2, True)
        deq = dequantize(lev, q, log2)
        rec = jnp.clip(pred + ck.inv_transform_flat(deq, log2), 0, 255)
        return lev, rec

    # two-stage decision (kvazaar search_intra shape): SATD-rank all 35,
    # then true RD (SSE + lambda^2 * rate estimate) over the top-K
    K = 3
    _, cand = jax.lax.top_k(-(cost_satd + lam2 * bits), K)  # (L, K)
    cand_preds = jnp.take_along_axis(preds, cand[:, :, None], axis=1)  # (L,K,256)
    lev_k, rec_k = code_flat(oy_flat[:, None, :], cand_preds, qp, 4)
    sse = jnp.sum((rec_k - oy_flat[:, None, :]) ** 2, axis=-1).astype(jnp.float32)
    lev_bits = jnp.sum(
        jnp.where(lev_k != 0, 2.0 * jnp.log2(jnp.abs(lev_k).astype(jnp.float32) + 1.0) + 1.0, 0.0),
        axis=-1,
    )
    mode_bits = jnp.take_along_axis(bits, cand, axis=1)
    rd = sse + (lam2 * lam2) * (lev_bits + mode_bits)
    best_k = jnp.argmin(rd, axis=1)
    mode = jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32)
    lev_y = jnp.take_along_axis(lev_k, best_k[:, None, None], 1)[:, 0]
    rec_y = jnp.take_along_axis(rec_k, best_k[:, None, None], 1)[:, 0]

    chroma = []
    for blk_c, ocw in ((blk_u, ouw), (blk_v, ovw)):
        a_raw_c, avail_c = jax.vmap(
            _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
        )(blk_c, rs, cs, n // 2, cw, ch, width // 2)
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        preds_c = ck.predict_all_modes_flat(ac, 3, False)  # (L, 35, 64)
        pred_c = jnp.take_along_axis(preds_c, mode[:, None, None], axis=1)[:, 0]
        chroma.append(code_flat(ocw.reshape(lanes, -1), pred_c, qp_c, 3))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = chroma

    sq = lambda x, s: x.reshape(lanes, s, s)
    return (
        mode,
        sq(lev_y, n),
        sq(lev_cb, n // 2),
        sq(lev_cr, n // 2),
        sq(rec_y, n),
        sq(rec_cb, n // 2),
        sq(rec_cr, n // 2),
    )


def to_blocks(img, n: int):
    """(H, W) -> (nctu, n, n) raster block order."""
    h, w = img.shape
    return (
        img.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3).reshape(-1, n, n)
    )


def from_blocks(blocks, height: int, width: int):
    n = blocks.shape[-1]
    return (
        blocks.reshape(height // n, width // n, n, n)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )


def _frame_setup(y, u, v, qp, nctu=None):
    """qp: scalar or (nctu,) per-CTU map (ROI / spatial rate control)."""
    from ..core.tables import CHROMA_QP_TABLE

    qp = jnp.asarray(qp, jnp.int32)
    if nctu is not None:
        qp = jnp.broadcast_to(qp, (nctu,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
    lam = jnp.sqrt(0.57 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0))
    oy = to_blocks(y.astype(jnp.int32), 16)
    ou = to_blocks(u.astype(jnp.int32), 8)
    ov = to_blocks(v.astype(jnp.int32), 8)
    return qp, qp_c, lam, oy, ou, ov


def _finish(modes, lev_y, lev_cb, lev_cr, blk_y, blk_u, blk_v, width, height):
    # int16 levels (spec-clipped range): halves device->host traffic, which
    # is the e2e bottleneck over a thin host link
    return {
        "mode": modes,
        "lev_y": lev_y.astype(jnp.int16),
        "lev_cb": lev_cb.astype(jnp.int16),
        "lev_cr": lev_cr.astype(jnp.int16),
        "recon_y": from_blocks(blk_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk_u, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk_v, height // 2, width // 2).astype(jnp.uint8),
    }


@functools.partial(jax.jit, static_argnames=("width", "height"))
def encode_frame_intra_raster(y, u, v, qp, *, width: int, height: int):
    """Raster-order reference schedule.  y: (H, W) uint8; u, v: (H/2, W/2)."""
    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)
    geom = (cw, ch, width)

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)

    def step(carry, i):
        blk_y, blk_u, blk_v, prev_mode = carry
        r, c = i // cw, i % cw
        mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr = _encode_ctu(
            blk_y, blk_u, blk_v, oy[i], ou[i], ov[i], r, c, prev_mode,
            qp[i], qp_c[i], lam[i], geom
        )
        blk_y = blk_y.at[i].set(rec_y)
        blk_u = blk_u.at[i].set(rec_cb)
        blk_v = blk_v.at[i].set(rec_cr)
        out = {"mode": mode, "lev_y": lev_y, "lev_cb": lev_cb, "lev_cr": lev_cr}
        return (blk_y, blk_u, blk_v, mode), out

    (blk_y, blk_u, blk_v, _), outs = jax.lax.scan(
        step, (blk_y0, blk_c0, jnp.zeros_like(blk_c0), jnp.int32(1)), jnp.arange(nctu, dtype=jnp.int32)
    )
    return _finish(
        outs["mode"], outs["lev_y"], outs["lev_cb"], outs["lev_cr"], blk_y, blk_u, blk_v, width, height
    )


def wave_inputs(sched, nctu, arrays):
    """Pre-gather per-CTU arrays into (n_waves, lanes, ...) wave order with
    static indices (outside the scan)."""
    idx = np.minimum(sched["idx"], nctu - 1)
    return [a[idx.reshape(-1)].reshape(idx.shape + a.shape[1:]) for a in arrays]


def wave_to_raster(sched, out):
    """(n_waves, lanes, ...) scan-stacked output -> (nctu, ...) raster."""
    nw, ln = out.shape[0], out.shape[1]
    return out.reshape((nw * ln,) + out.shape[2:])[sched["perm"]]


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq"))
def encode_frame_intra(y, u, v, qp, *, width: int, height: int, rdoq: bool = False):
    """Wavefront schedule: scan over anti-diagonals d = 2r + c, all CTUs of
    a wave computed as one vmapped batch.  Bit-exact vs the raster schedule
    (the 2:1 skew respects every intra reference dependency).

    Schedule geometry is static (encoder/wavefront.py): per-wave inputs are
    pre-gathered, outputs ride the scan's stacking, and only recon blocks +
    the mode map (MPM dependency) live in the carry."""
    from .wavefront import schedule

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule(cw, ch)
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)
    geom = (cw, ch, width)

    oy_w, ou_w, ov_w, qp_w, qpc_w, lam_w = wave_inputs(
        sched, nctu, [oy, ou, ov, qp, qp_c, lam]
    )
    xs = (
        oy_w,
        ou_w,
        ov_w,
        qp_w,
        qpc_w,
        lam_w,
        jnp.asarray(sched["rs"]),
        jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]),
        jnp.asarray(sched["idx"]),
    )

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)
    modes0 = jnp.zeros((nctu,), jnp.int32)

    def wave(carry, x):
        blk_y, blk_u, blk_v, modes = carry
        oyw, ouw, ovw, qpw, qpcw, lamw, rs, cs, valid, idx = x
        cand_a = modes[jnp.maximum(idx - 1, 0)]

        mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr = _encode_ctu_wave(
            blk_y, blk_u, blk_v, oyw, ouw, ovw, rs, cs, cand_a, qpw, qpcw, lamw, geom,
            rdoq=rdoq,
        )

        out_idx = jnp.where(valid, idx, nctu)
        blk_y = blk_y.at[out_idx].set(rec_y, mode="drop")
        blk_u = blk_u.at[out_idx].set(rec_cb, mode="drop")
        blk_v = blk_v.at[out_idx].set(rec_cr, mode="drop")
        modes = modes.at[out_idx].set(mode, mode="drop")
        return (blk_y, blk_u, blk_v, modes), (mode, lev_y, lev_cb, lev_cr)

    carry0 = (blk_y0, blk_c0, jnp.zeros_like(blk_c0), modes0)
    (blk_y, blk_u, blk_v, modes), (mode_w, lev_y_w, lev_cb_w, lev_cr_w) = jax.lax.scan(
        wave, carry0, xs
    )
    return _finish(
        wave_to_raster(sched, mode_w),
        wave_to_raster(sched, lev_y_w),
        wave_to_raster(sched, lev_cb_w),
        wave_to_raster(sched, lev_cr_w),
        blk_y,
        blk_u,
        blk_v,
        width,
        height,
    )


# ---------------------------------------------------------------------------
# Fast path: dense mode decision + ring-carry reconstruction scan.
#
# The RD mode search does not have to run inside the sequential wavefront:
# deciding every CTU's intra mode from ORIGINAL-pixel neighbor boundaries is
# the standard parallel-encoder approximation (recon boundaries differ from
# original only by coding error), and it turns the whole 35-mode sweep +
# SATD + top-K RD refine into ONE dense batch over all CTUs.  The scan that
# remains carries only the previous three waves' boundary samples (bottom
# rows + right columns, a few KB) and does predict-selected-mode + TQR —
# profiled ~3x faster than the in-scan-decision schedule at 1080p.
# Decisions differ slightly from the RD path (streams remain conformant and
# decode bit-exactly; quality delta measured in BENCH_NOTES).


def _avail_flags(cw: int, ch: int):
    """Dense (ch, cw) availability flags for CTB-grid neighbors."""
    r = np.arange(ch, dtype=np.int32)[:, None]
    c = np.arange(cw, dtype=np.int32)[None, :]
    l = np.broadcast_to(c > 0, (ch, cw))
    a = np.broadcast_to(r > 0, (ch, cw))
    tr = a & (c + 1 < cw)
    return l, a, tr


def _orig_boundaries(plane, n: int, cw: int, ch: int):
    """Per-CTU boundary walk A[0..4n] gathered from the ORIGINAL plane.

    Returns (nctu, 4n+1) int32 raw walks (garbage where unavailable — pair
    with substitute_refs_ctb and the static availability flags).
    """
    p = plane.astype(jnp.int32)
    rsel = np.clip(n * np.arange(ch) - 1, 0, None)
    csel = np.clip(n * np.arange(cw) - 1, 0, None)
    toprows = p[rsel]                                   # (ch, W): row n*r-1
    top = toprows.reshape(ch, cw, n)
    tr_pad = jnp.pad(toprows, ((0, 0), (0, n)), mode="edge")
    topright = tr_pad[:, n:].reshape(ch, cw, n)
    leftcols = p[:, csel]                               # (H, cw): col n*c-1
    left = leftcols.reshape(ch, n, cw).transpose(0, 2, 1)  # top-down
    corner = toprows[:, csel]                           # (ch, cw)
    zeros = jnp.zeros_like(left)
    a_raw = jnp.concatenate(
        [zeros, left[..., ::-1], corner[..., None], top, topright], axis=-1
    )
    return a_raw.reshape(ch * cw, 4 * n + 1)


def intra_mode_prepass(y, oy, qp, qp_c, lam, *, width: int, height: int,
                       n: int = 16):
    """Dense per-CTU intra mode decision from original-pixel boundaries.

    Two-stage, the same shape as the in-scan decision (_encode_ctu_wave):
    35-mode SATD sweep + MPM-bit cost (left mode approximated by the left
    CTU's SATD-best mode), then true RD (SSE + lambda^2 * rate) over the
    top-K.  Returns (nctu,) int32 modes.
    """
    from ..ops import ctu_kernels as ck

    cw, ch = width // n, height // n
    nctu = cw * ch
    fl, fa, ftr = _avail_flags(cw, ch)
    a_raw = _orig_boundaries(y, n, cw, ch)
    a = intra_ops.substitute_refs_ctb(
        a_raw, jnp.asarray(fl.reshape(-1)), jnp.asarray(fa.reshape(-1)),
        jnp.asarray(ftr.reshape(-1)), n)
    preds = ck.predict_all_modes_flat(a, 4, True)       # (nctu, 35, 256)
    oy_flat = oy.reshape(nctu, n * n)
    satd = ck.satd_flat(preds, oy_flat[:, None, :], 4).astype(jnp.float32)
    mode0 = jnp.argmin(satd, axis=1).astype(jnp.int32)
    left0 = jnp.roll(mode0.reshape(ch, cw), 1, axis=1).reshape(-1)
    cand_a = jnp.where(jnp.asarray(fl.reshape(-1)), left0, 1)
    bits = jax.vmap(_mode_bits_table)(cand_a)
    lam2 = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (nctu,))[:, None]
    cost = satd + lam2 * bits
    K = 3
    _, cand = jax.lax.top_k(-cost, K)
    cand_preds = jnp.take_along_axis(preds, cand[:, :, None], axis=1)
    coef = ck.fwd_transform_flat(oy_flat[:, None, :] - cand_preds, 4)
    qpb = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nctu,))
    lev = quantize(coef, qpb, 4, True)
    deq = dequantize(lev, qpb, 4)
    rec = jnp.clip(cand_preds + ck.inv_transform_flat(deq, 4), 0, 255)
    sse = jnp.sum((rec - oy_flat[:, None, :]) ** 2, axis=-1).astype(jnp.float32)
    lev_bits = jnp.sum(
        jnp.where(lev != 0,
                  2.0 * jnp.log2(jnp.abs(lev).astype(jnp.float32) + 1.0) + 1.0,
                  0.0),
        axis=-1)
    rd = sse + (lam2 * lam2) * (lev_bits + jnp.take_along_axis(bits, cand, axis=1))
    best_k = jnp.argmin(rd, axis=1)
    mode = jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32)
    return mode


# P-prepass candidate modes: planar, DC, and every 4th angle.  The P
# arbiter only needs a good intra estimate + a reasonable mode when intra
# wins; the 3.2x-smaller matmul/SATD cuts the prepass from ~13 to ~5 ms
# at 1080p (the mode is still coded normatively, streams stay conformant).
P_PREPASS_MODES = (0, 1, 2, 6, 10, 14, 18, 22, 26, 30, 34)


def intra_cost_prepass(y, oy, qp, qp_c, lam, *, width: int, height: int,
                       n: int = 16, modes: tuple | None = None):
    """Like intra_mode_prepass but also returns the SATD+bits cost of the
    chosen mode (the P-path intra-vs-inter comparison term, matching
    _encode_ctu_p's cost_intra up to the orig-boundary approximation).

    modes: optional search subset (mode numbers); returned modes are
    always true HEVC mode numbers."""
    from ..ops import ctu_kernels as ck

    cw, ch = width // n, height // n
    nctu = cw * ch
    fl, fa, ftr = _avail_flags(cw, ch)
    a_raw = _orig_boundaries(y, n, cw, ch)
    a = intra_ops.substitute_refs_ctb(
        a_raw, jnp.asarray(fl.reshape(-1)), jnp.asarray(fa.reshape(-1)),
        jnp.asarray(ftr.reshape(-1)), n)
    if modes is None:
        preds = ck.predict_all_modes_flat(a, 4, True)
        mode_map = None
    else:
        preds = ck.predict_modes_subset_flat(a, 4, True, tuple(modes))
        mode_map = jnp.asarray(np.asarray(modes, np.int32))
    oy_flat = oy.reshape(nctu, n * n)
    satd = ck.satd_flat(preds, oy_flat[:, None, :], 4).astype(jnp.float32)
    sel0 = jnp.argmin(satd, axis=1).astype(jnp.int32)
    mode0 = sel0 if mode_map is None else mode_map[sel0]
    left0 = jnp.roll(mode0.reshape(ch, cw), 1, axis=1).reshape(-1)
    cand_a = jnp.where(jnp.asarray(fl.reshape(-1)), left0, 1)
    if mode_map is None:
        bits = jax.vmap(_mode_bits_table)(cand_a)
    else:
        bits_all = jax.vmap(_mode_bits_table)(cand_a)  # (nctu, 35)
        bits = bits_all[:, jnp.asarray(np.asarray(modes, np.int32))]
    lam2 = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (nctu,))
    cost = satd + lam2[:, None] * bits
    sel = jnp.argmin(cost, axis=1).astype(jnp.int32)
    mode = sel if mode_map is None else mode_map[sel]
    best = jnp.take_along_axis(cost, sel[:, None], 1)[:, 0] + lam2 * 3.0
    return mode, best


def _ring_boundary(ring_bot, ring_rcol, n: int):
    """Assemble per-lane raw boundary walks from a 3-wave ring.

    ring_bot/ring_rcol: (3, L, n) — slot 0 = previous wave (d-1), slot 1 =
    d-2, slot 2 = d-3.  Lane k holds CTU row k (schedule_r), so `left` is
    slot 0 unshifted and all `above*` entries are slot 1/0/2 shifted down
    one lane.
    """
    shift = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    left_rev = ring_rcol[0][:, ::-1]
    top = shift(ring_bot[1])
    topright = shift(ring_bot[0])
    corner = shift(ring_bot[2])[:, n - 1 : n]
    lb = jnp.zeros_like(left_rev)
    return jnp.concatenate([lb, left_rev, corner, top, topright], axis=-1)


def _ring_push(ring, bot, rcol):
    rb, rr = ring
    return (jnp.concatenate([bot[None], rb[:2]], axis=0),
            jnp.concatenate([rcol[None], rr[:2]], axis=0))


def _code_flat_sel(ck, orig, pred, q, log2, lam2, rdoq, bd: int = 8):
    coef = ck.fwd_transform_flat(orig - pred, log2, bd=bd)
    if rdoq:
        lev = quantize_rdoq(coef, q, log2, lam2, True, bd=bd)
    else:
        lev = quantize(coef, q, log2, True, bd=bd)
    deq = dequantize(lev, q, log2, bd=bd)
    rec = jnp.clip(pred + ck.inv_transform_flat(deq, log2, bd=bd), 0,
                   (1 << bd) - 1)
    return lev, rec


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq"))
def encode_frame_intra_fast(y, u, v, qp, *, width: int, height: int,
                            rdoq: bool = False):
    """Dense-decision intra encode: prepass decides every CTU's mode, the
    ring-carry wavefront only reconstructs (predict selected mode + TQR).
    Output format matches encode_frame_intra."""
    from ..ops import ctu_kernels as ck
    from .wavefront import schedule_r

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)

    modes = intra_mode_prepass(y, oy, qp, qp_c, lam, width=width, height=height)

    oy_w, ou_w, ov_w, mode_w, qp_w, qpc_w, lam_w = wave_inputs(
        sched, nctu, [oy, ou, ov, modes, qp, qp_c, lam])
    l_w = jnp.asarray(sched["cs"] > 0)
    a_w = jnp.asarray(sched["rs"] > 0)
    tr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    xs = (oy_w, ou_w, ov_w, mode_w, qp_w, qpc_w, lam_w, l_w, a_w, tr_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))

    def wave(carry, x):
        ry, ru, rv = carry
        oyw, ouw, ovw, modew, qpw, qpcw, lamw, fl, fa, ftr = x
        lam2 = (lamw * lamw).astype(jnp.float32)

        a_y = intra_ops.substitute_refs_ctb(
            _ring_boundary(*ry, n), fl, fa, ftr, n)
        preds = ck.predict_all_modes_flat(a_y, 4, True)
        pred = jnp.take_along_axis(preds, modew[:, None, None], axis=1)[:, 0]
        lev_y, rec_y = _code_flat_sel(
            ck, oyw.reshape(lanes, -1), pred, qpw, 4, lam2, rdoq)

        outs_c = []
        recs_c = []
        for ring_c, ocw in ((ru, ouw), (rv, ovw)):
            a_c = intra_ops.substitute_refs_ctb(
                _ring_boundary(*ring_c, n // 2), fl, fa, ftr, n // 2)
            preds_c = ck.predict_all_modes_flat(a_c, 3, False)
            pred_c = jnp.take_along_axis(preds_c, modew[:, None, None], axis=1)[:, 0]
            lev_c, rec_c = _code_flat_sel(
                ck, ocw.reshape(lanes, -1), pred_c, qpcw, 3, lam2, rdoq)
            outs_c.append(lev_c)
            recs_c.append(rec_c)

        m = n // 2
        ry = _ring_push(ry, rec_y.reshape(lanes, n, n)[:, n - 1, :],
                        rec_y.reshape(lanes, n, n)[:, :, n - 1])
        ru = _ring_push(ru, recs_c[0].reshape(lanes, m, m)[:, m - 1, :],
                        recs_c[0].reshape(lanes, m, m)[:, :, m - 1])
        rv = _ring_push(rv, recs_c[1].reshape(lanes, m, m)[:, m - 1, :],
                        recs_c[1].reshape(lanes, m, m)[:, :, m - 1])
        out = (lev_y.astype(jnp.int16), outs_c[0].astype(jnp.int16),
               outs_c[1].astype(jnp.int16), rec_y.astype(jnp.uint8),
               recs_c[0].astype(jnp.uint8), recs_c[1].astype(jnp.uint8))
        return (ry, ru, rv), out

    carry0 = (ring0(n), ring0(n // 2), ring0(n // 2))
    _, (lev_y_w, lev_cb_w, lev_cr_w, rec_y_w, rec_cb_w, rec_cr_w) = jax.lax.scan(
        wave, carry0, xs, unroll=WAVE_UNROLL)

    w2r = lambda o: wave_to_raster(sched, o)
    m = n // 2
    blk = lambda o, s: w2r(o).reshape(nctu, s, s).astype(jnp.int32)
    return {
        "mode": modes,
        "lev_y": blk(lev_y_w, n).astype(jnp.int16),
        "lev_cb": blk(lev_cb_w, m).astype(jnp.int16),
        "lev_cr": blk(lev_cr_w, m).astype(jnp.int16),
        "recon_y": from_blocks(blk(rec_y_w, n), height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk(rec_cb_w, m), height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk(rec_cr_w, m), height // 2, width // 2).astype(jnp.uint8),
    }


@functools.partial(jax.jit, static_argnames=("width", "height"))
def encode_frames_intra_batch(ys, us, vs, qps, *, width: int, height: int):
    """Batched wavefront encode over frames in flight (the OWF axis:
    kvazaarfilter.cpp:193,299 sizes an owf+1 input ring; here the batch
    rides the device's vector lanes instead of a thread pool).

    ys: (B, H, W) uint8; qps: (B,) int32.  Returns the per-frame outputs of
    encode_frame_intra with a leading B axis.
    """

    def one(y, u, v, qp):
        return encode_frame_intra(y, u, v, qp, width=width, height=height)

    return jax.vmap(one)(ys, us, vs, qps)
