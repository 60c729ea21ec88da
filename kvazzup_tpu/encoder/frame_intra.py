"""All-intra frame encoder: the device-side CTU schedules.

Two schedules over the same per-CTU compute kernel (`_encode_ctu`):

* raster  — one `lax.scan` over CTUs in raster order (correctness baseline).
* wavefront — `lax.scan` over anti-diagonals d = 2r + c with all CTUs of a
  wave evaluated in one vmapped batch.  The 2:1 skew is exactly the HEVC WPP
  dependency pattern (left, above, above-right — SURVEY.md §2.7), so a wave
  never reads samples written in the same wave and the output is bit-exact
  vs the raster schedule.

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

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from ..ops.satd import satd_blocks
from ..ops.transforms import fwd_transform, inv_transform

PAD = 32  # recon border padding: any reference read stays in bounds


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


def _gather_refs(recon_pad, x0, y0, n: int, width: int, avail_above, avail_left):
    """Boundary walk A[0..4N] + availability mask from the padded recon."""
    idx = jnp.arange(2 * n, dtype=jnp.int32)
    # left column bottom -> top: A[i] = recon[y0 + 2N-1-i, x0-1]
    rows_l = PAD + y0 + (2 * n - 1 - idx)
    cols_l = jnp.full((2 * n,), PAD + x0 - 1, dtype=jnp.int32)
    # top row: A[2N+1+j] = recon[y0-1, x0+j]
    rows_t = jnp.full((2 * n,), PAD + y0 - 1, dtype=jnp.int32)
    cols_t = PAD + x0 + idx
    rows = jnp.concatenate([rows_l, (PAD + y0 - 1)[None], rows_t])
    cols = jnp.concatenate([cols_l, (PAD + x0 - 1)[None], cols_t])
    a_raw = recon_pad[rows, cols]

    # availability: left col only above the CU-row boundary (left-below CTUs
    # are not yet coded in raster order); top-right clipped at the frame edge
    left_ok = avail_left & (idx >= n)
    corner_ok = avail_left & avail_above
    top_ok = avail_above & ((x0 + idx) < width)
    avail = jnp.concatenate([left_ok, corner_ok[None], top_ok])
    return a_raw.astype(jnp.int32), avail


def _code_block(orig, pred, qp, log2: int, intra: bool = True):
    """transform -> quant -> dequant -> inverse -> recon for one block."""
    resid = orig - pred
    coef = fwd_transform(resid, log2)
    lev = quantize(coef, qp, log2, intra)
    deq = dequantize(lev, qp, log2)
    rec_resid = inv_transform(deq, log2)
    recon = jnp.clip(pred + rec_resid, 0, 255)
    return lev, recon


def _encode_ctu(recon_y, recon_u, recon_v, y32, u32, v32, r, c, cand_a, qp, qp_c, lam, width):
    """Per-CTU compute: mode decision + code blocks.  No buffer writes.

    Returns (mode, lev_y, lev_cb, lev_cr, rec_y16, rec_cb8, rec_cr8).
    """
    n = 16
    x0 = c * n
    y0 = r * n
    avail_above = r > 0
    avail_left = c > 0

    orig = jax.lax.dynamic_slice(y32, (y0, x0), (n, n))
    a_raw, avail = _gather_refs(recon_y, x0, y0, n, width, avail_above, avail_left)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = intra_ops.predict_all_modes(a, 4, True)  # (35, 16, 16)

    cost_satd = satd_blocks(preds, orig[None]).astype(jnp.float32)
    bits = _mode_bits_table(jnp.where(avail_left, cand_a, 1))
    mode = jnp.argmin(cost_satd + lam * bits).astype(jnp.int32)
    pred = preds[mode]
    lev_y, rec_y = _code_block(orig, pred, qp, 4)

    # chroma: derived mode (DM), 8x8
    xc, yc = x0 // 2, y0 // 2
    chroma = []
    for rec_buf, orig_p, q in ((recon_u, u32, qp_c), (recon_v, v32, qp_c)):
        a_raw_c, avail_c = _gather_refs(
            rec_buf, xc, yc, n // 2, width // 2, avail_above, avail_left
        )
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        pred_c = intra_ops.predict_mode(ac, 3, False, mode)
        orig_c = jax.lax.dynamic_slice(orig_p, (yc, xc), (n // 2, n // 2))
        chroma.append(_code_block(orig_c, pred_c, q, 3))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = chroma
    return mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr


def _frame_setup(y, u, v, qp, width, height):
    from ..core.tables import CHROMA_QP_TABLE

    qp = jnp.asarray(qp, jnp.int32)
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
    lam = jnp.sqrt(0.57 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0))
    recon_y0 = jnp.zeros((height + 2 * PAD, width + 2 * PAD), jnp.int32)
    recon_u0 = jnp.zeros((height // 2 + 2 * PAD, width // 2 + 2 * PAD), jnp.int32)
    recon_v0 = jnp.zeros_like(recon_u0)
    return (
        qp,
        qp_c,
        lam,
        recon_y0,
        recon_u0,
        recon_v0,
        y.astype(jnp.int32),
        u.astype(jnp.int32),
        v.astype(jnp.int32),
    )


def _crop_out(outs, recon_y, recon_u, recon_v, width, height):
    crop = lambda rbuf, h, w: rbuf[PAD : PAD + h, PAD : PAD + w].astype(jnp.uint8)
    outs["recon_y"] = crop(recon_y, height, width)
    outs["recon_u"] = crop(recon_u, height // 2, width // 2)
    outs["recon_v"] = crop(recon_v, height // 2, width // 2)
    return outs


@functools.partial(jax.jit, static_argnames=("width", "height"))
def encode_frame_intra_raster(y, u, v, qp, *, width: int, height: int):
    """Raster-order reference schedule.  y: (H, W) uint8; u, v: (H/2, W/2)."""
    n = 16
    ctbs_w = width // n
    nctu = ctbs_w * (height // n)
    qp, qp_c, lam, recon_y0, recon_u0, recon_v0, y32, u32, v32 = _frame_setup(
        y, u, v, qp, width, height
    )

    def step(carry, i):
        recon_y, recon_u, recon_v, prev_mode = carry
        r, c = i // ctbs_w, i % ctbs_w
        mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr = _encode_ctu(
            recon_y, recon_u, recon_v, y32, u32, v32, r, c, prev_mode, qp, qp_c, lam, width
        )
        x0, y0 = c * n, r * n
        recon_y = jax.lax.dynamic_update_slice(recon_y, rec_y, (PAD + y0, PAD + x0))
        recon_u = jax.lax.dynamic_update_slice(recon_u, rec_cb, (PAD + y0 // 2, PAD + x0 // 2))
        recon_v = jax.lax.dynamic_update_slice(recon_v, rec_cr, (PAD + y0 // 2, PAD + x0 // 2))
        out = {"mode": mode, "lev_y": lev_y, "lev_cb": lev_cb, "lev_cr": lev_cr}
        return (recon_y, recon_u, recon_v, mode), out

    (recon_y, recon_u, recon_v, _), outs = jax.lax.scan(
        step,
        (recon_y0, recon_u0, recon_v0, jnp.int32(1)),
        jnp.arange(nctu, dtype=jnp.int32),
    )
    return _crop_out(outs, recon_y, recon_u, recon_v, width, height)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def encode_frame_intra(y, u, v, qp, *, width: int, height: int):
    """Wavefront schedule: scan over anti-diagonals d = 2r + c, all CTUs of
    a wave computed as one vmapped batch.  Bit-exact vs the raster schedule
    (the 2:1 skew respects every intra reference dependency)."""
    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    lanes = min(ch, cw // 2 + 1)
    n_waves = 2 * ch + cw - 2
    qp, qp_c, lam, recon_y0, recon_u0, recon_v0, y32, u32, v32 = _frame_setup(
        y, u, v, qp, width, height
    )

    lev_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    lev_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)
    modes0 = jnp.zeros((nctu,), jnp.int32)

    def wave(carry, d):
        recon_y, recon_u, recon_v, modes, lev_y_a, lev_cb_a, lev_cr_a = carry
        k = jnp.arange(lanes, dtype=jnp.int32)
        r_min = jnp.maximum(0, (d - cw + 2) // 2)
        r = r_min + k
        c = d - 2 * r
        valid = (r < ch) & (c >= 0) & (c < cw)
        rs = jnp.where(valid, r, 0)
        cs = jnp.where(valid, c, 0)
        idx = rs * cw + cs
        # left-neighbor mode from the already-written modes array (wave d-1)
        cand_a = modes[jnp.maximum(idx - 1, 0)]

        mode, lev_y, lev_cb, lev_cr, rec_y, rec_cb, rec_cr = jax.vmap(
            _encode_ctu, in_axes=(None,) * 6 + (0, 0, 0) + (None,) * 4
        )(recon_y, recon_u, recon_v, y32, u32, v32, rs, cs, cand_a, qp, qp_c, lam, width)

        # scatter recon blocks; invalid lanes land in the padding corner
        # (PAD=32 > 16, so the dump region never overlaps picture samples)
        def scat(buf, blocks, x0s, y0s, bn):
            rows = jnp.where(valid, PAD + y0s, 0)[:, None, None] + jnp.arange(bn)[None, :, None]
            cols = jnp.where(valid, PAD + x0s, 0)[:, None, None] + jnp.arange(bn)[None, None, :]
            return buf.at[rows, cols].set(blocks)

        recon_y = scat(recon_y, rec_y, cs * n, rs * n, n)
        recon_u = scat(recon_u, rec_cb, cs * (n // 2), rs * (n // 2), n // 2)
        recon_v = scat(recon_v, rec_cr, cs * (n // 2), rs * (n // 2), n // 2)

        out_idx = jnp.where(valid, idx, nctu)
        modes = modes.at[out_idx].set(mode, mode="drop")
        lev_y_a = lev_y_a.at[out_idx].set(lev_y, mode="drop")
        lev_cb_a = lev_cb_a.at[out_idx].set(lev_cb, mode="drop")
        lev_cr_a = lev_cr_a.at[out_idx].set(lev_cr, mode="drop")
        return (recon_y, recon_u, recon_v, modes, lev_y_a, lev_cb_a, lev_cr_a), None

    carry0 = (recon_y0, recon_u0, recon_v0, modes0, lev_y0, lev_c0, jnp.zeros_like(lev_c0))
    (recon_y, recon_u, recon_v, modes, lev_y_a, lev_cb_a, lev_cr_a), _ = jax.lax.scan(
        wave, carry0, jnp.arange(n_waves, dtype=jnp.int32)
    )
    outs = {"mode": modes, "lev_y": lev_y_a, "lev_cb": lev_cb_a, "lev_cr": lev_cr_a}
    return _crop_out(outs, recon_y, recon_u, recon_v, width, height)


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
