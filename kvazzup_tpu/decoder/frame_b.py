"""B-frame reconstruction: decoder-side wavefront with bi-prediction."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..encoder.frame_b import CT_INTRA
from ..encoder.frame_inter import REF_PAD
from ..encoder.frame_intra import _gather_refs_blocks, from_blocks, wave_inputs
from ..ops import intra as intra_ops
from ..ops.mc import (
    bi_round,
    mc_chroma_14bit,
    mc_luma_14bit,
    pad_reference,
    uni_round,
)
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_b(
    ctype, intra_modes, pf, mvs, lev_y, lev_cb, lev_cr,
    ref0_y, ref0_u, ref0_v, ref1_y, ref1_u, ref1_v, qp,
    *, width: int, height: int,
):
    from ..core.tables import CHROMA_QP_TABLE
    from ..encoder.wavefront import schedule

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule(cw, ch)
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nctu,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]

    refp = [
        (pad_reference(ref0_y, REF_PAD), pad_reference(ref0_u, REF_PAD // 2),
         pad_reference(ref0_v, REF_PAD // 2)),
        (pad_reference(ref1_y, REF_PAD), pad_reference(ref1_u, REF_PAD // 2),
         pad_reference(ref1_v, REF_PAD // 2)),
    ]
    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)

    def recon_ctu(blk_y, blk_u, blk_v, ct, mode, pfl, mv, ly, lcb, lcr, qpi, qpci, r, c):
        x0, y0 = c * n, r * n
        is_intra = ct == CT_INTRA

        def plane(blocks, lev, log2, is_luma, q, w, h, ridx, pad):
            a_raw, avail = _gather_refs_blocks(blocks, r, c, 1 << log2, cw, ch, w)
            a = intra_ops.substitute_refs(a_raw, avail)
            pred_i = intra_ops.predict_mode(a, log2, is_luma, mode)
            sz = 1 << log2
            px = x0 if is_luma else x0 // 2
            py = y0 if is_luma else y0 // 2
            mcf = mc_luma_14bit if is_luma else mc_chroma_14bit
            p0 = mcf(refp[0][ridx], px, py, mv[0, 0], mv[0, 1], sz, w, h, pad)
            p1 = mcf(refp[1][ridx], px, py, mv[1, 0], mv[1, 1], sz, w, h, pad)
            pred_m = jnp.where(
                pfl[0] & pfl[1], bi_round(p0, p1),
                jnp.where(pfl[0], uni_round(p0), uni_round(p1)),
            )
            pred = jnp.where(is_intra, pred_i, pred_m)
            resid = inv_transform(dequantize(lev, q, log2), log2)
            return jnp.clip(pred + resid, 0, 255)

        rec_y = plane(blk_y, ly, 4, True, qpi, width, height, 0, REF_PAD)
        rec_cb = plane(blk_u, lcb, 3, False, qpci, width // 2, height // 2, 1, REF_PAD // 2)
        rec_cr = plane(blk_v, lcr, 3, False, qpci, width // 2, height // 2, 2, REF_PAD // 2)
        return rec_y, rec_cb, rec_cr

    ins = wave_inputs(
        sched, nctu,
        [jnp.asarray(ctype), jnp.asarray(intra_modes), jnp.asarray(pf), jnp.asarray(mvs),
         jnp.asarray(lev_y), jnp.asarray(lev_cb), jnp.asarray(lev_cr), qp, qp_c],
    )
    xs = tuple(ins) + (
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    )

    def wave(carry, x):
        blk_y, blk_u, blk_v = carry
        ctw, imw, pfw, mvw, lyw, lcbw, lcrw, qpw, qpcw, rs, cs, valid, idx = x
        rec_y, rec_cb, rec_cr = jax.vmap(
            recon_ctu, in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        )(blk_y, blk_u, blk_v, ctw, imw, pfw, mvw, lyw, lcbw, lcrw, qpw, qpcw, rs, cs)
        out_idx = jnp.where(valid, idx, nctu)
        blk_y = blk_y.at[out_idx].set(rec_y, mode="drop")
        blk_u = blk_u.at[out_idx].set(rec_cb, mode="drop")
        blk_v = blk_v.at[out_idx].set(rec_cr, mode="drop")
        return (blk_y, blk_u, blk_v), None

    (blk_y, blk_u, blk_v), _ = jax.lax.scan(
        wave, (blk_y0, blk_c0, jnp.zeros_like(blk_c0)), xs
    )
    return (
        from_blocks(blk_y, height, width).astype(jnp.uint8),
        from_blocks(blk_u, height // 2, width // 2).astype(jnp.uint8),
        from_blocks(blk_v, height // 2, width // 2).astype(jnp.uint8),
    )
