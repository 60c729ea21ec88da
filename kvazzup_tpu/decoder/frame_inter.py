"""P-frame reconstruction: decoder-side wavefront with inter prediction.

Mirrors encoder/frame_inter's reconstruction math exactly (MC from the
reference picture or intra prediction, plus the dequant/inverse-transform
residual), driven by decoded CU types, modes and MVs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..encoder.frame_inter import CT_INTRA, REF_PAD
from ..encoder.frame_intra import _gather_refs_blocks, from_blocks, wave_inputs
from ..ops import intra as intra_ops
from ..ops.mc import mc_chroma, mc_luma, pad_reference
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_p(
    ctype, intra_modes, mvs_in, lev_y, lev_cb, lev_cr, ref_y, ref_u, ref_v, qp,
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

    refp_y = pad_reference(ref_y, REF_PAD)
    refp_u = pad_reference(ref_u, REF_PAD // 2)
    refp_v = pad_reference(ref_v, REF_PAD // 2)

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)

    def recon_ctu(blk_y, blk_u, blk_v, ct, mode, mv, ly, lcb, lcr, qpi, qpci, r, c):
        x0, y0 = c * n, r * n
        is_intra = ct == CT_INTRA

        def plane(blocks, lev, log2, is_luma, q, w, h, refp, pad, mc):
            a_raw, avail = _gather_refs_blocks(blocks, r, c, 1 << log2, cw, ch, w)
            a = intra_ops.substitute_refs(a_raw, avail)
            pred_i = intra_ops.predict_mode(a, log2, is_luma, mode)
            sz = 1 << log2
            px = x0 // (n // sz) if is_luma else x0 // 2
            py = y0 // (n // sz) if is_luma else y0 // 2
            pred_m = mc(refp, px, py, mv[0], mv[1], sz, w, h, pad)
            pred = jnp.where(is_intra, pred_i, pred_m)
            resid = inv_transform(dequantize(lev, q, log2), log2)
            return jnp.clip(pred + resid, 0, 255)

        rec_y = plane(blk_y, ly, 4, True, qpi, width, height, refp_y, REF_PAD, mc_luma)
        rec_cb = plane(blk_u, lcb, 3, False, qpci, width // 2, height // 2, refp_u, REF_PAD // 2, mc_chroma)
        rec_cr = plane(blk_v, lcr, 3, False, qpci, width // 2, height // 2, refp_v, REF_PAD // 2, mc_chroma)
        return rec_y, rec_cb, rec_cr

    ct_w, im_w, mv_w, ly_w, lcb_w, lcr_w, qp_w, qpc_w = wave_inputs(
        sched, nctu,
        [jnp.asarray(ctype), jnp.asarray(intra_modes), jnp.asarray(mvs_in),
         jnp.asarray(lev_y), jnp.asarray(lev_cb), jnp.asarray(lev_cr), qp, qp_c],
    )
    xs = (ct_w, im_w, mv_w, ly_w, lcb_w, lcr_w, qp_w, qpc_w,
          jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
          jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]))

    def wave(carry, x):
        blk_y, blk_u, blk_v = carry
        ctw, imw, mvw, lyw, lcbw, lcrw, qpw, qpcw, rs, cs, valid, idx = x
        rec_y, rec_cb, rec_cr = jax.vmap(
            recon_ctu, in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        )(blk_y, blk_u, blk_v, ctw, imw, mvw, lyw, lcbw, lcrw, qpw, qpcw, rs, cs)
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
