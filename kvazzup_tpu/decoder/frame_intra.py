"""All-intra frame reconstruction: the decoder-side device scan.

Same in-loop math and block memory layout as the encoder's scan (dequant ->
inverse transform -> intra prediction -> reconstruct), driven by decoded
modes/coefficients — bit-exactness with the encoder reconstruction is
structural, since both run the identical jitted integer ops.

Uses the wavefront (2:1 skew) schedule: decode reconstruction has the same
left/above/above-right dependency pattern as encode.

Counterpart: openHEVC's decode loop (the reference consumes it at
/root/reference/src/media/processing/openhevcfilter.cpp:103-237).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..encoder.frame_intra import _gather_refs_blocks, from_blocks, wave_inputs
from ..ops import intra as intra_ops
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_intra(modes, lev_y, lev_cb, lev_cr, qp, *, width: int, height: int):
    """modes: (nctu,), lev_y: (nctu,16,16), lev_cb/cr: (nctu,8,8); qp traced."""
    from ..core.tables import CHROMA_QP_TABLE

    from ..encoder.wavefront import schedule

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule(cw, ch)
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nctu,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)

    def recon_ctu(blk_y, blk_u, blk_v, ly, lcb, lcr, mode, qpi, qpci, r, c):
        def one_plane(blocks, lev, log2, is_luma, q, w):
            a_raw, avail = _gather_refs_blocks(blocks, r, c, 1 << log2, cw, ch, w)
            a = intra_ops.substitute_refs(a_raw, avail)
            pred = intra_ops.predict_mode(a, log2, is_luma, mode)
            resid = inv_transform(dequantize(lev, q, log2), log2)
            return jnp.clip(pred + resid, 0, 255)

        rec_y = one_plane(blk_y, ly, 4, True, qpi, width)
        rec_cb = one_plane(blk_u, lcb, 3, False, qpci, width // 2)
        rec_cr = one_plane(blk_v, lcr, 3, False, qpci, width // 2)
        return rec_y, rec_cb, rec_cr

    ly_w, lcb_w, lcr_w, modes_w, qp_w, qpc_w = wave_inputs(
        sched, nctu, [jnp.asarray(lev_y), jnp.asarray(lev_cb), jnp.asarray(lev_cr),
                      jnp.asarray(modes), qp, qp_c]
    )
    xs = (ly_w, lcb_w, lcr_w, modes_w, qp_w, qpc_w,
          jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
          jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]))

    def wave(carry, x):
        blk_y, blk_u, blk_v = carry
        lyw, lcbw, lcrw, modesw, qpw, qpcw, rs, cs, valid, idx = x

        rec_y, rec_cb, rec_cr = jax.vmap(
            recon_ctu, in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(blk_y, blk_u, blk_v, lyw, lcbw, lcrw, modesw, qpw, qpcw, rs, cs)

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
