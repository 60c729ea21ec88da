"""All-intra frame reconstruction: the decoder-side device scan.

Same in-loop math as the encoder's scan (dequant -> inverse transform ->
intra prediction -> reconstruct), driven by decoded modes/coefficients —
bit-exactness with the encoder reconstruction is structural, since both run
the identical jitted integer ops in the identical order.

Counterpart: openHEVC's decode loop (the reference consumes it at
/root/reference/src/media/processing/openhevcfilter.cpp:103-237).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..encoder.frame_intra import PAD, _gather_refs
from ..ops import intra as intra_ops
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_intra(modes, lev_y, lev_cb, lev_cr, qp, *, width: int, height: int):
    """modes: (nctu,), lev_y: (nctu,16,16), lev_cb/cr: (nctu,8,8); qp traced."""
    from ..core.tables import CHROMA_QP_TABLE

    n = 16
    ctbs_w = width // n
    nctu = modes.shape[0]
    qp = jnp.asarray(qp, jnp.int32)
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]

    recon_y0 = jnp.zeros((height + 2 * PAD, width + 2 * PAD), jnp.int32)
    recon_u0 = jnp.zeros((height // 2 + 2 * PAD, width // 2 + 2 * PAD), jnp.int32)
    recon_v0 = jnp.zeros_like(recon_u0)

    def recon_block(rec_buf, lev, mode, x0, y0, size_log2, is_luma, q, w, avail_above, avail_left):
        a_raw, avail = _gather_refs(
            rec_buf, x0, y0, 1 << size_log2, w, avail_above, avail_left
        )
        a = intra_ops.substitute_refs(a_raw, avail)
        pred = intra_ops.predict_mode(a, size_log2, is_luma, mode)
        deq = dequantize(lev, q, size_log2)
        resid = inv_transform(deq, size_log2)
        rec = jnp.clip(pred + resid, 0, 255)
        return jax.lax.dynamic_update_slice(rec_buf, rec, (PAD + y0, PAD + x0))

    def step(carry, inp):
        recon_y, recon_u, recon_v = carry
        i, mode, ly, lcb, lcr = inp
        r = i // ctbs_w
        c = i % ctbs_w
        x0, y0 = c * n, r * n
        avail_above = r > 0
        avail_left = c > 0
        recon_y = recon_block(recon_y, ly, mode, x0, y0, 4, True, qp, width, avail_above, avail_left)
        recon_u = recon_block(recon_u, lcb, mode, x0 // 2, y0 // 2, 3, False, qp_c, width // 2, avail_above, avail_left)
        recon_v = recon_block(recon_v, lcr, mode, x0 // 2, y0 // 2, 3, False, qp_c, width // 2, avail_above, avail_left)
        return (recon_y, recon_u, recon_v), None

    (recon_y, recon_u, recon_v), _ = jax.lax.scan(
        step,
        (recon_y0, recon_u0, recon_v0),
        (jnp.arange(nctu, dtype=jnp.int32), modes, lev_y, lev_cb, lev_cr),
    )
    crop = lambda rbuf, h, w: rbuf[PAD : PAD + h, PAD : PAD + w].astype(jnp.uint8)
    return (
        crop(recon_y, height, width),
        crop(recon_u, height // 2, width // 2),
        crop(recon_v, height // 2, width // 2),
    )
