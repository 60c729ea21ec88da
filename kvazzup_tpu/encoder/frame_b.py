"""B-frame encoder: bi-prediction from two reference pictures.

The random-access milestone (BASELINE configs[2]): hierarchical GOPs code
B pictures against a past (L0) and a future (L1) reference.  Structure
mirrors frame_inter.py — per-list motion search + MC hoisted out of the
wavefront; the wave resolves merge (full-motion inheritance) vs explicit
L0/L1/BI with spec AMVP (including the 8.5.3.2.9 temporal MV scaling when
a neighbor only carries the other list), plus the intra fallback.

Motion state per CTU: pred flags (2,) and MVs (2, 2) [list][x,y]; merge
inherits both lists; the zero candidate is bi-predictive (refIdx 0/0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ctu_kernels as ck
from ..ops import intra as intra_ops
from ..ops.mc import (
    bi_round,
    mc_chroma,
    mc_chroma_14bit,
    mc_luma,
    mc_luma_14bit,
    pad_reference,
    uni_round,
)
from ..ops.me import _mv_bits, motion_search
from ..ops.quant import dequantize, quantize, quantize_rdoq
from .frame_inter import REF_PAD, SEARCH_RANGE, _mvd_bits
from .frame_intra import (
    WAVE_UNROLL,
    _gather_refs_blocks,
    _mode_bits_table,
    _frame_setup,
    from_blocks,
    wave_inputs,
    wave_to_raster,
)
from .wavefront import schedule

CT_INTRA, CT_MERGE, CT_AMVP, CT_SKIP = 0, 1, 2, 3


def scale_mv(mv, tb, td):
    """Temporal MV scaling (8.5.3.2.9), exact integer semantics.

    tb/td: POC differences (current - target ref / current - neighbor ref),
    pre-clipped to [-128, 127] by the caller (scalars here)."""
    abs_td = jnp.abs(td)
    tx_mag = (16384 + (abs_td >> 1)) // jnp.maximum(abs_td, 1)
    tx = jnp.where(td < 0, -tx_mag, tx_mag)
    dsf = jnp.clip((tb * tx + 32) >> 6, -4096, 4095)
    prod = dsf * mv
    return jnp.clip(jnp.sign(prod) * ((jnp.abs(prod) + 127) >> 8), -32768, 32767).astype(jnp.int32)


def _amvp_cand_from_neighbor(pf, mv, lx: int, tb, td_other):
    """One neighbor's AMVP contribution for list lx.

    Returns (avail_noscale, mv_noscale, avail_scaled, mv_scaled): the
    no-scale candidate (neighbor uses lx; single ref per list -> same ref)
    and the scaled fallback (neighbor only uses the other list)."""
    ly = 1 - lx
    has_x = pf[lx]
    has_y = pf[ly]
    mv_ns = mv[lx]
    mv_sc = scale_mv(mv[ly], tb, td_other)
    return has_x, mv_ns, has_y & ~has_x, mv_sc


def _amvp_list_b(nbs, lx: int, tb, td_other):
    """Spec spatial AMVP (8.5.3.2.7) specialized: A = left (A1); B over
    above-right, above, above-left; single ref per list.

    nbs: list of (avail, pf (2,), mv (2,2)) for [left, AR, A, AL].
    Returns (mvp0, mvp1)."""
    (l_av, l_pf, l_mv), b_nbs = nbs[0], nbs[1:]
    left_inter = l_av & (l_pf[0] | l_pf[1])

    # --- A candidate: left neighbor, no-scale preferred then scaled
    a_ns, a_mv_ns, a_sc, a_mv_sc = _amvp_cand_from_neighbor(l_pf, l_mv, lx, tb, td_other)
    a_avail = l_av & (a_ns | a_sc)
    a_mv = jnp.where(l_av & a_ns, a_mv_ns, a_mv_sc)

    # --- B candidate, pass 1 (no scaling): first of B0,B1,B2 using lx
    b_avail_ns = jnp.bool_(False)
    b_mv_ns = jnp.zeros(2, jnp.int32)
    for av, pf, mv in b_nbs:
        take = av & pf[lx] & ~b_avail_ns
        b_mv_ns = jnp.where(take, mv[lx], b_mv_ns)
        b_avail_ns = b_avail_ns | (av & pf[lx])

    # --- scaled pass (only when the left is not inter): first inter B
    b_avail_sc = jnp.bool_(False)
    b_mv_sc = jnp.zeros(2, jnp.int32)
    for av, pf, mv in b_nbs:
        inter = av & (pf[0] | pf[1])
        cand = jnp.where(pf[lx], mv[lx], scale_mv(mv[1 - lx], tb, td_other))
        take = inter & ~b_avail_sc
        b_mv_sc = jnp.where(take, cand, b_mv_sc)
        b_avail_sc = b_avail_sc | inter

    # spec promotion: if left not inter, A slot takes B's no-scale result
    # and the B slot is re-derived with scaling allowed
    final_a_avail = jnp.where(left_inter, a_avail, b_avail_ns)
    final_a_mv = jnp.where(left_inter, a_mv, b_mv_ns)
    final_b_avail = jnp.where(left_inter, b_avail_ns, b_avail_sc)
    final_b_mv = jnp.where(left_inter, b_mv_ns, b_mv_sc)

    both = final_a_avail & final_b_avail
    same = both & jnp.all(final_a_mv == final_b_mv)
    mvp0 = jnp.where(final_a_avail, final_a_mv,
                     jnp.where(final_b_avail, final_b_mv, jnp.zeros(2, jnp.int32)))
    mvp1 = jnp.where(both & ~same, final_b_mv, jnp.zeros(2, jnp.int32))
    return mvp0, mvp1


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq"))
def encode_frame_b(
    y, u, v,
    ref0_y, ref0_u, ref0_v, ref1_y, ref1_u, ref1_v,
    qp, poc_diffs,
    *, width: int, height: int, rdoq: bool = False,
):
    """Encode one B frame.  poc_diffs: (2,) int32 = (poc_cur - poc_ref0,
    poc_cur - poc_ref1), used by AMVP scaling.

    Returns per-CTU arrays: ctype, intra_mode, pf (2,), mv (2,2),
    mvp_flag (2,), mvd (2,2), inter_dir (1=L0, 2=L1, 3=BI for non-merge),
    levels, recon planes."""
    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule(cw, ch)
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)
    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    tb0 = jnp.clip(poc_diffs[0], -128, 127)
    tb1 = jnp.clip(poc_diffs[1], -128, 127)

    me0, _ = motion_search(y, ref0_y, lam_x1k, block=n, search_range=SEARCH_RANGE,
                           width=width, height=height)
    me1, _ = motion_search(y, ref1_y, lam_x1k, block=n, search_range=SEARCH_RANGE,
                           width=width, height=height)

    refp = [
        (pad_reference(ref0_y, REF_PAD), pad_reference(ref0_u, REF_PAD // 2),
         pad_reference(ref0_v, REF_PAD // 2)),
        (pad_reference(ref1_y, REF_PAD), pad_reference(ref1_u, REF_PAD // 2),
         pad_reference(ref1_v, REF_PAD // 2)),
    ]

    # hoisted ME predictions, 14-bit domain (bi-pred operands)
    ys_all = (jnp.arange(nctu, dtype=jnp.int32) // cw) * n
    xs_all = (jnp.arange(nctu, dtype=jnp.int32) % cw) * n

    def hoist(me, rp):
        p14 = jax.vmap(lambda x0, y0, mv: mc_luma_14bit(
            rp[0], x0, y0, mv[0], mv[1], n, width, height, REF_PAD))(xs_all, ys_all, me)
        c14b = jax.vmap(lambda x0, y0, mv: mc_chroma_14bit(
            rp[1], x0 // 2, y0 // 2, mv[0], mv[1], n // 2, width // 2, height // 2,
            REF_PAD // 2))(xs_all, ys_all, me)
        c14r = jax.vmap(lambda x0, y0, mv: mc_chroma_14bit(
            rp[2], x0 // 2, y0 // 2, mv[0], mv[1], n // 2, width // 2, height // 2,
            REF_PAD // 2))(xs_all, ys_all, me)
        return p14, c14b, c14r

    p14_0, cb14_0, cr14_0 = hoist(me0, refp[0])
    p14_1, cb14_1, cr14_1 = hoist(me1, refp[1])

    xs = wave_inputs(sched, nctu, [oy, ou, ov, me0, me1,
                                   p14_0, cb14_0, cr14_0, p14_1, cb14_1, cr14_1,
                                   qp, qp_c, lam]) + [
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    ]

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)
    carry0 = (
        blk_y0, blk_c0, jnp.zeros_like(blk_c0),
        jnp.zeros((nctu,), jnp.int32),       # intra modes
        jnp.zeros((nctu, 2, 2), jnp.int32),  # mvs per list
        jnp.zeros((nctu, 2), bool),          # pred flags
    )

    wave_fn = functools.partial(
        _wave_b, cw=cw, ch=ch, nctu=nctu, width=width, height=height,
        refp=refp, tb=(tb0, tb1), rdoq=rdoq,
    )
    carry, outs = jax.lax.scan(wave_fn, carry0, tuple(xs), unroll=WAVE_UNROLL)
    blk_y, blk_u, blk_v, modes, mvs, pfs = carry
    w2r = lambda a: wave_to_raster(sched, a)
    return {
        "ctype": w2r(outs["ctype"]),
        "intra_mode": w2r(outs["intra_mode"]),
        "pf": w2r(outs["pf"]),
        "mv": w2r(outs["mv"]),
        "inter_dir": w2r(outs["inter_dir"]),
        "mvp_flag": w2r(outs["mvp_flag"]),
        "mvd": w2r(outs["mvd"]),
        "lev_y": w2r(outs["lev_y"]).astype(jnp.int16),
        "lev_cb": w2r(outs["lev_cb"]).astype(jnp.int16),
        "lev_cr": w2r(outs["lev_cr"]).astype(jnp.int16),
        "recon_y": from_blocks(blk_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk_u, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk_v, height // 2, width // 2).astype(jnp.uint8),
    }


def _wave_b(carry, x, *, cw, ch, nctu, width, height, refp, tb, rdoq=False):
    (blk_y, blk_u, blk_v, modes, mvs, pfs) = carry
    (oyw, ouw, ovw, me0w, me1w, p14_0w, cb14_0w, cr14_0w, p14_1w, cb14_1w, cr14_1w,
     qpw, qpcw, lamw, rs, cs, valid, idx) = x
    n = 16
    lanes = rs.shape[0]
    tb0, tb1 = tb

    left_i = jnp.maximum(idx - 1, 0)
    left_inter_any = pfs[left_i].any(axis=-1)
    cand_a_mode = jnp.where(left_inter_any, 1, modes[left_i])

    def lane_motion(r, c):
        i = r * cw + c
        clampi = lambda k: jnp.clip(k, 0, cw * ch - 1)
        nb = lambda off, av: (av, pfs[clampi(i + off)], mvs[clampi(i + off)])
        avail_l = c > 0
        avail_a = r > 0
        avail_ar = avail_a & (c + 1 < cw)
        avail_al = avail_a & avail_l
        nbs_merge = [nb(-1, avail_l), nb(-cw, avail_a), nb(-cw + 1, avail_ar), nb(-cw - 1, avail_al)]
        # merge: first inter neighbor's full motion, else zero-BI
        m_found = jnp.bool_(False)
        m_pf = jnp.array([True, True])
        m_mv = jnp.zeros((2, 2), jnp.int32)
        for av, pf, mv in nbs_merge:
            inter = av & (pf[0] | pf[1])
            take = inter & ~m_found
            m_pf = jnp.where(take, pf, m_pf)
            m_mv = jnp.where(take, mv, m_mv)
            m_found = m_found | inter
        nbs_amvp = [nb(-1, avail_l), nb(-cw + 1, avail_ar), nb(-cw, avail_a), nb(-cw - 1, avail_al)]
        mvp0_l0, mvp1_l0 = _amvp_list_b(nbs_amvp, 0, tb0, tb1)
        mvp0_l1, mvp1_l1 = _amvp_list_b(nbs_amvp, 1, tb1, tb0)
        # merge prediction (14-bit per used list)
        x0, y0 = c * n, r * n
        pm0 = mc_luma_14bit(refp[0][0], x0, y0, m_mv[0, 0], m_mv[0, 1], n, width, height, REF_PAD)
        pm1 = mc_luma_14bit(refp[1][0], x0, y0, m_mv[1, 0], m_mv[1, 1], n, width, height, REF_PAD)
        pred_merge = jnp.where(
            m_pf[0] & m_pf[1], bi_round(pm0, pm1),
            jnp.where(m_pf[0], uni_round(pm0), uni_round(pm1)),
        )
        return m_pf, m_mv, pred_merge, jnp.stack([mvp0_l0, mvp1_l0]), jnp.stack([mvp0_l1, mvp1_l1])

    m_pf, m_mv, pred_merge, mvp_l0, mvp_l1 = jax.vmap(lane_motion)(rs, cs)

    # intra sweep
    a_raw, avail = jax.vmap(
        _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
    )(blk_y, rs, cs, n, cw, ch, width)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = ck.predict_all_modes_flat(a, 4, True)
    oy_flat = oyw.reshape(lanes, n * n)
    cost35 = ck.satd_flat(preds, oy_flat[:, None, :], 4).astype(jnp.float32)
    ibits = jax.vmap(_mode_bits_table)(jnp.where(cs > 0, cand_a_mode, 1))
    lam = jnp.broadcast_to(jnp.asarray(lamw, jnp.float32), (lanes,))
    costs = cost35 + lam[:, None] * ibits
    intra_mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
    cost_intra = jnp.take_along_axis(costs, intra_mode[:, None], 1)[:, 0] + lam * 3.0
    pred_intra = jnp.take_along_axis(preds, intra_mode[:, None, None], 1)[:, 0]

    # explicit inter candidates from hoisted predictions
    p0 = uni_round(p14_0w).reshape(lanes, -1)
    p1 = uni_round(p14_1w).reshape(lanes, -1)
    pbi = bi_round(p14_0w, p14_1w).reshape(lanes, -1)
    pm = pred_merge.reshape(lanes, -1)

    def mvd_cost(me, mvp):
        b0 = jax.vmap(_mvd_bits)(me - mvp[:, 0])
        b1 = jax.vmap(_mvd_bits)(me - mvp[:, 1])
        flag = (b1 < b0).astype(jnp.int32)
        return jnp.minimum(b0, b1), flag, jnp.where((b1 < b0)[:, None], me - mvp[:, 1], me - mvp[:, 0])

    bits0, flag0, mvd0 = mvd_cost(me0w, mvp_l0)
    bits1, flag1, mvd1 = mvd_cost(me1w, mvp_l1)
    sat = lambda p: ck.satd_flat(p, oy_flat, 4).astype(jnp.float32)
    cost_l0 = sat(p0) + lam * (bits0 + 4.0)
    cost_l1 = sat(p1) + lam * (bits1 + 4.0)
    cost_bi = sat(pbi) + lam * (bits0 + bits1 + 5.0)
    cost_mrg = sat(pm) + lam * 2.0

    inter_costs = jnp.stack([cost_mrg, cost_l0, cost_l1, cost_bi], axis=1)  # (L,4)
    inter_kind = jnp.argmin(inter_costs, axis=1)  # 0 merge, 1 L0, 2 L1, 3 BI
    cost_inter = jnp.min(inter_costs, axis=1)
    use_intra = cost_intra < cost_inter

    is_merge = (inter_kind == 0) & ~use_intra
    inter_dir = jnp.where(inter_kind == 3, 3, inter_kind)  # 1=L0,2=L1,3=BI (non-merge)
    pf_expl = jnp.stack([(inter_kind == 1) | (inter_kind == 3),
                         (inter_kind == 2) | (inter_kind == 3)], axis=1)
    pf_out = jnp.where(use_intra[:, None], False,
                       jnp.where(is_merge[:, None], m_pf, pf_expl))
    mv_expl = jnp.stack([me0w, me1w], axis=1)  # (L,2,2)
    mv_out = jnp.where(use_intra[:, None, None], 0,
                       jnp.where(is_merge[:, None, None], m_mv, mv_expl))
    pred_inter = jnp.where(is_merge[:, None], pm,
                  jnp.where((inter_kind == 1)[:, None], p0,
                   jnp.where((inter_kind == 2)[:, None], p1, pbi)))
    pred_y = jnp.where(use_intra[:, None], pred_intra, pred_inter)

    def code_flat(orig, pred, q, log2):
        coef = ck.fwd_transform_flat(orig - pred, log2)
        if rdoq:
            lam_sse = lam * lam
            lev = jnp.where(use_intra[:, None],
                            quantize_rdoq(coef, q, log2, lam_sse, True),
                            quantize_rdoq(coef, q, log2, lam_sse, False))
        else:
            lev = jnp.where(use_intra[:, None], quantize(coef, q, log2, True),
                            quantize(coef, q, log2, False))
        deq = dequantize(lev, q, log2)
        rec = jnp.clip(pred + ck.inv_transform_flat(deq, log2), 0, 255)
        return lev, rec

    lev_y, rec_y = code_flat(oy_flat, pred_y, qpw, 4)

    chroma = []
    for plane, (ocw, c14_0, c14_1, rp_idx) in enumerate(
        ((ouw, cb14_0w, cb14_1w, 1), (ovw, cr14_0w, cr14_1w, 2))
    ):
        a_raw_c, avail_c = jax.vmap(
            _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
        )([blk_u, blk_v][plane], rs, cs, n // 2, cw, ch, width // 2)
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        preds_c = ck.predict_all_modes_flat(ac, 3, False)
        pred_ci = jnp.take_along_axis(preds_c, intra_mode[:, None, None], 1)[:, 0]

        def lane_merge_chroma(r, c, pf, mv):
            xc, yc = c * (n // 2), r * (n // 2)
            q0 = mc_chroma_14bit(refp[0][rp_idx], xc, yc, mv[0, 0], mv[0, 1],
                                 n // 2, width // 2, height // 2, REF_PAD // 2)
            q1 = mc_chroma_14bit(refp[1][rp_idx], xc, yc, mv[1, 0], mv[1, 1],
                                 n // 2, width // 2, height // 2, REF_PAD // 2)
            return jnp.where(pf[0] & pf[1], bi_round(q0, q1),
                             jnp.where(pf[0], uni_round(q0), uni_round(q1)))

        pm_c = jax.vmap(lane_merge_chroma)(rs, cs, m_pf, m_mv).reshape(lanes, -1)
        p0c = uni_round(c14_0).reshape(lanes, -1)
        p1c = uni_round(c14_1).reshape(lanes, -1)
        pbic = bi_round(c14_0, c14_1).reshape(lanes, -1)
        pred_cm = jnp.where(is_merge[:, None], pm_c,
                   jnp.where((inter_kind == 1)[:, None], p0c,
                    jnp.where((inter_kind == 2)[:, None], p1c, pbic)))
        pred_c = jnp.where(use_intra[:, None], pred_ci, pred_cm)
        chroma.append(code_flat(ocw.reshape(lanes, -1), pred_c, qpcw, 3))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = chroma

    zero_resid = (jnp.all(lev_y == 0, axis=-1) & jnp.all(lev_cb == 0, axis=-1)
                  & jnp.all(lev_cr == 0, axis=-1))
    ctype = jnp.where(use_intra, CT_INTRA,
             jnp.where(is_merge, jnp.where(zero_resid, CT_SKIP, CT_MERGE), CT_AMVP)
             ).astype(jnp.int32)

    out_idx = jnp.where(valid, idx, nctu)
    st = lambda arr, vals: arr.at[out_idx].set(vals, mode="drop")
    sq = lambda z, s: z.reshape(lanes, s, s)
    blk_y = st(blk_y, sq(rec_y, n))
    blk_u = st(blk_u, sq(rec_cb, n // 2))
    blk_v = st(blk_v, sq(rec_cr, n // 2))
    modes = st(modes, intra_mode)
    mvs = st(mvs, mv_out)
    pfs = st(pfs, pf_out)
    stacked = dict(
        ctype=ctype,
        intra_mode=intra_mode,
        pf=pf_out,
        mv=mv_out,
        inter_dir=inter_dir.astype(jnp.int32),
        mvp_flag=jnp.stack([flag0, flag1], axis=1),
        mvd=jnp.stack([mvd0, mvd1], axis=1),
        lev_y=sq(lev_y, n),
        lev_cb=sq(lev_cb, n // 2),
        lev_cr=sq(lev_cr, n // 2),
    )
    return (blk_y, blk_u, blk_v, modes, mvs, pfs), stacked
