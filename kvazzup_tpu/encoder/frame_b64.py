"""Device-native CTB-64 CU-quadtree B encoder (bi-prediction, depth 0..2).

The random-access production engine: extends frame_inter64.py with list 1
— kvazaar's RA operating point (GOP config surface
/root/reference/src/media/processing/kvazaarfilter.cpp:233) re-designed as
a TPU wavefront.  Dense prepasses run per-list motion searches at
64/32/16 plus orig-boundary intra sweeps; the ring-carry 64-wave resolves
the sequential state: full-motion merge candidate lists with the spec's
combined bi-predictive candidates (8.5.3.2.4), per-list AMVP with the
8.5.3.2.9 cross-list temporal scaling, L0/L1/BI/merge/intra arbitration,
and normative reconstruction (bi-prediction combines in the 14-bit
domain, 8.5.4.2.3).

Motion state per 16x16 cell: pred flags (2,) and MVs (2, 2) [list][x, y];
unused-list MVs are kept zero (the decoder's _commit_b invariant), so
candidate pruning can compare (pf, mv) tuples directly.  One reference
per list with distinct POCs, 2Nx2N PUs, TU == CU at depths 1..2 and the
inter-only CU64 leaf with its forced TU32 transform tree.  TMVP is off in
B slices (slice_temporal_mvp_enabled_flag = 0; the RA P anchors keep it).
Entropy pairs with entropy/quad.py's B writer; the decode side is the
generic B tier (decoder/generic_b.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ctu_kernels as _ck_mod  # noqa: F401 (import side effects)
from ..ops.mc import (bi_round, mc_chroma_window_batch_14bit,
                      mc_luma_window_batch_14bit, sheared_ref_strips,
                      strip_window_slice, uni_round)
from ..ops.me import _mv_bits, motion_search
from .frame_b import scale_mv
from .frame_inter import (CT_AMVP, CT_INTRA, CT_MERGE, CT_SKIP,
                          SEARCH_RANGE, REF_PAD, _mvd_bits)
from .frame_inter32 import _PPM_INV, _code_flat_mode, _cost_prepass_grid
from .frame_intra import (P_PREPASS_MODES, QUAD_UNROLL, _ring_push,
                          from_blocks, to_blocks, wave_inputs,
                          wave_to_raster)
from .frame_intra64 import _seg_spec, _unit_walk, _z
from .wavefront import schedule_r

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))

# 8.5.3.2.4 combined bi-predictive candidate order (l0CandIdx, l1CandIdx)
_COMB_ORDER = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
               (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))


def _merge_list_cells_b(cands, K: int):
    """Spec B merge list (8.5.3.2.3/4/5) from per-position full-motion
    candidates: spatial A1, B1, B0, A0, B2 with full-motion pruning,
    combined bi-predictive candidates over the base list, zero-BI fill.

    cands: dict a1, b1, b0, a0, b2 -> (avail (L,), pf (L, 2) int32,
    mv (L, 2, 2)).  With distinct L0/L1 reference POCs the combined
    candidate's duplicate check never fires and the zero fill is always
    bi-predictive refIdx 0/0 — matching decoder/generic_b._merge_list_b.
    Returns list of K (pf (L, 2) int32, mv (L, 2, 2))."""
    def eq(A, B):
        (_, pa, ma), (_, pb, mb) = A, B
        return (jnp.all(pa == pb, axis=-1)
                & jnp.all(ma == mb, axis=(-2, -1)))

    a1, b1, b0, a0, b2 = (cands[k] for k in ("a1", "b1", "b0", "a0", "b2"))
    va1, vb1, vb0, va0, vb2 = (c[0] for c in (a1, b1, b0, a0, b2))
    i32 = lambda f: f.astype(jnp.int32)
    p_a1 = va1
    p_b1 = vb1 & ~(va1 & eq(b1, a1))
    p_b0 = vb0 & ~(vb1 & eq(b0, b1))
    p_a0 = va0 & ~(va1 & eq(a0, a1))
    nfirst4 = i32(p_a1) + i32(p_b1) + i32(p_b0) + i32(p_a0)
    p_b2 = (nfirst4 < 4) & vb2 & ~(va1 & eq(b2, a1)) & ~(vb1 & eq(b2, b1))
    pos_b1 = i32(p_a1)
    pos_b0 = pos_b1 + i32(p_b1)
    pos_a0 = pos_b0 + i32(p_b0)
    pos_b2 = pos_a0 + i32(p_a0)
    n_spat = pos_b2 + i32(p_b2)

    L = va1.shape[0]
    zero_pf = jnp.zeros((L, 2), jnp.int32)
    zero_mv = jnp.zeros((L, 2, 2), jnp.int32)
    srcs = ((p_a1, jnp.zeros_like(pos_b1), a1), (p_b1, pos_b1, b1),
            (p_b0, pos_b0, b0), (p_a0, pos_a0, a0), (p_b2, pos_b2, b2))
    base = []
    for k in range(5):
        pf_k, mv_k = zero_pf, zero_mv
        for (p, pos, (_, pf, mv)) in srcs:
            w = p & (pos == k)
            pf_k = jnp.where(w[:, None], pf, pf_k)
            mv_k = jnp.where(w[:, None, None], mv, mv_k)
        base.append((pf_k, mv_k))

    slot_pf = [base[k][0] for k in range(K)]
    slot_mv = [base[k][1] for k in range(K)]
    one_pf = jnp.ones((L, 2), jnp.int32)
    total = n_spat
    if K > 1:
        for (i_, j_) in _COMB_ORDER:
            ok = ((i_ < n_spat) & (j_ < n_spat) & (total < K)
                  & (base[i_][0][:, 0] != 0) & (base[j_][0][:, 1] != 0))
            comb_mv = jnp.stack([base[i_][1][:, 0], base[j_][1][:, 1]],
                                axis=1)
            for k in range(1, K):  # combined never lands at slot 0
                w = ok & (total == k)
                slot_pf[k] = jnp.where(w[:, None], one_pf, slot_pf[k])
                slot_mv[k] = jnp.where(w[:, None, None], comb_mv, slot_mv[k])
            total = total + i32(ok)
    for k in range(K):
        unfilled = total <= k
        slot_pf[k] = jnp.where(unfilled[:, None], one_pf, slot_pf[k])
        slot_mv[k] = jnp.where(unfilled[:, None, None], jnp.zeros_like(zero_mv),
                               slot_mv[k])
    return list(zip(slot_pf, slot_mv))


def _amvp_cells_b(a_nbs, b_nbs, lx: int, tb, td_other):
    """Spec spatial AMVP for list lx (8.5.3.2.7, one ref per list):
    A over (A0, A1), B over (B0, B1, B2); a neighbor using only the other
    list contributes its MV scaled by 8.5.3.2.9; the B->A promotion when
    neither A neighbor is coded inter.

    a_nbs/b_nbs: [(avail (L,), pf (L, 2) int32, mv (L, 2, 2))].
    tb = poc_cur - poc_ref[lx]; td_other = poc_cur - poc_ref[1-lx]
    (traced scalars, pre-clipped to [-128, 127]).  Returns (mvp0, mvp1)."""
    ly = 1 - lx
    L = a_nbs[0][0].shape[0]
    fls = jnp.zeros((L,), bool)
    zmv = jnp.zeros((L, 2), jnp.int32)

    def first_noscale(nbs):
        avail, mvo = fls, zmv
        for av, pf, mv in nbs:
            c = av & (pf[:, lx] != 0)
            take = c & ~avail
            mvo = jnp.where(take[:, None], mv[:, lx], mvo)
            avail = avail | c
        return avail, mvo

    def first_scaled(nbs):
        avail, mvo = fls, zmv
        for av, pf, mv in nbs:
            inter = av & ((pf[:, 0] | pf[:, 1]) != 0)
            cand = jnp.where((pf[:, lx] != 0)[:, None], mv[:, lx],
                             scale_mv(mv[:, ly], tb, td_other))
            take = inter & ~avail
            mvo = jnp.where(take[:, None], cand, mvo)
            avail = avail | inter
        return avail, mvo

    a_ns, a_mv_ns = first_noscale(a_nbs)
    a_sc, a_mv_sc = first_scaled(a_nbs)
    availA = a_ns | a_sc
    mvA = jnp.where(a_ns[:, None], a_mv_ns, a_mv_sc)
    is_scaled = fls
    for av, pf, mv in a_nbs:
        is_scaled = is_scaled | (av & ((pf[:, 0] | pf[:, 1]) != 0))

    b_ns, b_mv_ns = first_noscale(b_nbs)
    b_sc, b_mv_sc = first_scaled(b_nbs)

    fA_av = jnp.where(is_scaled, availA, b_ns)
    fA_mv = jnp.where(is_scaled[:, None], mvA, b_mv_ns)
    fB_av = jnp.where(is_scaled, b_ns, b_sc)
    fB_mv = jnp.where(is_scaled[:, None], b_mv_ns, b_mv_sc)

    both = fA_av & fB_av
    same = both & jnp.all(fA_mv == fB_mv, axis=-1)
    mvp0 = jnp.where(fA_av[:, None], fA_mv,
                     jnp.where(fB_av[:, None], fB_mv, zmv))
    mvp1 = jnp.where((both & ~same)[:, None], fB_mv, zmv)
    return mvp0, mvp1


def _arbitrate_b(ck, oy_flat, log2, win0, win1, merge_cands, me0, me1,
                 mvp_l0, mvp_l1, icost, lamf, K):
    """B-slice intra/merge/L0/L1/BI arbitration at one CU size.

    merge_cands: list of K (pf (L, 2), mv (L, 2, 2)).  Returns the
    decision bundle with full dual-list motion (unused-list MVs zeroed)."""
    n = 1 << log2
    L = oy_flat.shape[0]
    # ONE batched MC over [K merge + explicit] x [L0, L1] and ONE batched
    # SATD over [K merge combos, L0, L1, BI]: identical arithmetic to the
    # per-candidate calls (MC/SATD/rounding are per-row independent), but
    # 2K+2 MC chains and K+3 SATD chains collapse to one each — the waves
    # are dispatch-latency bound, not FLOP bound
    mv0s = [mv[:, 0] for _, mv in merge_cands] + [me0]
    mv1s = [mv[:, 1] for _, mv in merge_cands] + [me1]
    allmv = jnp.concatenate(mv0s + mv1s, axis=0)
    winb = jnp.concatenate([jnp.tile(win0, (K + 1, 1, 1)),
                            jnp.tile(win1, (K + 1, 1, 1))], 0)
    p14 = mc_luma_window_batch_14bit(winb, allmv, n, SEARCH_RANGE).reshape(
        2, K + 1, L, n, n)
    p0s, p1s = p14[0], p14[1]
    pf_all = jnp.stack([pf for pf, _ in merge_cands])      # (K, L, 2)
    both_m = ((pf_all[:, :, 0] & pf_all[:, :, 1]) != 0)[:, :, None, None]
    use0_m = (pf_all[:, :, 0] != 0)[:, :, None, None]
    pred_m = jnp.where(both_m, bi_round(p0s[:K], p1s[:K]),
                       jnp.where(use0_m, uni_round(p0s[:K]),
                                 uni_round(p1s[:K])))
    p0u = uni_round(p0s[K]).reshape(L, -1)
    p1u = uni_round(p1s[K]).reshape(L, -1)
    pbi = bi_round(p0s[K], p1s[K]).reshape(L, -1)
    preds_all = jnp.concatenate(
        [pred_m.reshape(K * L, -1), p0u, p1u, pbi], 0)
    sats = ck.satd_flat(preds_all, jnp.tile(oy_flat, (K + 3, 1)),
                        log2).astype(jnp.float32).reshape(K + 3, L)
    idx_bits = jnp.asarray(
        [float(min(k + 1, K - 1)) if K > 1 else 0.0 for k in range(K)],
        jnp.float32)
    costs_s = sats[:K] + lamf[None, :] * (2.0 + idx_bits[:, None])
    merge_idx = jnp.argmin(costs_s, axis=0).astype(jnp.int32)
    cost_merge = jnp.take_along_axis(costs_s, merge_idx[None], 0)[0]
    pick = lambda stk: jnp.take_along_axis(
        stk, merge_idx[(None, slice(None)) + (None,) * (stk.ndim - 2)], 0)[0]
    merge_pf = pick(pf_all)
    merge_mv = pick(jnp.stack([mv for _, mv in merge_cands]))
    pred_mrg = pick(pred_m.reshape(K, L, -1))

    def mvd_cost(me, mvp):
        mvp0, mvp1 = mvp
        d0, d1 = me - mvp0, me - mvp1
        b0 = jax.vmap(_mvd_bits)(d0)
        b1 = jax.vmap(_mvd_bits)(d1)
        use1 = b1 < b0
        return (jnp.minimum(b0, b1), use1.astype(jnp.int32),
                jnp.where(use1[:, None], d1, d0))

    bits0, flag0, mvd0 = mvd_cost(me0, mvp_l0)
    bits1, flag1, mvd1 = mvd_cost(me1, mvp_l1)
    cost_l0 = sats[K] + lamf * (bits0 + 5.0)
    cost_l1 = sats[K + 1] + lamf * (bits1 + 5.0)
    cost_bi = sats[K + 2] + lamf * (bits0 + bits1 + 7.0)

    expl = jnp.stack([cost_l0, cost_l1, cost_bi], axis=1)
    expl_kind = jnp.argmin(expl, axis=1)  # 0 L0, 1 L1, 2 BI
    cost_expl = jnp.min(expl, axis=1)
    inter_dir = jnp.where(expl_kind == 2, 3, expl_kind + 1).astype(jnp.int32)
    pf_expl = jnp.stack([(expl_kind == 0) | (expl_kind == 2),
                         (expl_kind == 1) | (expl_kind == 2)],
                        axis=1).astype(jnp.int32)
    mv_expl = jnp.stack([me0, me1], axis=1) * pf_expl[:, :, None]
    mvd_expl = jnp.stack([mvd0, mvd1], axis=1) * pf_expl[:, :, None]
    flag_expl = jnp.stack([flag0, flag1], axis=1) * pf_expl
    pred_expl = jnp.where((expl_kind == 0)[:, None], p0u,
                          jnp.where((expl_kind == 1)[:, None], p1u, pbi))

    is_merge = cost_merge <= cost_expl
    use_intra = icost < jnp.minimum(cost_merge, cost_expl)
    pf_sel = jnp.where(is_merge[:, None], merge_pf, pf_expl)
    mv_sel = jnp.where(is_merge[:, None, None],
                       merge_mv * merge_pf[:, :, None], mv_expl)
    pred_inter = jnp.where(is_merge[:, None], pred_mrg, pred_expl)
    return dict(use_intra=use_intra, is_merge=is_merge, pf=pf_sel, mv=mv_sel,
                pred_inter=pred_inter, merge_idx=merge_idx,
                inter_dir=inter_dir, mvp_flag=flag_expl, mvd=mvd_expl)


@functools.partial(jax.jit, static_argnames=("width", "height", "merge_cand",
                                              "rdoq", "lam_scale"))
def encode_frame_b64_fast(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, qp,
                          poc_diffs, *, width: int, height: int,
                          merge_cand: int = 1, rdoq: bool = False,
                          lam_scale: float = 1.0):
    """Dense-decision CTB64 quadtree B encode (ring-carry 64-wave).

    poc_diffs: (2,) int32 = (poc_cur - poc_ref0, poc_cur - poc_ref1); used
    by the AMVP cross-list scaling.  Returns the device decision bundle
    for quad_b64_trees_from_device."""
    from ..core.tables import CHROMA_QP_TABLE
    from ..ops import ctu_kernels as ck

    S = 64
    cw, ch = width // S, height // S
    nctb = cw * ch
    K = merge_cand
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]
    tb0 = jnp.clip(poc_diffs[0], -128, 127)
    tb1 = jnp.clip(poc_diffs[1], -128, 127)

    qp = jnp.asarray(qp, jnp.int32)
    qpb = jnp.broadcast_to(qp, (nctb,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qpb, 0, 57)]
    # lam_scale: temporal-layer lambda weighting (HM/kvazaar weight the
    # hierarchical B lambdas above the I/P formula; the RA driver passes
    # its per-layer factor — sqrt because this lam is the SATD-domain one)
    lam = jnp.sqrt(
        0.57 * float(lam_scale) ** 2
        * 2.0 ** ((qpb.astype(jnp.float32) - 12.0) / 3.0))
    yi = y.astype(jnp.int32)
    oy64 = to_blocks(yi, S)
    ou32 = to_blocks(u.astype(jnp.int32), S // 2)
    ov32 = to_blocks(v.astype(jnp.int32), S // 2)
    oy32 = to_blocks(yi, 32)
    oy16 = to_blocks(yi, 16)

    # ---- dense pre-passes: per-list motion searches at 64/32/16
    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    mekw = dict(search_range=SEARCH_RANGE, width=width, height=height)
    me = {}
    for li, ref in ((0, r0y), (1, r1y)):
        for blk in (64, 32, 16):
            me[(li, blk)], _ = motion_search(y, ref, lam_x1k, block=blk,
                                             **mekw)

    from ..ops.mc import extract_mc_neighborhoods

    refp = []
    for (ry_, ru_, rv_) in ((r0y, r0u, r0v), (r1y, r1u, r1v)):
        refp.append((jnp.pad(ry_, REF_PAD, mode="edge"),
                     jnp.pad(ru_, REF_PAD // 2, mode="edge"),
                     jnp.pad(rv_, REF_PAD // 2, mode="edge")))
    wins = {}
    strips = {}
    for li in (0, 1):
        wins[(li, 64)] = extract_mc_neighborhoods(refp[li][0], S,
                                                  SEARCH_RANGE, cw, ch,
                                                  REF_PAD)
        wins[(li, 32)] = extract_mc_neighborhoods(refp[li][0], 32,
                                                  SEARCH_RANGE, 2 * cw,
                                                  2 * ch, REF_PAD)
        wins[(li, 16)] = extract_mc_neighborhoods(refp[li][0], 16,
                                                  SEARCH_RANGE, 4 * cw,
                                                  4 * ch, REF_PAD)
        strips[(li, "y")] = sheared_ref_strips(refp[li][0], S, SEARCH_RANGE,
                                               ch, REF_PAD)
        strips[(li, "u")] = sheared_ref_strips(refp[li][1], S // 2,
                                               SEARCH_RANGE, ch,
                                               REF_PAD // 2, chroma=True)
        strips[(li, "v")] = sheared_ref_strips(refp[li][2], S // 2,
                                               SEARCH_RANGE, ch,
                                               REF_PAD // 2, chroma=True)

    mebits = lambda mv: (jax.vmap(_mv_bits)(mv[:, 0])
                         + jax.vmap(_mv_bits)(mv[:, 1]))

    def dense_cost(blk, nb, oyb, lamv):
        """min over L0/L1/BI of rate-biased SATD at block size `blk`."""
        log2 = blk.bit_length() - 1
        p0 = mc_luma_window_batch_14bit(wins[(0, blk)], me[(0, blk)], blk,
                                        SEARCH_RANGE)
        p1 = mc_luma_window_batch_14bit(wins[(1, blk)], me[(1, blk)], blk,
                                        SEARCH_RANGE)
        oyf = oyb.reshape(nb, -1)
        satf = lambda p: ck.satd_flat(p.reshape(nb, -1), oyf, log2).astype(
            jnp.float32)
        b0 = mebits(me[(0, blk)]).astype(jnp.float32)
        b1 = mebits(me[(1, blk)]).astype(jnp.float32)
        c0 = satf(uni_round(p0)) + lamv * (b0 + 5.0)
        c1 = satf(uni_round(p1)) + lamv * (b1 + 5.0)
        cb = satf(bi_round(p0, p1)) + lamv * (b0 + b1 + 7.0)
        return jnp.minimum(jnp.minimum(c0, c1), cb)

    rep = lambda a, f: jnp.repeat(
        jnp.repeat(a.reshape(ch, cw), f, 0), f, 1).reshape(-1)
    qp16, lam16 = rep(qpb, 4), rep(lam, 4)
    qp32, lam32 = rep(qpb, 2), rep(lam, 2)
    imode16, icost16 = _cost_prepass_grid(yi, oy16, qp16, lam16, log2=4,
                                          cw=4 * cw, ch=4 * ch)
    imode32, icost32 = _cost_prepass_grid(yi, oy32, qp32, lam32, log2=5,
                                          cw=2 * cw, ch=2 * ch)

    cost64 = dense_cost(64, nctb, oy64, lam)
    inter32 = dense_cost(32, 4 * nctb, oy32, lam32)
    inter16 = dense_cost(16, 16 * nctb, oy16, lam16)
    best16 = jnp.minimum(icost16, inter16)
    best32 = jnp.minimum(icost32, inter32)

    lam2v = lam * lam
    lam2_32 = lam32 * lam32
    q16g = lambda a2, c2, r2: jnp.stack(
        [a2.reshape(r2, c2)[dy::2, dx::2].reshape(-1) for dy, dx in _ZO],
        axis=1)
    sum16 = jnp.sum(q16g(best16, 4 * cw, 4 * ch), axis=1)
    split32_g = (sum16 + lam2_32 * 5.0 < best32 + lam2_32 * 1.0)
    best32sel = jnp.minimum(sum16 + lam2_32 * 5.0, best32 + lam2_32 * 1.0)
    sum32 = jnp.sum(q16g(best32sel, 2 * cw, 2 * ch), axis=1)
    split64 = (sum32 + lam2v * 1.0 < cost64 + lam2v * 1.0).astype(jnp.int32)
    split32 = q16g(split32_g.astype(jnp.int32), 2 * cw, 2 * ch)

    # ---- per-CTB z-order gathers of the prepass grids
    m32z = q16g(imode32, 2 * cw, 2 * ch)
    ic32z = q16g(icost32, 2 * cw, 2 * ch)
    mvzip = lambda a, c2, r2: jnp.stack(
        [a.reshape(r2, c2, 2)[dy::2, dx::2].reshape(-1, 2)
         for dy, dx in _ZO], axis=1)
    me32z = {li: mvzip(me[(li, 32)], 2 * cw, 2 * ch) for li in (0, 1)}
    m16_32 = q16g(imode16, 4 * cw, 4 * ch)
    ic16_32 = q16g(icost16, 4 * cw, 4 * ch)
    me16_32 = {li: mvzip(me[(li, 16)], 4 * cw, 4 * ch) for li in (0, 1)}
    g32 = lambda a: jnp.stack(
        [a.reshape(2 * ch, 2 * cw, *a.shape[1:])[dy::2, dx::2].reshape(
            (-1,) + a.shape[1:]) for dy, dx in _ZO], axis=1)
    m16z = g32(m16_32)
    ic16z = g32(ic16_32)
    me16z = {li: g32(me16_32[li]) for li in (0, 1)}

    # ---- wave inputs
    (oy_w, ou_w, ov_w, me64_0w, me64_1w, me32_0w, me32_1w, me16_0w, me16_1w,
     im32_w, ic32_w, im16_w, ic16_w, s64_w, s32_w, qp_w, qpc_w,
     lam_w) = wave_inputs(
        sched, nctb,
        [oy64, ou32, ov32, me[(0, 64)], me[(1, 64)], me32z[0], me32z[1],
         me16z[0], me16z[1], m32z, ic32z, m16z, ic16z, split64, split32,
         qpb, qp_c, lam])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    dwave = jnp.arange(sched["n_waves"], dtype=jnp.int32)
    xs = (oy_w, ou_w, ov_w, me64_0w, me64_1w, me32_0w, me32_1w, me16_0w,
          me16_1w, im32_w, ic32_w, im16_w, ic16_w, s64_w, s32_w, qp_w,
          qpc_w, lam_w, dwave, fl_w, fa_w, ftr_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    BIG = jnp.float32(1e30)

    def wave(carry, x):
        (ry, ru, rv, mvb_ring, mvr_ring, pfb_ring, pfr_ring) = carry
        (oyw, ouw, ovw, me64_0, me64_1, me32_0, me32_1, me16_0, me16_1,
         im32, ic32, im16, ic16, s64, s32, qpw, qpcw, lamw, dw, fl, fa,
         ftr) = x
        lamf = lamw.astype(jnp.float32)
        fal = fl & fa
        fls = jnp.zeros_like(fl)
        flags = {"fl": fl, "fa": fa, "ftr": ftr, "fal": fal}

        win0 = strip_window_slice(strips[(0, "y")], dw, S, SEARCH_RANGE)
        win1 = strip_window_slice(strips[(1, "y")], dw, S, SEARCH_RANGE)
        winc = {}
        for li in (0, 1):
            winc[(li, "u")] = strip_window_slice(
                strips[(li, "u")], dw, S // 2, SEARCH_RANGE, chroma=True)
            winc[(li, "v")] = strip_window_slice(
                strips[(li, "v")], dw, S // 2, SEARCH_RANGE, chroma=True)

        ringsY = {"Lcol": ry[1][0], "Trow": shift1(ry[0][1]),
                  "TRrow": shift1(ry[0][0]),
                  "Cpix": shift1(ry[0][2])[:, S - 1 : S]}
        ringsU = {"Lcol": ru[1][0], "Trow": shift1(ru[0][1]),
                  "TRrow": shift1(ru[0][0]),
                  "Cpix": shift1(ru[0][2])[:, S // 2 - 1 : S // 2]}
        ringsV = {"Lcol": rv[1][0], "Trow": shift1(rv[0][1]),
                  "TRrow": shift1(rv[0][0]),
                  "Cpix": shift1(rv[0][2])[:, S // 2 - 1 : S // 2]}

        # motion cell rings: full dual-list state (4 cells per CTB edge)
        L_mv, L_pf = mvr_ring[0], pfr_ring[0]
        T_mv, T_pf = shift1(mvb_ring[1]), shift1(pfb_ring[1])
        TR_mv, TR_pf = shift1(mvb_ring[0]), shift1(pfb_ring[0])
        AL_mv = shift1(mvb_ring[2])[:, 3]
        AL_pf = shift1(pfb_ring[2])[:, 3]
        zmv2 = jnp.zeros((lanes, 2, 2), jnp.int32)
        zpf = jnp.zeros((lanes, 2), jnp.int32)

        def mcell(mcv, pcv, x, yy, zcur):
            """(avail, pf (L,2), mv (L,2,2)) for the motion cell containing
            pixel (x, yy); z-scan availability (6.4.1).  avail includes the
            inter test (any pred flag)."""
            if yy >= 64 or (x >= 64 and yy >= 0):
                return fls, zpf, zmv2
            if x < 0 and yy < 0:
                pf = AL_pf
                return fal & ((pf[:, 0] | pf[:, 1]) != 0), pf, AL_mv
            if x < 0:
                pf = L_pf[:, yy >> 4]
                return (fl & ((pf[:, 0] | pf[:, 1]) != 0), pf,
                        L_mv[:, yy >> 4])
            if yy < 0:
                if x < 64:
                    pf = T_pf[:, x >> 4]
                    return (fa & ((pf[:, 0] | pf[:, 1]) != 0), pf,
                            T_mv[:, x >> 4])
                pf = TR_pf[:, (x - 64) >> 4]
                return (ftr & ((pf[:, 0] | pf[:, 1]) != 0), pf,
                        TR_mv[:, (x - 64) >> 4])
            if _z(x, yy) < zcur:
                pf = pcv[:, yy >> 4, x >> 4]
                return ((pf[:, 0] | pf[:, 1]) != 0, pf,
                        mcv[:, yy >> 4, x >> 4])
            return fls, zpf, zmv2

        def unit_lists(mcv, pcv, x0, y0, n):
            zcur = _z(x0, y0)
            mc = lambda x, yy: mcell(mcv, pcv, x, yy, zcur)
            a1 = mc(x0 - 1, y0 + n - 1)
            b1 = mc(x0 + n - 1, y0 - 1)
            b0 = mc(x0 + n, y0 - 1)
            a0 = mc(x0 - 1, y0 + n)
            b2 = mc(x0 - 1, y0 - 1)
            cands = {"a1": a1, "b1": b1, "b0": b0, "a0": a0, "b2": b2}
            merge = _merge_list_cells_b(cands, K)
            a_nbs = [a0, a1]
            b_nbs = [b0, b1, b2]
            mvp_l0 = _amvp_cells_b(a_nbs, b_nbs, 0, tb0, tb1)
            mvp_l1 = _amvp_cells_b(a_nbs, b_nbs, 1, tb1, tb0)
            return merge, mvp_l0, mvp_l1

        def set_cells(mcv, pcv, x0, y0, n, mv, pf, is_inter):
            cs = slice(y0 >> 4, (y0 + n) >> 4), slice(x0 >> 4, (x0 + n) >> 4)
            pf_st = pf * is_inter.astype(jnp.int32)[:, None]
            mv_st = mv * pf_st[:, :, None]
            mcv = mcv.at[:, cs[0], cs[1]].set(
                jnp.broadcast_to(mv_st[:, None, None],
                                 (lanes, n >> 4, n >> 4, 2, 2)))
            pcv = pcv.at[:, cs[0], cs[1]].set(
                jnp.broadcast_to(pf_st[:, None, None],
                                 (lanes, n >> 4, n >> 4, 2)))
            return mcv, pcv

        def intra_pred(canvas, rings, x0, y0, log2u, sel_idx, is_luma, Sc):
            n = 1 << log2u
            spec = _seg_spec(x0, y0, n, Sc)
            a = _unit_walk(canvas, rings, spec, n, flags)
            preds = ck.predict_modes_subset_flat(a, log2u, is_luma,
                                                 P_PREPASS_MODES)
            return jnp.take_along_axis(preds, sel_idx[:, None, None], 1)[:, 0]

        def chroma_pred_inter(winu, winv, mv, pf, xc, yc, m):
            """Dual-list chroma MC + bi/uni combine at (xc, yc, m) — one
            batched MC over [U-L0, V-L0, U-L1, V-L1] (bit-identical to
            four calls; MC is per-row independent)."""
            slc = lambda w: jax.lax.slice(
                w, (0, yc, xc), (lanes, yc + m + SEARCH_RANGE + 3,
                                 xc + m + SEARCH_RANGE + 3))
            winb = jnp.concatenate([slc(winu[0]), slc(winv[0]),
                                    slc(winu[1]), slc(winv[1])], 0)
            mvb = jnp.concatenate([jnp.tile(mv[:, 0], (2, 1)),
                                   jnp.tile(mv[:, 1], (2, 1))], 0)
            c = mc_chroma_window_batch_14bit(winb, mvb, m, SEARCH_RANGE)
            c0, c1 = c[: 2 * lanes], c[2 * lanes :]  # each [U; V]
            bt = jnp.tile((pf[:, 0] & pf[:, 1]) != 0, 2)[:, None, None]
            u0 = jnp.tile(pf[:, 0] != 0, 2)[:, None, None]
            out = jnp.where(bt, bi_round(c0, c1),
                            jnp.where(u0, uni_round(c0),
                                      uni_round(c1))).reshape(2 * lanes, -1)
            return out[:lanes], out[lanes:]

        winu_pair = (winc[(0, "u")], winc[(1, "u")])
        winv_pair = (winc[(0, "v")], winc[(1, "v")])

        def code_b_unit(cY, cU, cV, mcv, pcv, x0, y0, log2u, imode, icost,
                        me0u, me1u):
            n = 1 << log2u
            oyf = oyw[:, y0 : y0 + n, x0 : x0 + n].reshape(lanes, -1)
            sl = lambda w: jax.lax.slice(
                w, (0, y0, x0),
                (lanes, y0 + n + 2 * SEARCH_RANGE + 7,
                 x0 + n + 2 * SEARCH_RANGE + 7))
            merge, mvp_l0, mvp_l1 = unit_lists(mcv, pcv, x0, y0, n)
            arb = _arbitrate_b(ck, oyf, log2u, sl(win0), sl(win1), merge,
                               me0u, me1u, mvp_l0, mvp_l1, icost, lamf, K)
            isel = jnp.asarray(_PPM_INV)[imode]
            pred_i = intra_pred(cY, ringsY, x0, y0, log2u, isel, True, S)
            pred_y = jnp.where(arb["use_intra"][:, None], pred_i,
                               arb["pred_inter"])
            lev, rec = _code_flat_mode(ck, oyf, pred_y, qpw, log2u,
                                       arb["use_intra"], lamf * lamf, rdoq)
            cY = cY.at[:, y0 : y0 + n, x0 : x0 + n].set(
                rec.reshape(lanes, n, n))
            xc, yc, m = x0 >> 1, y0 >> 1, n >> 1
            pc_u, pc_v = chroma_pred_inter(winu_pair, winv_pair, arb["mv"],
                                           arb["pf"], xc, yc, m)
            # U and V batched through one TQR chain (bit-identical)
            ocf2 = jnp.concatenate(
                [ouw[:, yc : yc + m, xc : xc + m].reshape(lanes, -1),
                 ovw[:, yc : yc + m, xc : xc + m].reshape(lanes, -1)], 0)
            pred_ic2 = jnp.concatenate(
                [intra_pred(cU, ringsU, xc, yc, log2u - 1, isel, False,
                            S // 2),
                 intra_pred(cV, ringsV, xc, yc, log2u - 1, isel, False,
                            S // 2)], 0).reshape(2 * lanes, -1)
            ui2 = jnp.tile(arb["use_intra"], 2)
            pred_c2 = jnp.where(ui2[:, None], pred_ic2,
                                jnp.concatenate([pc_u, pc_v], 0))
            lc2, rc2 = _code_flat_mode(ck, ocf2, pred_c2,
                                       jnp.tile(qpcw, 2), log2u - 1, ui2,
                                       jnp.tile(lamf * lamf, 2), rdoq)
            lev_c = [lc2[:lanes], lc2[lanes:]]
            cU = cU.at[:, yc : yc + m, xc : xc + m].set(
                rc2[:lanes].reshape(lanes, m, m))
            cV = cV.at[:, yc : yc + m, xc : xc + m].set(
                rc2[lanes:].reshape(lanes, m, m))
            zero = (jnp.all(lev == 0, axis=-1)
                    & jnp.all(lev_c[0] == 0, axis=-1)
                    & jnp.all(lev_c[1] == 0, axis=-1))
            ct = jnp.where(
                arb["use_intra"], CT_INTRA,
                jnp.where(arb["is_merge"],
                          jnp.where(zero, CT_SKIP, CT_MERGE),
                          CT_AMVP)).astype(jnp.int32)
            mcv, pcv = set_cells(mcv, pcv, x0, y0, n, arb["mv"], arb["pf"],
                                 ct != CT_INTRA)
            return (cY, cU, cV, mcv, pcv,
                    dict(ct=ct, pf=arb["pf"], mv=arb["mv"],
                         dir=arb["inter_dir"], mi=arb["merge_idx"],
                         mf=arb["mvp_flag"], mvd=arb["mvd"], imode=imode,
                         lev=lev, levu=lev_c[0], levv=lev_c[1]))

        # ---------- split path (z-order)
        cY = jnp.zeros((lanes, S, S), jnp.int32)
        cU = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        cV = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        mcv = jnp.zeros((lanes, 4, 4, 2, 2), jnp.int32)
        pcv = jnp.zeros((lanes, 4, 4, 2), jnp.int32)
        d32, d16 = [], []
        lev_q, levu_q, levv_q = [], [], []
        for q32, (dy3, dx3) in enumerate(_ZO):
            X, Y = dx3 * 32, dy3 * 32
            sel = (s32[:, q32] != 0)
            (cY_l, cU_l, cV_l, mcv_l, pcv_l, dec32) = code_b_unit(
                cY, cU, cV, mcv, pcv, X, Y, 5, im32[:, q32], ic32[:, q32],
                me32_0[:, q32], me32_1[:, q32])
            c16Y, c16U, c16V, m16cv, p16cv = cY, cU, cV, mcv, pcv
            dec16s, l16, l16u, l16v = [], [], [], []
            for q16, (dy, dx) in enumerate(_ZO):
                xq, yq = X + dx * 16, Y + dy * 16
                (c16Y, c16U, c16V, m16cv, p16cv, dq) = code_b_unit(
                    c16Y, c16U, c16V, m16cv, p16cv, xq, yq, 4,
                    im16[:, q32, q16], ic16[:, q32, q16],
                    me16_0[:, q32, q16], me16_1[:, q32, q16])
                dec16s.append(dq)
                l16.append(dq["lev"])
                l16u.append(dq["levu"])
                l16v.append(dq["levv"])
            sel3 = sel[:, None, None]
            sel2 = sel[:, None]
            pick3 = lambda a, b: jnp.where(sel3, a, b)
            cY = pick3(c16Y, cY_l)
            cU = pick3(c16U, cU_l)
            cV = pick3(c16V, cV_l)
            mcv = jnp.where(sel[:, None, None, None, None], m16cv, mcv_l)
            pcv = jnp.where(sel[:, None, None, None], p16cv, pcv_l)
            d32.append(dec32)
            d16.append(dec16s)
            lev_q.append(jnp.where(sel2, jnp.concatenate(l16, 1),
                                   dec32["lev"]))
            levu_q.append(jnp.where(sel2, jnp.concatenate(l16u, 1),
                                    dec32["levu"]))
            levv_q.append(jnp.where(sel2, jnp.concatenate(l16v, 1),
                                    dec32["levv"]))

        # ---------- CU64 leaf (inter-only: merge/L0/L1/BI, 4x TU32)
        merge64, mvp0_64, mvp1_64 = unit_lists(
            jnp.zeros((lanes, 4, 4, 2, 2), jnp.int32),
            jnp.zeros((lanes, 4, 4, 2), jnp.int32), 0, 0, 64)
        oy64f = oyw.reshape(lanes, -1)
        arb64 = _arbitrate_b(ck, oy64f, 6, win0, win1, merge64, me64_0,
                             me64_1, mvp0_64, mvp1_64,
                             jnp.broadcast_to(BIG, (lanes,)), lamf, K)
        # MC the full 64x64 ONCE per list (translation-invariant
        # interpolation: slicing == per-TU32 MC), combine bi/uni once,
        # then run the four forced TU32s (and all 8 chroma TU16s) as ONE
        # batched TQR each — bit-identical, 8 luma + 16 chroma MC/TQR
        # chains collapse to 1 MC + 1 TQR per component class
        fls_b = jnp.zeros((lanes,), bool)
        both64 = ((arb64["pf"][:, 0] & arb64["pf"][:, 1]) != 0)[:, None, None]
        use0_64 = (arb64["pf"][:, 0] != 0)[:, None, None]
        p64 = mc_luma_window_batch_14bit(
            jnp.concatenate([win0, win1], 0),
            jnp.concatenate([arb64["mv"][:, 0], arb64["mv"][:, 1]], 0),
            S, SEARCH_RANGE)
        pred64 = jnp.where(both64, bi_round(p64[:lanes], p64[lanes:]),
                           jnp.where(use0_64, uni_round(p64[:lanes]),
                                     uni_round(p64[lanes:])))
        pc_u64, pc_v64 = chroma_pred_inter(winu_pair, winv_pair,
                                           arb64["mv"], arb64["pf"],
                                           0, 0, S // 2)
        pc64 = jnp.concatenate([pc_u64.reshape(lanes, S // 2, S // 2),
                                pc_v64.reshape(lanes, S // 2, S // 2)], 0)

        def quads(a, h):  # (B, 2h, 2h) -> (4B, h, h) z-order-major
            return jnp.concatenate(
                [a[:, dy * h : dy * h + h, dx * h : dx * h + h]
                 for dy, dx in _ZO], 0)

        oy4 = quads(oyw, 32).reshape(4 * lanes, -1)
        p4 = quads(pred64, 32).reshape(4 * lanes, -1)
        lv4, rc4 = _code_flat_mode(ck, oy4, p4, jnp.tile(qpw, 4), 5,
                                   jnp.tile(fls_b, 4),
                                   jnp.tile(lamf * lamf, 4), rdoq)
        lev64 = [lv4[j * lanes : (j + 1) * lanes] for j in range(4)]
        rec64 = jnp.zeros((lanes, S, S), jnp.int32)
        for j, (dy3, dx3) in enumerate(_ZO):
            rec64 = rec64.at[:, dy3 * 32 : dy3 * 32 + 32,
                             dx3 * 32 : dx3 * 32 + 32].set(
                rc4[j * lanes : (j + 1) * lanes].reshape(lanes, 32, 32))
        oc8 = quads(jnp.concatenate([ouw, ovw], 0), 16).reshape(
            8 * lanes, -1)
        pc8 = quads(pc64, 16).reshape(8 * lanes, -1)
        lc8, rcc8 = _code_flat_mode(ck, oc8, pc8, jnp.tile(qpcw, 8), 4,
                                    jnp.tile(fls_b, 8),
                                    jnp.tile(lamf * lamf, 8), rdoq)
        levu64 = [lc8[(2 * j) * lanes : (2 * j + 1) * lanes]
                  for j in range(4)]
        levv64 = [lc8[(2 * j + 1) * lanes : (2 * j + 2) * lanes]
                  for j in range(4)]
        rec64u = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        rec64v = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        for j, (dy3, dx3) in enumerate(_ZO):
            yc, xc = dy3 * 16, dx3 * 16
            rec64u = rec64u.at[:, yc : yc + 16, xc : xc + 16].set(
                rcc8[(2 * j) * lanes : (2 * j + 1) * lanes].reshape(
                    lanes, 16, 16))
            rec64v = rec64v.at[:, yc : yc + 16, xc : xc + 16].set(
                rcc8[(2 * j + 1) * lanes : (2 * j + 2) * lanes].reshape(
                    lanes, 16, 16))
        zero64 = jnp.all(
            jnp.concatenate(lev64 + levu64 + levv64, axis=1) == 0, axis=-1)
        ct64 = jnp.where(arb64["is_merge"],
                         jnp.where(zero64, CT_SKIP, CT_MERGE),
                         CT_AMVP).astype(jnp.int32)

        # ---------- select by split64
        sb = (s64 != 0)
        sb2, sb3 = sb[:, None], sb[:, None, None]
        rec_y = jnp.where(sb3, cY, rec64)
        rec_u = jnp.where(sb3, cU, rec64u)
        rec_v = jnp.where(sb3, cV, rec64v)
        lev_y = jnp.where(sb2, jnp.concatenate(lev_q, 1),
                          jnp.concatenate(lev64, 1))
        lev_cb = jnp.where(sb2, jnp.concatenate(levu_q, 1),
                           jnp.concatenate(levu64, 1))
        lev_cr = jnp.where(sb2, jnp.concatenate(levv_q, 1),
                           jnp.concatenate(levv64, 1))
        pf64_st = arb64["pf"]
        mv64_st = arb64["mv"] * pf64_st[:, :, None]
        mcv_out = jnp.where(
            sb[:, None, None, None, None], mcv,
            jnp.broadcast_to(mv64_st[:, None, None], (lanes, 4, 4, 2, 2)))
        pcv_out = jnp.where(
            sb[:, None, None, None], pcv,
            jnp.broadcast_to(pf64_st[:, None, None], (lanes, 4, 4, 2)))

        ry = _ring_push(ry, rec_y[:, S - 1, :], rec_y[:, :, S - 1])
        ru = _ring_push(ru, rec_u[:, S // 2 - 1, :], rec_u[:, :, S // 2 - 1])
        rv = _ring_push(rv, rec_v[:, S // 2 - 1, :], rec_v[:, :, S // 2 - 1])
        push = lambda ring, val: jnp.concatenate([val[None], ring[:2]], axis=0)
        mvb_ring = push(mvb_ring, mcv_out[:, 3, :])
        mvr_ring = push(mvr_ring, mcv_out[:, :, 3])
        pfb_ring = push(pfb_ring, pcv_out[:, 3, :])
        pfr_ring = push(pfr_ring, pcv_out[:, :, 3])

        stack32 = lambda key: jnp.stack([d[key] for d in d32], 1)
        stack16 = lambda key: jnp.stack(
            [jnp.stack([d16[q][z][key] for z in range(4)], 1)
             for q in range(4)], 1)
        out = (ct64, pf64_st, arb64["inter_dir"], mv64_st,
               arb64["merge_idx"], arb64["mvp_flag"], arb64["mvd"],
               stack32("ct"), stack32("pf"), stack32("dir"), stack32("mv"),
               stack32("mi"), stack32("mf"), stack32("mvd"),
               stack16("ct"), stack16("pf"), stack16("dir"), stack16("mv"),
               stack16("mi"), stack16("mf"), stack16("mvd"),
               lev_y.astype(jnp.int16), lev_cb.astype(jnp.int16),
               lev_cr.astype(jnp.int16), rec_y.astype(jnp.uint8),
               rec_u.astype(jnp.uint8), rec_v.astype(jnp.uint8))
        return (ry, ru, rv, mvb_ring, mvr_ring, pfb_ring, pfr_ring), out

    carry0 = (ring0(S), ring0(S // 2), ring0(S // 2),
              jnp.zeros((3, lanes, 4, 2, 2), jnp.int32),
              jnp.zeros((3, lanes, 4, 2, 2), jnp.int32),
              jnp.zeros((3, lanes, 4, 2), jnp.int32),
              jnp.zeros((3, lanes, 4, 2), jnp.int32))
    _, outs = jax.lax.scan(wave, carry0, xs, unroll=QUAD_UNROLL)
    (ct64_w, pf64_w, dir64_w, mv64_w, mi64_w, mf64_w, mvd64_w,
     ct32_w, pf32_w, dir32_w, mv32_w, mi32_w, mf32_w, mvd32_w,
     ct16_w, pf16_w, dir16_w, mv16_w, mi16_w, mf16_w, mvd16_w,
     lev_y_w, lev_cb_w, lev_cr_w, rec_y_w, rec_u_w, rec_v_w) = outs

    w2r = lambda o: wave_to_raster(sched, o)
    m = S // 2
    rec_y = w2r(rec_y_w).reshape(nctb, S, S).astype(jnp.int32)
    rec_u = w2r(rec_u_w).reshape(nctb, m, m).astype(jnp.int32)
    rec_v = w2r(rec_v_w).reshape(nctb, m, m).astype(jnp.int32)
    return {
        "split64": split64,
        "split32": split32,
        "imode32": m32z,
        "imode16": m16z,
        "ct64": w2r(ct64_w), "pf64": w2r(pf64_w), "dir64": w2r(dir64_w),
        "mv64": w2r(mv64_w), "merge_idx64": w2r(mi64_w),
        "mvp_flag64": w2r(mf64_w), "mvd64": w2r(mvd64_w),
        "ct32": w2r(ct32_w), "pf32": w2r(pf32_w), "dir32": w2r(dir32_w),
        "mv32": w2r(mv32_w), "merge_idx32": w2r(mi32_w),
        "mvp_flag32": w2r(mf32_w), "mvd32": w2r(mvd32_w),
        "ct16": w2r(ct16_w), "pf16": w2r(pf16_w), "dir16": w2r(dir16_w),
        "mv16": w2r(mv16_w), "merge_idx16": w2r(mi16_w),
        "mvp_flag16": w2r(mf16_w), "mvd16": w2r(mvd16_w),
        "lev_y": w2r(lev_y_w),
        "lev_cb": w2r(lev_cb_w),
        "lev_cr": w2r(lev_cr_w),
        "recon_y": from_blocks(rec_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(rec_u, height // 2,
                               width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(rec_v, height // 2,
                               width // 2).astype(jnp.uint8),
    }


def quad_b64_trees_from_device(out, width: int, height: int):
    """Nested cu32-format trees (size 64) from the CTB64 B device outputs.

    Inter leaves carry full dual-list motion: ctype, pf (2,), inter_dir,
    mv (2, 2), merge_idx, mvp_flag (2,), mvd (2, 2)."""
    cw, ch = width // 64, height // 64
    nctb = cw * ch
    s64 = np.asarray(out["split64"]).reshape(-1)
    s32 = np.asarray(out["split32"]).reshape(nctb, 4)
    keys = ("imode32", "imode16",
            "ct64", "pf64", "dir64", "mv64", "merge_idx64", "mvp_flag64",
            "mvd64",
            "ct32", "pf32", "dir32", "mv32", "merge_idx32", "mvp_flag32",
            "mvd32",
            "ct16", "pf16", "dir16", "mv16", "merge_idx16", "mvp_flag16",
            "mvd16")
    d = {k: np.asarray(out[k]) for k in keys}
    from .frame_intra64 import fetch_levels_i32

    lev_y, lev_cb, lev_cr = fetch_levels_i32(out)
    lev_y = lev_y.reshape(nctb, 4, 1024)
    lev_cb = lev_cb.reshape(nctb, 4, 256)
    lev_cr = lev_cr.reshape(nctb, 4, 256)

    def leaf(sz, ct, mode, pf, dr, mv, mi, mf, mvd, ly, lb, lr):
        if ct == 0:
            return dict(size=sz, part=0, modes=[int(mode)], lev_y=ly,
                        lev_cb=lb, lev_cr=lr)
        return dict(size=sz, ctype=int(ct),
                    pf=(int(pf[0]), int(pf[1])), inter_dir=int(dr),
                    mv=tuple(tuple(int(x) for x in mv[l]) for l in range(2)),
                    merge_idx=int(mi),
                    mvp_flag=(int(mf[0]), int(mf[1])),
                    mvd=tuple(tuple(int(x) for x in mvd[l]) for l in range(2)),
                    lev_y=ly, lev_cb=lb, lev_cr=lr)

    trees = []
    for i in range(nctb):
        if not s64[i]:
            ly = np.zeros((64, 64), np.int32)
            lb = np.zeros((32, 32), np.int32)
            lr = np.zeros((32, 32), np.int32)
            for q, (dy, dx) in enumerate(_ZO):
                ly[dy * 32 : dy * 32 + 32, dx * 32 : dx * 32 + 32] = \
                    lev_y[i, q].reshape(32, 32)
                lb[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16] = \
                    lev_cb[i, q].reshape(16, 16)
                lr[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16] = \
                    lev_cr[i, q].reshape(16, 16)
            trees.append(leaf(64, d["ct64"][i], 0, d["pf64"][i],
                              d["dir64"][i], d["mv64"][i],
                              d["merge_idx64"][i], d["mvp_flag64"][i],
                              d["mvd64"][i], ly, lb, lr))
            continue
        sub32 = []
        for q, _ in enumerate(_ZO):
            if s32[i, q]:
                ly = lev_y[i, q].reshape(4, 16, 16)
                lb = lev_cb[i, q].reshape(4, 8, 8)
                lr = lev_cr[i, q].reshape(4, 8, 8)
                sub32.append(dict(size=32, split=[
                    leaf(16, d["ct16"][i, q, z], d["imode16"][i, q, z],
                         d["pf16"][i, q, z], d["dir16"][i, q, z],
                         d["mv16"][i, q, z], d["merge_idx16"][i, q, z],
                         d["mvp_flag16"][i, q, z], d["mvd16"][i, q, z],
                         ly[z], lb[z], lr[z])
                    for z in range(4)
                ]))
            else:
                sub32.append(
                    leaf(32, d["ct32"][i, q], d["imode32"][i, q],
                         d["pf32"][i, q], d["dir32"][i, q],
                         d["mv32"][i, q], d["merge_idx32"][i, q],
                         d["mvp_flag32"][i, q], d["mvd32"][i, q],
                         lev_y[i, q].reshape(32, 32),
                         lev_cb[i, q].reshape(16, 16),
                         lev_cr[i, q].reshape(16, 16)))
        trees.append(dict(size=64, split=sub32))
    return trees


def quad_b_cell_maps(trees, width: int, height: int, ctb: int = 64):
    """(mv4 (h4, w4, 2, 2), pf4 (h4, w4, 2), cbf4) 4x4-cell maps from B
    trees (host mirror of generic_b._commit_b, for quad_b_bs_maps)."""
    from .frame_inter32 import _walk_p_leaves

    h4, w4 = height // 4, width // 4
    mv4 = np.zeros((h4, w4, 2, 2), np.int32)
    pf4 = np.zeros((h4, w4, 2), np.int32)
    cbf4 = np.zeros((h4, w4), np.int32)

    for node, x0, y0, nn in _walk_p_leaves(trees, width, ctb):
        s = slice(y0 >> 2, (y0 + nn) >> 2), slice(x0 >> 2, (x0 + nn) >> 2)
        if "ctype" in node:
            pf4[s] = node["pf"]
            mv4[s] = node["mv"]
            if node["ctype"] != 3:
                if nn == 64:
                    for dy, dx in _ZO:
                        ty = node["lev_y"][dy * 32 : dy * 32 + 32,
                                           dx * 32 : dx * 32 + 32]
                        st = (slice((y0 + dy * 32) >> 2,
                                    (y0 + dy * 32 + 32) >> 2),
                              slice((x0 + dx * 32) >> 2,
                                    (x0 + dx * 32 + 32) >> 2))
                        cbf4[st] = 1 if np.any(ty) else 0
                elif np.any(node["lev_y"]):
                    cbf4[s] = 1
        else:
            cbf4[s] = 1 if np.any(node["lev_y"]) else 0
    return mv4, pf4, cbf4


def quad_b_bs_maps(trees, mv4, pf4, cbf4, width: int, height: int,
                   ctb: int = 64):
    """Deblock boundary strengths for a quad-B picture (8.7.2.4 with two
    lists): differing pred-flag patterns (different refs / MV counts) give
    bS = 1; otherwise per-used-list |MV| >= 4 comparison.  Mirrors
    ops/deblock.compute_bs_b at 4x4-cell granularity."""
    from .frame_inter32 import _walk_p_leaves

    h8, w8 = height // 8, width // 8
    ev = np.zeros((h8, w8), bool)
    eh = np.zeros((h8, w8), bool)

    def mark(x0, y0, nn):
        if x0 % 8 == 0 and x0 // 8 < w8:
            ev[y0 // 8 : -(-(y0 + nn) // 8), x0 // 8] = True
        if y0 % 8 == 0 and y0 // 8 < h8:
            eh[y0 // 8, x0 // 8 : -(-(x0 + nn) // 8)] = True

    for node, x0, y0, nn in _walk_p_leaves(trees, width, ctb):
        if nn == 64 and "ctype" in node:
            for dy, dx in _ZO:
                mark(x0 + dx * 32, y0 + dy * 32, 32)
        else:
            mark(x0, y0, nn)

    intra4 = (pf4[..., 0] | pf4[..., 1]) == 0

    def edge_bs(p4, q4):
        """p4/q4: index tuples selecting the two cell columns/rows."""
        p_i, q_i = intra4[p4], intra4[q4]
        pa, pb = pf4[p4], pf4[q4]
        ma, mb = mv4[p4], mv4[q4]
        diff_refs = np.any(pa != pb, axis=-1)
        used = pa[..., None]
        mv_edge = np.any((np.abs(ma - mb) >= 4) & (used != 0), axis=(-2, -1))
        one = diff_refs | (cbf4[p4] != 0) | (cbf4[q4] != 0) | mv_edge
        return p_i, q_i, one

    bs_v = np.zeros((w8 - 1, 2 * h8), np.int32)
    for e in range(1, w8):
        c4 = 2 * e
        on = np.repeat(ev[:, e], 2)
        p_i, q_i, one = edge_bs((slice(None), c4 - 1), (slice(None), c4))
        bs_v[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
    bs_h = np.zeros((h8 - 1, 2 * w8), np.int32)
    for e in range(1, h8):
        r4 = 2 * e
        on = np.repeat(eh[e, :], 2)
        p_i, q_i, one = edge_bs((r4 - 1, slice(None)), (r4, slice(None)))
        bs_h[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
    return bs_v, bs_h
