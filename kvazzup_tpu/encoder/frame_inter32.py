"""Device-native CTB-32 CU-quadtree low-delay-P encoder.

The inter extension of frame_intra32.py — kvazaar's default inter
operating point re-designed for the TPU (reference config surface:
/root/reference/src/media/processing/kvazaarfilter.cpp:176-276): the
CU32-vs-4xCU16 split and all mode estimates come from dense orig-pixel
prepasses (two motion searches, two intra sweeps), and a ring-carry
wavefront over the 32-grid resolves everything that is truly sequential
— merge/AMVP candidate lists from coded-neighbor motion at 16x16 cell
granularity (spec positions incl. the TL quadrant's A0 below-left from
the left CTB, 8.5.3.2.3), the intra/merge/AMVP/skip arbitration, and
normative reconstruction.  Each wave step codes the CU32 leaf and the
four CU16 leaves (z-order, in-step motion + boundary chaining) and the
pre-decided split flag selects the survivors.

CU types per leaf mirror frame_inter.py: 0 intra, 1 merge, 2 AMVP,
3 skip.  One reference picture, 2Nx2N PUs, TU == CU (max_td_inter 0).
Entropy pairs with entropy/quad.py's P writer; the decode side is the
generic tier (decoder/generic_inter.py), which already parses the full
quadtree inter syntax.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from ..ops.mc import (extract_mc_neighborhoods, mc_chroma_window_batch,
                      mc_luma_window_batch, sheared_ref_strips,
                      strip_window_slice)
from ..ops.me import _mv_bits, motion_search
from .frame_inter import (CT_AMVP, CT_INTRA, CT_MERGE, CT_SKIP,
                          SEARCH_RANGE, REF_PAD, _amvp_list, _amvp_list_t,
                          _first_inter_mv_batch, _mvd_bits)
from .frame_intra import (QUAD_UNROLL, _avail_flags, _code_flat_sel, _mode_bits_table,
                          _orig_boundaries, _ring_boundary, _ring_push,
                          from_blocks, to_blocks, wave_inputs,
                          wave_to_raster, P_PREPASS_MODES)
from .frame_intra32 import _subst_quad
from .wavefront import schedule_r

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))

_PPM_INV = np.zeros(35, np.int32)
for _k, _m in enumerate(P_PREPASS_MODES):
    _PPM_INV[_m] = _k


def _cost_prepass_grid(yp, oyb, qp, lam, *, log2: int, cw: int, ch: int,
                       modes=P_PREPASS_MODES):
    """Orig-boundary intra mode + SATD cost estimate on an n=2^log2 grid
    (intra_cost_prepass generalized over block size)."""
    from ..ops import ctu_kernels as ck

    n = 1 << log2
    nb = cw * ch
    fl, fa, ftr = _avail_flags(cw, ch)
    flj = jnp.asarray(fl.reshape(-1))
    a_raw = _orig_boundaries(yp, n, cw, ch)
    a = intra_ops.substitute_refs_ctb(
        a_raw, flj, jnp.asarray(fa.reshape(-1)), jnp.asarray(ftr.reshape(-1)), n)
    preds = ck.predict_modes_subset_flat(a, log2, True, tuple(modes))
    mode_map = jnp.asarray(np.asarray(modes, np.int32))
    oy_flat = oyb.reshape(nb, n * n)
    satd = ck.satd_flat(preds, oy_flat[:, None, :], log2).astype(jnp.float32)
    sel0 = jnp.argmin(satd, axis=1).astype(jnp.int32)
    mode0 = mode_map[sel0]
    left0 = jnp.roll(mode0.reshape(ch, cw), 1, axis=1).reshape(-1)
    cand_a = jnp.where(flj, left0, 1)
    bits_all = jax.vmap(_mode_bits_table)(cand_a)
    bits = bits_all[:, mode_map]
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (nb,))
    cost = satd + lam[:, None] * bits
    sel = jnp.argmin(cost, axis=1).astype(jnp.int32)
    mode = mode_map[sel]
    best = jnp.take_along_axis(cost, sel[:, None], 1)[:, 0] + lam * 3.0
    return mode, best


def _merge_list_cells(cands, K: int, temporal=None):
    """Spec merge list (8.5.3.2.3) from per-position (avail, mv) pairs in
    order A1, B1, B0, A0, B2 — B2 appended only when fewer than 4 prior
    candidates; pruning pairs per spec; temporal candidate (never pruned)
    appended after B2 when given; zero-MV fill (single reference).

    cands: dict with keys a1, b1, b0, a0, b2 -> (avail (L,), mv (L, 2)).
    Returns list of K (L, 2) candidate MVs (positions beyond list length
    resolve to the zero-fill, matching the decoder's list)."""
    (va1, ma1), (vb1, mb1) = cands["a1"], cands["b1"]
    (vb0, mb0), (va0, ma0) = cands["b0"], cands["a0"]
    (vb2, mb2) = cands["b2"]
    eq = lambda a, b: (a[:, 0] == b[:, 0]) & (a[:, 1] == b[:, 1])
    p_a1 = va1
    p_b1 = vb1 & ~(va1 & eq(mb1, ma1))
    p_b0 = vb0 & ~(vb1 & eq(mb0, mb1))
    p_a0 = va0 & ~(va1 & eq(ma0, ma1))
    i32 = lambda f: f.astype(jnp.int32)
    nfirst4 = i32(p_a1) + i32(p_b1) + i32(p_b0) + i32(p_a0)
    p_b2 = (nfirst4 < 4) & vb2 & ~(va1 & eq(mb2, ma1)) & ~(vb1 & eq(mb2, mb1))
    pos_b1 = i32(p_a1)
    pos_b0 = pos_b1 + i32(p_b1)
    pos_a0 = pos_b0 + i32(p_b0)
    pos_b2 = pos_a0 + i32(p_a0)
    pos_t = pos_b2 + i32(p_b2)
    zero = jnp.zeros_like(ma1)
    out = []
    for k in range(K):
        tail = zero
        if temporal is not None:
            tv, tmv = temporal
            tail = jnp.where((tv & (pos_t == k))[:, None], tmv, zero)
        mvk = jnp.where((p_a1 & (k == 0))[:, None], ma1,
              jnp.where((p_b1 & (pos_b1 == k))[:, None], mb1,
              jnp.where((p_b0 & (pos_b0 == k))[:, None], mb0,
              jnp.where((p_a0 & (pos_a0 == k))[:, None], ma0,
              jnp.where((p_b2 & (pos_b2 == k))[:, None], mb2, tail)))))
        out.append(mvk)
    return out


def _amvp_cells(a_pairs, b_pairs, temporal=None):
    """AMVP (8.5.3.2.7, single reference): A = first inter of the A
    positions, B = first inter of the B positions, then the two-slot
    dedupe/zero-fill list (same collapse as frame_inter._amvp_list — with
    one reference every neighbor is same-POC, so the scaled passes and
    the B->A promotion reduce to exactly this).  With temporal given, the
    collocated MV fills remaining slots (8.5.3.2.6)."""
    va, ma = _first_inter_mv_batch(a_pairs)
    vb, mb = _first_inter_mv_batch(b_pairs)
    if temporal is not None:
        tv, tmv = temporal
        return jax.vmap(_amvp_list_t)(va, ma, vb, mb, tv, tmv)
    return jax.vmap(_amvp_list)(va, ma, vb, mb)


def _arbitrate(ck, oy_flat, log2, win, cand_mvs, memv, mvp0, mvp1, icost,
               lamf, K, mcts=None):
    """Shared intra/merge/AMVP arbitration at one CU size: SATD-cost every
    merge candidate's MC, the ME MV's MC (rate = min over the two MVPs),
    and the prepass intra cost.  Returns the decision bundle.

    mcts: None, or (xpos (L,), left_interior, right_interior, tile_w) —
    kvazaar --mv-constraint frametile semantics: a merge candidate whose
    MC support would cross an interior tile boundary may not be SELECTED
    (the decoder MCs from the full reference picture; the spec merge
    LIST itself is unchanged).  The ME MV is already constrained by
    motion_search's own mv_valid_x masking."""
    n = 1 << log2
    L = oy_flat.shape[0]
    # one batched MC + one batched SATD over [K merge candidates, ME MV]:
    # identical arithmetic to per-candidate calls (MC/SATD are per-row
    # independent), but K+1 dispatch chains collapse to one — the waves
    # are step-latency bound, not FLOP bound
    allmv = jnp.concatenate(list(cand_mvs) + [memv], axis=0)
    winb = jnp.tile(win, (K + 1, 1, 1))
    preds = mc_luma_window_batch(winb, allmv, n, SEARCH_RANGE)
    pflat = preds.reshape((K + 1) * L, -1)
    sats = ck.satd_flat(pflat, jnp.tile(oy_flat, (K + 1, 1)), log2).astype(
        jnp.float32).reshape(K + 1, L)
    idx_bits = jnp.asarray(
        [float(min(k + 1, K - 1)) if K > 1 else 0.0 for k in range(K)],
        jnp.float32)
    costs_s = sats[:K] + lamf[None, :] * (2.0 + idx_bits[:, None])
    if mcts is not None:
        from ..ops.me import mv_valid_x

        xpos, lf, rf, tile_w = mcts
        cand_x = jnp.stack(cand_mvs)[:, :, 0].reshape(-1)  # (K*L,)
        ok = mv_valid_x(cand_x, jnp.tile(xpos, (K,)), n, tile_w, lf, rf)
        ok = jnp.reshape(ok, (K, L)) if not isinstance(ok, bool) else ok
        if ok is not True:
            costs_s = jnp.where(ok, costs_s, jnp.float32(3e18))
    preds_k = pflat.reshape(K + 1, L, -1)
    merge_idx = jnp.argmin(costs_s, axis=0).astype(jnp.int32)
    cost_merge = jnp.take_along_axis(costs_s, merge_idx[None], 0)[0]
    merge_mv = jnp.take_along_axis(jnp.stack(cand_mvs), merge_idx[None, :, None], 0)[0]
    pm_flat = jnp.take_along_axis(preds_k[:K], merge_idx[None, :, None], 0)[0]

    pred_me = preds_k[K]
    cost_sat = sats[K]
    mvd0 = memv - mvp0
    mvd1 = memv - mvp1
    bits0 = jax.vmap(_mvd_bits)(mvd0)
    bits1 = jax.vmap(_mvd_bits)(mvd1)
    use_mvp1 = bits1 < bits0
    mvp_flag = use_mvp1.astype(jnp.int32)
    mvd = jnp.where(use_mvp1[:, None], mvd1, mvd0)
    cost_me = cost_sat + lamf * (jnp.minimum(bits0, bits1) + 3.0)

    is_merge = cost_merge <= cost_me
    mv_sel = jnp.where(is_merge[:, None], merge_mv, memv)
    pred_inter = jnp.where(is_merge[:, None], pm_flat,
                           pred_me.reshape(L, -1).astype(jnp.int32))
    use_intra = icost < jnp.minimum(cost_merge, cost_me)
    return dict(use_intra=use_intra, is_merge=is_merge, mv=mv_sel,
                pred_inter=pred_inter, merge_idx=merge_idx,
                mvp_flag=mvp_flag, mvd=mvd)


def _code_flat_mode(ck, orig, pred, q, log2, use_intra, lam2=None,
                    rdoq=False):
    """TQR with the mode-dependent quantizer deadzone (intra 171/512,
    inter 85/512) riding as a traced per-lane flag — one quant pass.
    rdoq (static): per-coefficient RD level choice (ops/quant RDOQ-lite),
    lam2 = per-lane lambda^2."""
    from ..ops.quant import quantize_rdoq

    coef = ck.fwd_transform_flat(orig - pred, log2)
    if rdoq:
        lev = quantize_rdoq(coef, q, log2, lam2, use_intra)
    else:
        lev = quantize(coef, q, log2, use_intra)
    deq = dequantize(lev, q, log2)
    rec = jnp.clip(pred + ck.inv_transform_flat(deq, log2), 0, 255)
    return lev, rec


@functools.partial(jax.jit, static_argnames=("width", "height", "merge_cand",
                                              "tmvp", "rdoq"))
def encode_frame_p32_fast(y, u, v, ref_y, ref_u, ref_v, qp, *, width: int,
                          height: int, merge_cand: int = 1,
                          tmvp: bool = False, col_mv=None, col_inter=None,
                          rdoq: bool = False):
    """Dense-decision CTB32 quadtree P encode (ring-carry 32-wave).

    tmvp: temporal merge/AMVP candidates (8.5.3.2.8) from the collocated
    picture's motion, supplied as col_mv (h/16*w/16, 2) + col_inter
    (h/16*w/16,) on the raster 16-grid — the spec's 16x16-compressed
    motion store.  Low-delay single-reference: all POC distances are 1,
    so the 8.5.3.2.8 scaling is the identity."""
    from ..core.tables import CHROMA_QP_TABLE
    from ..ops import ctu_kernels as ck

    n = 32
    cw, ch = width // n, height // n
    nctb = cw * ch
    K = merge_cand
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]

    qp = jnp.asarray(qp, jnp.int32)
    qpb = jnp.broadcast_to(qp, (nctb,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qpb, 0, 57)]
    lam = jnp.sqrt(0.57 * 2.0 ** ((qpb.astype(jnp.float32) - 12.0) / 3.0))
    yi = y.astype(jnp.int32)
    oy32 = to_blocks(yi, n)
    ou16 = to_blocks(u.astype(jnp.int32), n // 2)
    ov16 = to_blocks(v.astype(jnp.int32), n // 2)

    # ---- dense pre-passes
    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    me32, _ = motion_search(y, ref_y, lam_x1k, block=32,
                            search_range=SEARCH_RANGE, width=width,
                            height=height)
    me16, _ = motion_search(y, ref_y, lam_x1k, block=16,
                            search_range=SEARCH_RANGE, width=width,
                            height=height)

    refp_y = jnp.pad(ref_y, REF_PAD, mode="edge")
    refp_u = jnp.pad(ref_u, REF_PAD // 2, mode="edge")
    refp_v = jnp.pad(ref_v, REF_PAD // 2, mode="edge")
    win32_all = extract_mc_neighborhoods(refp_y, n, SEARCH_RANGE, cw, ch, REF_PAD)
    win16_all = extract_mc_neighborhoods(refp_y, 16, SEARCH_RANGE, 2 * cw,
                                         2 * ch, REF_PAD)
    strips_y = sheared_ref_strips(refp_y, n, SEARCH_RANGE, ch, REF_PAD)
    strips_u = sheared_ref_strips(refp_u, n // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)
    strips_v = sheared_ref_strips(refp_v, n // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)

    pme32 = mc_luma_window_batch(win32_all, me32, n, SEARCH_RANGE)
    sat32 = ck.satd_flat(pme32.reshape(nctb, -1), oy32.reshape(nctb, -1),
                         5).astype(jnp.float32)
    oy16 = to_blocks(yi, 16)
    pme16 = mc_luma_window_batch(win16_all, me16, 16, SEARCH_RANGE)
    sat16 = ck.satd_flat(pme16.reshape(4 * nctb, -1), oy16.reshape(4 * nctb, -1),
                         4).astype(jnp.float32)

    # per-block expansion of the CTU grid onto the 16-grid (raster);
    # qp may be scalar or per-CTU (nctb,) — the cu_qp_delta/ROI hook
    rep2 = lambda a: jnp.repeat(
        jnp.repeat(a.reshape(ch, cw), 2, 0), 2, 1).reshape(-1)
    lam16 = rep2(lam)
    imode16, icost16 = _cost_prepass_grid(yi, oy16, rep2(qpb), lam16, log2=4,
                                          cw=2 * cw, ch=2 * ch)
    imode32, icost32 = _cost_prepass_grid(yi, oy32, qpb, lam, log2=5,
                                          cw=cw, ch=ch)

    # ---- split decision (SATD domain, approximate rate for ME)
    lamv = lam
    mebits = lambda mv: jax.vmap(_mv_bits)(mv[:, 0]) + jax.vmap(_mv_bits)(mv[:, 1])
    best32 = jnp.minimum(icost32, sat32 + lamv * (mebits(me32) + 3.0))
    best16 = jnp.minimum(icost16,
                         sat16 + lam16 * (mebits(me16) + 3.0))
    b16 = best16.reshape(2 * ch, 2 * cw)
    quad = lambda a2: jnp.stack(
        [a2[dy::2, dx::2].reshape(-1) for dy, dx in _ZO], axis=1)
    sum16 = jnp.sum(quad(b16), axis=1)
    split = (sum16 + lamv * lamv * 5.0 < best32 + lamv * lamv * 1.0).astype(jnp.int32)

    # per-quadrant z-order gathers of 16-grid prepass data
    g16 = lambda a2: quad(a2.reshape(2 * ch, 2 * cw))
    imode16z = g16(imode16)
    icost16z = g16(icost16)
    me16_2 = me16.reshape(2 * ch, 2 * cw, 2)
    me16z = jnp.stack([me16_2[dy::2, dx::2].reshape(-1, 2) for dy, dx in _ZO],
                      axis=1)  # (nctb, 4, 2)

    # ---- temporal candidate cells (8.5.3.2.8: colBr first — available
    # only inside the picture and the current CTB row — else colCtr; the
    # col store is the 16x16-compressed motion field, so both positions
    # resolve to 16-grid cells)
    if tmvp:
        cmv2 = col_mv.astype(jnp.int32).reshape(2 * ch, 2 * cw, 2)
        cif2 = col_inter.astype(jnp.int32).reshape(2 * ch, 2 * cw)
        zmv = [cmv2[dy::2, dx::2].reshape(nctb, 2) for dy, dx in _ZO]
        zif = [cif2[dy::2, dx::2].reshape(nctb) for dy, dx in _ZO]
        has_r = ((jnp.arange(nctb) % cw) + 1 < cw)
        # right-neighbor CTB's BL cell = the TR quadrant's colBr position
        rz2mv = jnp.roll(zmv[2].reshape(ch, cw, 2), -1, axis=1).reshape(nctb, 2)
        rz2ok = jnp.where(has_r, jnp.roll(zif[2].reshape(ch, cw), -1,
                                          axis=1).reshape(nctb), 0) != 0
        ok3, ok0, ok1, ok2 = (zif[3] != 0), (zif[0] != 0), (zif[1] != 0), (zif[2] != 0)
        pick = lambda c, a, b: jnp.where(c[:, None], a, b)
        t_mv = jnp.stack([
            pick(ok3, zmv[3], zmv[0]),          # TL: BR own z3 -> ctr z0
            pick(rz2ok, rz2mv, zmv[1]),          # TR: BR right z2 -> ctr z1
            zmv[2],                              # BL: ctr z2
            zmv[3],                              # BR: ctr z3
            zmv[3],                              # CU32: ctr z3
        ], axis=1)
        t_ok = jnp.stack([ok3 | ok0, rz2ok | ok1, ok2, ok3, ok3],
                         axis=1).astype(jnp.int32)
    else:
        t_mv = jnp.zeros((nctb, 5, 2), jnp.int32)
        t_ok = jnp.zeros((nctb, 5), jnp.int32)

    # ---- wave inputs over the 32-grid
    (oy_w, ou_w, ov_w, me32_w, me16_w, im32_w, ic32_w, im16_w, ic16_w,
     sp_w, qp_w, qpc_w, lam_w, tmv_w, tok_w) = wave_inputs(
        sched, nctb,
        [oy32, ou16, ov16, me32, me16z, imode32, icost32, imode16z, icost16z,
         split, qpb, qp_c, lam, t_mv, t_ok])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    fal_w = fl_w & fa_w
    dwave = jnp.arange(sched["n_waves"], dtype=jnp.int32)
    xs = (oy_w, ou_w, ov_w, me32_w, me16_w, im32_w, ic32_w, im16_w, ic16_w,
          sp_w, qp_w, qpc_w, lam_w, dwave, fl_w, fa_w, ftr_w, fal_w,
          tmv_w, tok_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    def wave(carry, x):
        (ry, ru, rv, mvb_ring, mvr_ring, ifb_ring, ifr_ring) = carry
        (oyw, ouw, ovw, me32w, me16w, im32, ic32, im16, ic16,
         spl, qpw, qpcw, lamw, dw, fl, fa, ftr, fal, tmvw, tokw) = x
        lamf = lamw.astype(jnp.float32)
        lam2 = lamf * lamf
        tru = jnp.ones_like(fl)
        fls = jnp.zeros_like(fl)
        oy_flat = oyw.reshape(lanes, -1)

        win32 = strip_window_slice(strips_y, dw, n, SEARCH_RANGE)
        winu16 = strip_window_slice(strips_u, dw, n // 2, SEARCH_RANGE,
                                    chroma=True)
        winv16 = strip_window_slice(strips_v, dw, n // 2, SEARCH_RANGE,
                                    chroma=True)

        # --- neighbor motion cells (16-granularity) from the rings
        # rcol slot0 = left CTB: cell 0 rows 0..15, cell 1 rows 16..31
        mvL = mvr_ring[0]                    # (L, 2, 2)
        ifL = ifr_ring[0]                    # (L, 2)
        mvT = shift1(mvb_ring[1])            # above CTB bottom cells
        ifT = shift1(ifb_ring[1])
        mvTR = shift1(mvb_ring[0])           # above-right CTB bottom cells
        ifTR = shift1(ifb_ring[0])
        mvC = shift1(mvb_ring[2])[:, 1]      # above-left corner cell (L, 2)
        ifC = shift1(ifb_ring[2])[:, 1]      # (L,)
        inter = lambda f: f != 0

        # ---------- CU32 decision
        cands32 = {
            "a1": (fl & inter(ifL[:, 1]), mvL[:, 1]),
            "b1": (fa & inter(ifT[:, 1]), mvT[:, 1]),
            "b0": (ftr & inter(ifTR[:, 0]), mvTR[:, 0]),
            "a0": (fls, jnp.zeros_like(mvC)),
            "b2": (fal & inter(ifC), mvC),
        }
        t32 = (tokw[:, 4] != 0, tmvw[:, 4]) if tmvp else None
        merge32 = _merge_list_cells(cands32, K, temporal=t32)
        mvp0_32, mvp1_32 = _amvp_cells(
            [(fls, jnp.zeros_like(mvC)), (fl & inter(ifL[:, 1]), mvL[:, 1])],
            [(ftr & inter(ifTR[:, 0]), mvTR[:, 0]),
             (fa & inter(ifT[:, 1]), mvT[:, 1]),
             (fal & inter(ifC), mvC)], temporal=t32)
        arb32 = _arbitrate(ck, oy_flat, 5, win32, merge32, me32w,
                           mvp0_32, mvp1_32, ic32, lamf, K)

        # CU32 intra prediction (recon boundaries, prepass-subset modes)
        a32 = intra_ops.substitute_refs_ctb(_ring_boundary(*ry, n), fl, fa, ftr, n)
        preds32 = ck.predict_modes_subset_flat(a32, 5, True, P_PREPASS_MODES)
        i32sel = jnp.asarray(_PPM_INV)[im32]
        pred_i32 = jnp.take_along_axis(preds32, i32sel[:, None, None], 1)[:, 0]
        pred_y32 = jnp.where(arb32["use_intra"][:, None], pred_i32,
                             arb32["pred_inter"])
        lev32, rec32 = _code_flat_mode(ck, oy_flat, pred_y32, qpw, 5,
                                       arb32["use_intra"], lam2, rdoq)
        # CU32 chroma (TU16): intra DM or MC at the selected MV
        au = intra_ops.substitute_refs_ctb(_ring_boundary(*ru, 16), fl, fa, ftr, 16)
        av = intra_ops.substitute_refs_ctb(_ring_boundary(*rv, 16), fl, fa, ftr, 16)
        predsu = ck.predict_modes_subset_flat(au, 4, False, P_PREPASS_MODES)
        predsv = ck.predict_modes_subset_flat(av, 4, False, P_PREPASS_MODES)
        pred_iu32 = jnp.take_along_axis(predsu, i32sel[:, None, None], 1)[:, 0]
        pred_iv32 = jnp.take_along_axis(predsv, i32sel[:, None, None], 1)[:, 0]
        pred_mu32 = mc_chroma_window_batch(winu16, arb32["mv"], 16,
                                           SEARCH_RANGE).reshape(lanes, -1)
        pred_mv32 = mc_chroma_window_batch(winv16, arb32["mv"], 16,
                                           SEARCH_RANGE).reshape(lanes, -1)
        ui32 = arb32["use_intra"][:, None]
        levu32, recu32 = _code_flat_mode(
            ck, ouw.reshape(lanes, -1), jnp.where(ui32, pred_iu32, pred_mu32),
            qpcw, 4, arb32["use_intra"], lam2, rdoq)
        levv32, recv32 = _code_flat_mode(
            ck, ovw.reshape(lanes, -1), jnp.where(ui32, pred_iv32, pred_mv32),
            qpcw, 4, arb32["use_intra"], lam2, rdoq)

        # ---------- CU16 quadrants (z-order, in-step chaining)
        Lcol = ry[1][0]
        Trow = shift1(ry[0][1])
        TRrow = shift1(ry[0][0])
        Cpix = shift1(ry[0][2])[:, n - 1 : n]
        LcolU, TrowU = ru[1][0], shift1(ru[0][1])
        TRrowU, CpixU = shift1(ru[0][0]), shift1(ru[0][2])[:, 15:16]
        LcolV, TrowV = rv[1][0], shift1(rv[0][1])
        TRrowV, CpixV = shift1(rv[0][0]), shift1(rv[0][2])[:, 15:16]
        zmv = jnp.zeros((lanes, 2), jnp.int32)
        z16 = jnp.zeros((lanes, 16), jnp.int32)
        z8 = jnp.zeros((lanes, 8), jnp.int32)

        q_ct, q_mv, q_mi, q_mf, q_mvd = [], [], [], [], []
        q_lev, q_rec = [], []
        q_levu, q_recu, q_levv, q_recv = [], [], [], []
        for qi, (dy, dx) in enumerate(_ZO):
            o16f = oyw[:, dy * 16 : dy * 16 + 16,
                       dx * 16 : dx * 16 + 16].reshape(lanes, -1)
            w16 = jax.lax.slice(
                win32, (0, 16 * dy, 16 * dx),
                (lanes, 16 * dy + 55, 16 * dx + 55))
            wu8 = jax.lax.slice(
                winu16, (0, 8 * dy, 8 * dx),
                (lanes, 8 * dy + 27, 8 * dx + 27))
            wv8 = jax.lax.slice(
                winv16, (0, 8 * dy, 8 * dx),
                (lanes, 8 * dy + 27, 8 * dx + 27))
            prev_mv = lambda j: q_mv[j]
            prev_if = lambda j: q_ct[j] != CT_INTRA
            if qi == 0:  # TL
                cands = {
                    "a1": (fl & inter(ifL[:, 0]), mvL[:, 0]),
                    "b1": (fa & inter(ifT[:, 0]), mvT[:, 0]),
                    "b0": (fa & inter(ifT[:, 1]), mvT[:, 1]),
                    "a0": (fl & inter(ifL[:, 1]), mvL[:, 1]),
                    "b2": (fal & inter(ifC), mvC),
                }
                a_pairs = [(fl & inter(ifL[:, 1]), mvL[:, 1]),
                           (fl & inter(ifL[:, 0]), mvL[:, 0])]
                b_pairs = [(fa & inter(ifT[:, 1]), mvT[:, 1]),
                           (fa & inter(ifT[:, 0]), mvT[:, 0]),
                           (fal & inter(ifC), mvC)]
            elif qi == 1:  # TR
                cands = {
                    "a1": (prev_if(0), prev_mv(0)),
                    "b1": (fa & inter(ifT[:, 1]), mvT[:, 1]),
                    "b0": (ftr & inter(ifTR[:, 0]), mvTR[:, 0]),
                    "a0": (fls, zmv),
                    "b2": (fa & inter(ifT[:, 0]), mvT[:, 0]),
                }
                a_pairs = [(fls, zmv), (prev_if(0), prev_mv(0))]
                b_pairs = [(ftr & inter(ifTR[:, 0]), mvTR[:, 0]),
                           (fa & inter(ifT[:, 1]), mvT[:, 1]),
                           (fa & inter(ifT[:, 0]), mvT[:, 0])]
            elif qi == 2:  # BL
                cands = {
                    "a1": (fl & inter(ifL[:, 1]), mvL[:, 1]),
                    "b1": (prev_if(0), prev_mv(0)),
                    "b0": (prev_if(1), prev_mv(1)),
                    "a0": (fls, zmv),
                    "b2": (fl & inter(ifL[:, 0]), mvL[:, 0]),
                }
                a_pairs = [(fls, zmv), (fl & inter(ifL[:, 1]), mvL[:, 1])]
                b_pairs = [(prev_if(1), prev_mv(1)),
                           (prev_if(0), prev_mv(0)),
                           (fl & inter(ifL[:, 0]), mvL[:, 0])]
            else:  # BR
                cands = {
                    "a1": (prev_if(2), prev_mv(2)),
                    "b1": (prev_if(1), prev_mv(1)),
                    "b0": (fls, zmv),
                    "a0": (fls, zmv),
                    "b2": (prev_if(0), prev_mv(0)),
                }
                a_pairs = [(fls, zmv), (prev_if(2), prev_mv(2))]
                b_pairs = [(fls, zmv), (prev_if(1), prev_mv(1)),
                           (prev_if(0), prev_mv(0))]
            tq = (tokw[:, qi] != 0, tmvw[:, qi]) if tmvp else None
            mcands = _merge_list_cells(cands, K, temporal=tq)
            mvp0q, mvp1q = _amvp_cells(a_pairs, b_pairs, temporal=tq)
            arb = _arbitrate(ck, o16f, 4, w16, mcands, me16w[:, qi],
                             mvp0q, mvp1q, ic16[:, qi], lamf, K)

            # intra prediction from true recon boundaries
            if qi == 0:
                walk = _subst_quad(
                    Lcol[:, 16:32][:, ::-1], Lcol[:, 0:16][:, ::-1], Cpix,
                    Trow[:, :16], Trow[:, 16:32], fl, fl, fal, fa, fa)
            elif qi == 1:
                walk = _subst_quad(
                    z16, q_rec[0][:, :, 15][:, ::-1], Trow[:, 15:16],
                    Trow[:, 16:32], TRrow[:, :16], fls, tru, fa, fa, ftr)
            elif qi == 2:
                walk = _subst_quad(
                    z16, Lcol[:, 16:32][:, ::-1], Lcol[:, 15:16],
                    q_rec[0][:, 15, :], q_rec[1][:, 15, :],
                    fls, fl, fl, tru, tru)
            else:
                walk = _subst_quad(
                    z16, q_rec[2][:, :, 15][:, ::-1], q_rec[0][:, 15:16, 15],
                    q_rec[1][:, 15, :], z16, fls, tru, tru, tru, fls)
            preds16 = ck.predict_modes_subset_flat(walk, 4, True, P_PREPASS_MODES)
            iqsel = jnp.asarray(_PPM_INV)[im16[:, qi]]
            pred_iq = jnp.take_along_axis(preds16, iqsel[:, None, None], 1)[:, 0]
            pred_yq = jnp.where(arb["use_intra"][:, None], pred_iq,
                                arb["pred_inter"])
            levq, recq = _code_flat_mode(ck, o16f, pred_yq, qpw, 4,
                                         arb["use_intra"], lam2, rdoq)

            # chroma TU8
            lev_cq, rec_cq = [], []
            for (Lc, Tc, TRc, Cc, oc, rcl, winc) in (
                (LcolU, TrowU, TRrowU, CpixU, ouw, q_recu, wu8),
                (LcolV, TrowV, TRrowV, CpixV, ovw, q_recv, wv8),
            ):
                o8 = oc[:, dy * 8 : dy * 8 + 8, dx * 8 : dx * 8 + 8]
                o8 = o8.reshape(lanes, -1)
                if qi == 0:
                    wk = _subst_quad(
                        Lc[:, 8:16][:, ::-1], Lc[:, 0:8][:, ::-1], Cc,
                        Tc[:, :8], Tc[:, 8:16], fl, fl, fal, fa, fa)
                elif qi == 1:
                    wk = _subst_quad(
                        z8, rcl[0][:, :, 7][:, ::-1], Tc[:, 7:8],
                        Tc[:, 8:16], TRc[:, :8], fls, tru, fa, fa, ftr)
                elif qi == 2:
                    wk = _subst_quad(
                        z8, Lc[:, 8:16][:, ::-1], Lc[:, 7:8],
                        rcl[0][:, 7, :], rcl[1][:, 7, :], fls, fl, fl, tru, tru)
                else:
                    wk = _subst_quad(
                        z8, rcl[2][:, :, 7][:, ::-1], rcl[0][:, 7:8, 7],
                        rcl[1][:, 7, :], z8, fls, tru, tru, tru, fls)
                preds8 = ck.predict_modes_subset_flat(wk, 3, False,
                                                      P_PREPASS_MODES)
                pred_ic = jnp.take_along_axis(preds8, iqsel[:, None, None], 1)[:, 0]
                pred_mc = mc_chroma_window_batch(winc, arb["mv"], 8,
                                                 SEARCH_RANGE).reshape(lanes, -1)
                pred_c = jnp.where(arb["use_intra"][:, None], pred_ic, pred_mc)
                lev_c, rec_c = _code_flat_mode(ck, o8, pred_c, qpcw, 3,
                                               arb["use_intra"], lam2, rdoq)
                lev_cq.append(lev_c)
                rec_cq.append(rec_c.reshape(lanes, 8, 8))

            zero_resid = (jnp.all(levq == 0, axis=-1)
                          & jnp.all(lev_cq[0] == 0, axis=-1)
                          & jnp.all(lev_cq[1] == 0, axis=-1))
            ctq = jnp.where(
                arb["use_intra"], CT_INTRA,
                jnp.where(arb["is_merge"],
                          jnp.where(zero_resid, CT_SKIP, CT_MERGE),
                          CT_AMVP)).astype(jnp.int32)
            q_ct.append(ctq)
            q_mv.append(arb["mv"])
            q_mi.append(arb["merge_idx"])
            q_mf.append(arb["mvp_flag"])
            q_mvd.append(arb["mvd"])
            q_lev.append(levq)
            q_rec.append(recq.reshape(lanes, 16, 16))
            q_levu.append(lev_cq[0])
            q_recu.append(rec_cq[0])
            q_levv.append(lev_cq[1])
            q_recv.append(rec_cq[1])

        # ---------- CU32 skip/type
        zero32 = (jnp.all(lev32 == 0, axis=-1)
                  & jnp.all(levu32 == 0, axis=-1)
                  & jnp.all(levv32 == 0, axis=-1))
        ct32 = jnp.where(
            arb32["use_intra"], CT_INTRA,
            jnp.where(arb32["is_merge"],
                      jnp.where(zero32, CT_SKIP, CT_MERGE),
                      CT_AMVP)).astype(jnp.int32)

        # ---------- select by split
        cat2 = lambda a, b: jnp.concatenate([a, b], axis=2)
        cat1 = lambda a, b: jnp.concatenate([a, b], axis=1)
        rec_split = cat1(cat2(q_rec[0], q_rec[1]), cat2(q_rec[2], q_rec[3]))
        recu_split = cat1(cat2(q_recu[0], q_recu[1]), cat2(q_recu[2], q_recu[3]))
        recv_split = cat1(cat2(q_recv[0], q_recv[1]), cat2(q_recv[2], q_recv[3]))
        sb = (spl != 0)[:, None]
        sb3 = (spl != 0)[:, None, None]
        lev_y = jnp.where(sb, jnp.concatenate(q_lev, axis=1), lev32)
        lev_cb = jnp.where(sb, jnp.concatenate(q_levu, axis=1), levu32)
        lev_cr = jnp.where(sb, jnp.concatenate(q_levv, axis=1), levv32)
        rec_y = jnp.where(sb3, rec_split, rec32.reshape(lanes, n, n))
        rec_u = jnp.where(sb3, recu_split, recu32.reshape(lanes, 16, 16))
        rec_v = jnp.where(sb3, recv_split, recv32.reshape(lanes, 16, 16))

        # motion cells for the rings: rcol = (TR, BR), bot = (BL, BR)
        mv32s = arb32["mv"]
        if32 = (ct32 != CT_INTRA).astype(jnp.int32)
        cell = lambda j: jnp.where(sb, q_mv[j], mv32s)
        fcell = lambda j: jnp.where(
            spl != 0, (q_ct[j] != CT_INTRA).astype(jnp.int32), if32)
        mv_rcol_new = jnp.stack([cell(1), cell(3)], axis=1)
        mv_bot_new = jnp.stack([cell(2), cell(3)], axis=1)
        if_rcol_new = jnp.stack([fcell(1), fcell(3)], axis=1)
        if_bot_new = jnp.stack([fcell(2), fcell(3)], axis=1)

        ry = _ring_push(ry, rec_y[:, n - 1, :], rec_y[:, :, n - 1])
        ru = _ring_push(ru, rec_u[:, 15, :], rec_u[:, :, 15])
        rv = _ring_push(rv, rec_v[:, 15, :], rec_v[:, :, 15])
        push = lambda ring, val: jnp.concatenate([val[None], ring[:2]], axis=0)
        mvb_ring = push(mvb_ring, mv_bot_new)
        mvr_ring = push(mvr_ring, mv_rcol_new)
        ifb_ring = push(ifb_ring, if_bot_new)
        ifr_ring = push(ifr_ring, if_rcol_new)

        out = (ct32, mv32s, arb32["merge_idx"], arb32["mvp_flag"], arb32["mvd"],
               jnp.stack(q_ct, 1), jnp.stack(q_mv, 1), jnp.stack(q_mi, 1),
               jnp.stack(q_mf, 1), jnp.stack(q_mvd, 1),
               lev_y.astype(jnp.int16), lev_cb.astype(jnp.int16),
               lev_cr.astype(jnp.int16), rec_y.astype(jnp.uint8),
               rec_u.astype(jnp.uint8), rec_v.astype(jnp.uint8))
        return (ry, ru, rv, mvb_ring, mvr_ring, ifb_ring, ifr_ring), out

    carry0 = (ring0(n), ring0(16), ring0(16),
              jnp.zeros((3, lanes, 2, 2), jnp.int32),
              jnp.zeros((3, lanes, 2, 2), jnp.int32),
              jnp.zeros((3, lanes, 2), jnp.int32),
              jnp.zeros((3, lanes, 2), jnp.int32))
    _, outs = jax.lax.scan(wave, carry0, xs, unroll=QUAD_UNROLL)
    (ct32_w, mv32_w, mi32_w, mf32_w, mvd32_w, ct16_w, mv16_w, mi16_w, mf16_w,
     mvd16_w, lev_y_w, lev_cb_w, lev_cr_w, rec_y_w, rec_u_w, rec_v_w) = outs

    w2r = lambda o: wave_to_raster(sched, o)
    rec_y = w2r(rec_y_w).reshape(nctb, n, n).astype(jnp.int32)
    rec_u = w2r(rec_u_w).reshape(nctb, 16, 16).astype(jnp.int32)
    rec_v = w2r(rec_v_w).reshape(nctb, 16, 16).astype(jnp.int32)
    return {
        "split": split,
        "imode32": imode32,
        "imode16": imode16z,
        "ct32": w2r(ct32_w),
        "mv32": w2r(mv32_w),
        "merge_idx32": w2r(mi32_w),
        "mvp_flag32": w2r(mf32_w),
        "mvd32": w2r(mvd32_w),
        "ct16": w2r(ct16_w),
        "mv16": w2r(mv16_w),
        "merge_idx16": w2r(mi16_w),
        "mvp_flag16": w2r(mf16_w),
        "mvd16": w2r(mvd16_w),
        "lev_y": w2r(lev_y_w),
        "lev_cb": w2r(lev_cb_w),
        "lev_cr": w2r(lev_cr_w),
        "recon_y": from_blocks(rec_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(rec_u, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(rec_v, height // 2, width // 2).astype(jnp.uint8),
    }


def quad_p_trees_from_device(out, width: int, height: int):
    """cu32-format trees extended with inter leaves: an inter leaf carries
    ctype (1 merge / 2 AMVP / 3 skip), mv, merge_idx, mvp_flag, mvd."""
    cw, ch = width // 32, height // 32
    nctb = cw * ch
    split = np.asarray(out["split"]).reshape(-1)
    d = {k: np.asarray(out[k]) for k in
         ("imode32", "imode16", "ct32", "mv32", "merge_idx32", "mvp_flag32",
          "mvd32", "ct16", "mv16", "merge_idx16", "mvp_flag16", "mvd16")}
    lev_y = np.asarray(out["lev_y"], np.int32).reshape(nctb, -1)
    lev_cb = np.asarray(out["lev_cb"], np.int32).reshape(nctb, -1)
    lev_cr = np.asarray(out["lev_cr"], np.int32).reshape(nctb, -1)

    def leaf(sz, ct, mode, mv, mi, mf, mvd, ly, lb, lr):
        if ct == 0:
            return dict(size=sz, part=0, modes=[int(mode)], lev_y=ly,
                        lev_cb=lb, lev_cr=lr)
        return dict(size=sz, ctype=int(ct), mv=(int(mv[0]), int(mv[1])),
                    merge_idx=int(mi), mvp_flag=int(mf),
                    mvd=(int(mvd[0]), int(mvd[1])), lev_y=ly, lev_cb=lb,
                    lev_cr=lr)

    trees = []
    for i in range(nctb):
        if split[i]:
            ly = lev_y[i].reshape(4, 16, 16)
            lb = lev_cb[i].reshape(4, 8, 8)
            lr = lev_cr[i].reshape(4, 8, 8)
            sub = [
                leaf(16, d["ct16"][i, z], d["imode16"][i, z], d["mv16"][i, z],
                     d["merge_idx16"][i, z], d["mvp_flag16"][i, z],
                     d["mvd16"][i, z], ly[z], lb[z], lr[z])
                for z in range(4)
            ]
            trees.append(dict(size=32, split=sub))
        else:
            trees.append(
                leaf(32, d["ct32"][i], d["imode32"][i], d["mv32"][i],
                     d["merge_idx32"][i], d["mvp_flag32"][i], d["mvd32"][i],
                     lev_y[i].reshape(32, 32), lev_cb[i].reshape(16, 16),
                     lev_cr[i].reshape(16, 16)))
    return trees


def _walk_p_leaves(trees, width: int, ctb: int):
    """(node, x0, y0, n) for every leaf of a (possibly nested) quad-P
    forest on the ctb grid."""
    cw = width // ctb

    def rec(node, x0, y0, nn):
        if "split" in node:
            h = nn >> 1
            for (dy, dx), sub in zip(_ZO, node["split"]):
                yield from rec(sub, x0 + dx * h, y0 + dy * h, h)
        else:
            yield node, x0, y0, nn

    for i, t in enumerate(trees):
        yield from rec(t, (i % cw) * ctb, (i // cw) * ctb, ctb)


def quad_p_bs_maps(trees, mv4, inter4, cbf4, width: int, height: int,
                   ctb: int = 32):
    """Deblock boundary strengths for a quad-P picture, mirroring
    GenericInterDecoder.bs_maps exactly (4x4-cell p/q comparison on the
    8-pel edge grid; single reference so refpoc never differs).  CU64
    inter leaves mark their four forced TU32 edges (the decoder marks
    per-TU, _inter_tt)."""
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

    intra4 = inter4 == 0
    bs_v = np.zeros((w8 - 1, 2 * h8), np.int32)
    for e in range(1, w8):
        c4 = 2 * e
        on = np.repeat(ev[:, e], 2)
        p_i, q_i = intra4[:, c4 - 1], intra4[:, c4]
        mvdiff = np.any(np.abs(mv4[:, c4 - 1] - mv4[:, c4]) >= 4, axis=-1)
        one = (cbf4[:, c4 - 1] | cbf4[:, c4] | mvdiff) > 0
        bs_v[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
    bs_h = np.zeros((h8 - 1, 2 * w8), np.int32)
    for e in range(1, h8):
        r4 = 2 * e
        on = np.repeat(eh[e, :], 2)
        p_i, q_i = intra4[r4 - 1, :], intra4[r4, :]
        mvdiff = np.any(np.abs(mv4[r4 - 1] - mv4[r4]) >= 4, axis=-1)
        one = (cbf4[r4 - 1] | cbf4[r4] | mvdiff) > 0
        bs_h[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
    return bs_v, bs_h


def quad_p_cell_maps(trees, width: int, height: int, ctb: int = 32):
    """(mv4, inter4, cbf4) 4x4-cell maps from the trees (host mirror of
    the decoder's commit loop, for quad_p_bs_maps).  CU64 inter leaves
    set cbf per forced TU32 (the bS rule reads per-TU cbf)."""
    h4, w4 = height // 4, width // 4
    mv4 = np.zeros((h4, w4, 2), np.int32)
    inter4 = np.zeros((h4, w4), np.int32)
    cbf4 = np.zeros((h4, w4), np.int32)

    def commit(node, x0, y0, nn):
        s = slice(y0 >> 2, (y0 + nn) >> 2), slice(x0 >> 2, (x0 + nn) >> 2)
        if "ctype" in node:
            inter4[s] = 1
            mv4[s] = node["mv"]
            if node["ctype"] != 3:
                if nn == 64:
                    for dy, dx in _ZO:
                        ty = node["lev_y"][dy * 32 : dy * 32 + 32,
                                           dx * 32 : dx * 32 + 32]
                        st = (slice((y0 + dy * 32) >> 2, (y0 + dy * 32 + 32) >> 2),
                              slice((x0 + dx * 32) >> 2, (x0 + dx * 32 + 32) >> 2))
                        cbf4[st] = 1 if np.any(ty) else 0
                elif np.any(node["lev_y"]):
                    cbf4[s] = 1
        else:
            cbf4[s] = 1 if np.any(node["lev_y"]) else 0

    for node, x0, y0, nn in _walk_p_leaves(trees, width, ctb):
        commit(node, x0, y0, nn)
    return mv4, inter4, cbf4
