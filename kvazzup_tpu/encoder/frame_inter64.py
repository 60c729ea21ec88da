"""Device-native CTB-64 CU-quadtree low-delay-P encoder (depth 0..2).

kvazaar's DEFAULT inter operating point (--ctu 64, reference config
surface /root/reference/src/media/processing/kvazaarfilter.cpp:176-276)
as a TPU wavefront: the inter extension of frame_intra64.py and the
64-CTB extension of frame_inter32.py.  Dense prepasses (three motion
searches at 64/32/16, orig-boundary intra sweeps at 32/16) decide the
split tree; the ring-carry 64-wave then resolves the true sequential
state — merge/AMVP candidate lists at 16x16 cell granularity via a
static z-scan cell resolver (_mcell), intra/merge/AMVP/skip arbitration,
and normative reconstruction on per-lane canvases (the _seg_spec /
_unit_walk machinery from frame_intra64).

The CU64 leaf is inter-only (2Nx2N merge/AMVP/skip, transform tree
force-split to four TU32s per 7.3.8.8 log2TrafoSize > MaxTbLog2SizeY);
intra competes at the 32/16 leaves.  One reference picture, TU == CU at
depths 1..2.  Entropy pairs with entropy/quad.py's P writer (which
codes the inter CU64 forced TT); the decode side is the generic tier.

TMVP (8.5.3.2.8): temporal candidate cells are precomputed densely for
all 21 units per CTB (colBr first — same-CTB-row + in-picture — else
colCtr) from the 16x16-compressed collocated store, as in
frame_inter32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ctu_kernels as _ck_mod  # noqa: F401 (import side effects)
from ..ops.mc import (mc_chroma_window_batch, mc_luma_window_batch,
                      sheared_ref_strips, strip_window_slice)
from ..ops.me import _mv_bits, motion_search
from .frame_inter import (CT_AMVP, CT_INTRA, CT_MERGE, CT_SKIP,
                          SEARCH_RANGE, REF_PAD)
from .frame_inter32 import (_PPM_INV, _amvp_cells, _arbitrate,
                            _code_flat_mode, _cost_prepass_grid,
                            _merge_list_cells)
from .frame_intra import (P_PREPASS_MODES, QUAD_UNROLL, _ring_push, from_blocks,
                          to_blocks, wave_inputs, wave_to_raster)
from .frame_intra64 import _seg_spec, _unit_walk, _z
from .wavefront import schedule_r

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))

# z-order unit list: (kind, q32, q16, x0, y0, n); kind 0 = CU32, 1 = CU16
_UNITS_SPLIT = []
for _q32, (_dy3, _dx3) in enumerate(_ZO):
    _X, _Y = _dx3 * 32, _dy3 * 32
    _UNITS_SPLIT.append((0, _q32, 0, _X, _Y, 32))
    for _q16, (_dy, _dx) in enumerate(_ZO):
        _UNITS_SPLIT.append((1, _q32, _q16, _X + _dx * 16, _Y + _dy * 16, 16))


def _temporal_cells(col_mv, col_inter, cw: int, ch: int,
                    xext: bool = False):
    """Per-unit temporal candidate (mv, ok) for the 21 units of each
    64-CTB, from the raster 16-grid collocated store.  Returns
    t64 ((nctb, 2), (nctb,)), t32 ((nctb, 4, 2), (nctb, 4)),
    t16 ((nctb, 4, 4, 2), (nctb, 4, 4)).

    xext: the store carries ONE extra 16-cell column on the right — the
    tile-column case, where the spec's colBr (8.5.3.2.8) is derived
    picture-level and a right-edge unit's colBr cell lives in the next
    tile column (the caller fills the extra column with the neighbor
    tile's cells, or inter=0 at the picture edge)."""
    H16, W16 = 4 * ch, 4 * cw + (1 if xext else 0)
    nctb = cw * ch
    cmv = col_mv.astype(jnp.int32).reshape(H16, W16, 2)
    cif = col_inter.astype(jnp.int32).reshape(H16, W16)
    ys0 = 4 * np.arange(ch, dtype=np.int32)[:, None]
    xs0 = 4 * np.arange(cw, dtype=np.int32)[None, :]

    def cell(cy, cx):
        """Collocated cell at CTB-tile coords (cy, cx) — may index the
        right-neighbor CTB (cx == 4); invalid outside the picture."""
        ys, xs = ys0 + cy, xs0 + cx
        valid = (ys < H16) & (xs < W16)
        ysc = np.minimum(ys, H16 - 1)
        xsc = np.minimum(xs, W16 - 1)
        mv = cmv[jnp.asarray(np.broadcast_to(ysc, (ch, cw))),
                 jnp.asarray(np.broadcast_to(xsc, (ch, cw)))]
        ok = jnp.where(jnp.asarray(np.broadcast_to(valid, (ch, cw))),
                       cif[jnp.asarray(np.broadcast_to(ysc, (ch, cw))),
                           jnp.asarray(np.broadcast_to(xsc, (ch, cw)))], 0)
        return mv.reshape(nctb, 2), ok.reshape(nctb) != 0

    def unit_t(x0, y0, n):
        ctr_mv, ctr_ok = cell((y0 + n // 2) >> 4, (x0 + n // 2) >> 4)
        if y0 + n >= 64:  # colBr in the next CTB row: unavailable (8.5.3.2.8)
            return ctr_mv, ctr_ok
        br_mv, br_ok = cell((y0 + n) >> 4, (x0 + n) >> 4)
        return jnp.where(br_ok[:, None], br_mv, ctr_mv), br_ok | ctr_ok

    t64 = unit_t(0, 0, 64)
    t32m, t32o, t16m, t16o = [], [], [], []
    for _dy3, _dx3 in _ZO:
        X, Y = _dx3 * 32, _dy3 * 32
        m, o = unit_t(X, Y, 32)
        t32m.append(m)
        t32o.append(o)
        m16, o16 = [], []
        for _dy, _dx in _ZO:
            m2, o2 = unit_t(X + _dx * 16, Y + _dy * 16, 16)
            m16.append(m2)
            o16.append(o2)
        t16m.append(jnp.stack(m16, 1))
        t16o.append(jnp.stack(o16, 1))
    return (t64[0], t64[1].astype(jnp.int32),
            jnp.stack(t32m, 1), jnp.stack(t32o, 1).astype(jnp.int32),
            jnp.stack(t16m, 1), jnp.stack(t16o, 1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("width", "height", "merge_cand",
                                              "tmvp", "rdoq", "xtile",
                                              "col_xext"))
def encode_frame_p64_fast(y, u, v, ref_y, ref_u, ref_v, qp, *, width: int,
                          height: int, merge_cand: int = 1,
                          tmvp: bool = False, col_mv=None, col_inter=None,
                          col_xext: bool = False,
                          rdoq: bool = False, xtile=(False, False),
                          xflags=None):
    """Dense-decision CTB64 quadtree P encode (ring-carry 64-wave).

    xtile/xflags: MCTS tile-column constraint (kvazaar --mv-constraint
    frametile, kvazaarfilter.cpp:246-276) — the frame is one tile column
    of `width` px: ME search and merge-candidate SELECTION keep every MC
    support inside [0, width) at interior boundaries (ops/me.mv_valid_x),
    so a tile shard never reads a neighbor's DPB column.  xtile carries
    static bools (host tiled path); xflags overrides with traced bools
    (the shard_map path derives them from lax.axis_index)."""
    from ..core.tables import CHROMA_QP_TABLE
    from ..ops import ctu_kernels as ck

    S = 64
    cw, ch = width // S, height // S
    nctb = cw * ch
    K = merge_cand
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]

    qp = jnp.asarray(qp, jnp.int32)
    qpb = jnp.broadcast_to(qp, (nctb,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qpb, 0, 57)]
    lam = jnp.sqrt(0.57 * 2.0 ** ((qpb.astype(jnp.float32) - 12.0) / 3.0))
    yi = y.astype(jnp.int32)
    oy64 = to_blocks(yi, S)
    ou32 = to_blocks(u.astype(jnp.int32), S // 2)
    ov32 = to_blocks(v.astype(jnp.int32), S // 2)
    oy32 = to_blocks(yi, 32)
    oy16 = to_blocks(yi, 16)

    # ---- dense pre-passes
    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    mekw = dict(search_range=SEARCH_RANGE, width=width, height=height,
                xtile=xtile, xflags=xflags)
    me64, _ = motion_search(y, ref_y, lam_x1k, block=64, **mekw)
    me32, _ = motion_search(y, ref_y, lam_x1k, block=32, **mekw)
    me16, _ = motion_search(y, ref_y, lam_x1k, block=16, **mekw)

    refp_y = jnp.pad(ref_y, REF_PAD, mode="edge")
    refp_u = jnp.pad(ref_u, REF_PAD // 2, mode="edge")
    refp_v = jnp.pad(ref_v, REF_PAD // 2, mode="edge")
    from ..ops.mc import extract_mc_neighborhoods

    win64_all = extract_mc_neighborhoods(refp_y, S, SEARCH_RANGE, cw, ch,
                                         REF_PAD)
    win32_all = extract_mc_neighborhoods(refp_y, 32, SEARCH_RANGE, 2 * cw,
                                         2 * ch, REF_PAD)
    win16_all = extract_mc_neighborhoods(refp_y, 16, SEARCH_RANGE, 4 * cw,
                                         4 * ch, REF_PAD)
    strips_y = sheared_ref_strips(refp_y, S, SEARCH_RANGE, ch, REF_PAD)
    strips_u = sheared_ref_strips(refp_u, S // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)
    strips_v = sheared_ref_strips(refp_v, S // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)

    pme64 = mc_luma_window_batch(win64_all, me64, S, SEARCH_RANGE)
    sat64 = ck.satd_flat(pme64.reshape(nctb, -1), oy64.reshape(nctb, -1),
                         6).astype(jnp.float32)
    pme32 = mc_luma_window_batch(win32_all, me32, 32, SEARCH_RANGE)
    sat32 = ck.satd_flat(pme32.reshape(4 * nctb, -1),
                         oy32.reshape(4 * nctb, -1), 5).astype(jnp.float32)
    pme16 = mc_luma_window_batch(win16_all, me16, 16, SEARCH_RANGE)
    sat16 = ck.satd_flat(pme16.reshape(16 * nctb, -1),
                         oy16.reshape(16 * nctb, -1), 4).astype(jnp.float32)

    # per-block expansions of the CTU grid onto the 16-/32-grids (raster);
    # qp may be scalar or per-CTU (nctb,) — the cu_qp_delta/ROI hook
    rep = lambda a, f: jnp.repeat(
        jnp.repeat(a.reshape(ch, cw), f, 0), f, 1).reshape(-1)
    qp16, lam16 = rep(qpb, 4), rep(lam, 4)
    qp32, lam32 = rep(qpb, 2), rep(lam, 2)
    imode16, icost16 = _cost_prepass_grid(yi, oy16, qp16, lam16, log2=4,
                                          cw=4 * cw, ch=4 * ch)
    imode32, icost32 = _cost_prepass_grid(yi, oy32, qp32, lam32, log2=5,
                                          cw=2 * cw, ch=2 * ch)

    # ---- split decisions (SATD domain)
    lam2v = lam * lam          # (nctb,)
    lam2_32 = lam32 * lam32    # (n32,)
    mebits = lambda mv: (jax.vmap(_mv_bits)(mv[:, 0])
                         + jax.vmap(_mv_bits)(mv[:, 1]))
    best16 = jnp.minimum(icost16, sat16 + lam16 * (mebits(me16) + 3.0))
    best32 = jnp.minimum(icost32, sat32 + lam32 * (mebits(me32) + 3.0))
    cost64 = sat64 + lam * (mebits(me64) + 3.0)

    q16g = lambda a2, c2, r2: jnp.stack(
        [a2.reshape(r2, c2)[dy::2, dx::2].reshape(-1) for dy, dx in _ZO],
        axis=1)
    sum16 = jnp.sum(q16g(best16, 4 * cw, 4 * ch), axis=1)       # (n32,)
    split32_g = (sum16 + lam2_32 * 5.0 < best32 + lam2_32 * 1.0)
    best32sel = jnp.minimum(sum16 + lam2_32 * 5.0, best32 + lam2_32 * 1.0)
    sum32 = jnp.sum(q16g(best32sel, 2 * cw, 2 * ch), axis=1)    # (nctb,)
    split64 = (sum32 + lam2v * 1.0 < cost64 + lam2v * 1.0).astype(jnp.int32)
    split32 = q16g(split32_g.astype(jnp.int32), 2 * cw, 2 * ch)  # (nctb, 4)

    # ---- per-CTB z-order gathers
    m32z = q16g(imode32, 2 * cw, 2 * ch)
    ic32z = q16g(icost32, 2 * cw, 2 * ch)
    me32_2 = me32.reshape(2 * ch, 2 * cw, 2)
    me32z = jnp.stack([me32_2[dy::2, dx::2].reshape(-1, 2) for dy, dx in _ZO],
                      axis=1)                                   # (nctb, 4, 2)
    m16_32 = q16g(imode16, 4 * cw, 4 * ch)                      # (n32, 4)
    ic16_32 = q16g(icost16, 4 * cw, 4 * ch)
    me16_2 = me16.reshape(4 * ch, 4 * cw, 2)
    me16_32 = jnp.stack(
        [me16_2[dy::2, dx::2].reshape(-1, 2) for dy, dx in _ZO], axis=1)
    g32 = lambda a: jnp.stack(
        [a.reshape(2 * ch, 2 * cw, *a.shape[1:])[dy::2, dx::2].reshape(
            (-1,) + a.shape[1:]) for dy, dx in _ZO], axis=1)
    m16z = g32(m16_32)                                          # (nctb, 4, 4)
    ic16z = g32(ic16_32)
    me16z = g32(me16_32)                                        # (nctb,4,4,2)

    if tmvp:
        (t64m, t64o, t32m, t32o, t16m, t16o) = _temporal_cells(
            col_mv, col_inter, cw, ch, xext=col_xext)
    else:
        t64m = jnp.zeros((nctb, 2), jnp.int32)
        t64o = jnp.zeros((nctb,), jnp.int32)
        t32m = jnp.zeros((nctb, 4, 2), jnp.int32)
        t32o = jnp.zeros((nctb, 4), jnp.int32)
        t16m = jnp.zeros((nctb, 4, 4, 2), jnp.int32)
        t16o = jnp.zeros((nctb, 4, 4), jnp.int32)

    # ---- wave inputs
    (oy_w, ou_w, ov_w, me64_w, me32_w, me16_w, im32_w, ic32_w, im16_w,
     ic16_w, s64_w, s32_w, qp_w, qpc_w, lam_w, t64m_w, t64o_w, t32m_w,
     t32o_w, t16m_w, t16o_w) = wave_inputs(
        sched, nctb,
        [oy64, ou32, ov32, me64, me32z, me16z, m32z, ic32z, m16z, ic16z,
         split64, split32, qpb, qp_c, lam, t64m, t64o, t32m, t32o, t16m,
         t16o])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    dwave = jnp.arange(sched["n_waves"], dtype=jnp.int32)
    csw_w = jnp.asarray(sched["cs"])  # (n_waves, lanes) CTB column index
    xs = (oy_w, ou_w, ov_w, me64_w, me32_w, me16_w, im32_w, ic32_w, im16_w,
          ic16_w, s64_w, s32_w, qp_w, qpc_w, lam_w, t64m_w, t64o_w, t32m_w,
          t32o_w, t16m_w, t16o_w, dwave, fl_w, fa_w, ftr_w, csw_w)
    mcts_on = xtile[0] or xtile[1]
    mlf, mrf = xtile if xflags is None else xflags

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    BIG = jnp.float32(1e30)

    def wave(carry, x):
        (ry, ru, rv, mvb_ring, mvr_ring, ifb_ring, ifr_ring) = carry
        (oyw, ouw, ovw, me64w, me32w, me16w, im32, ic32, im16, ic16,
         s64, s32, qpw, qpcw, lamw, t64mv, t64ok, t32mv, t32ok, t16mv,
         t16ok, dw, fl, fa, ftr, csw) = x
        mcts_at = (lambda x0: (csw * S + x0, mlf, mrf, width)) \
            if mcts_on else (lambda x0: None)
        lamf = lamw.astype(jnp.float32)
        fal = fl & fa
        fls = jnp.zeros_like(fl)
        flags = {"fl": fl, "fa": fa, "ftr": ftr, "fal": fal}

        win64 = strip_window_slice(strips_y, dw, S, SEARCH_RANGE)
        winu32 = strip_window_slice(strips_u, dw, S // 2, SEARCH_RANGE,
                                    chroma=True)
        winv32 = strip_window_slice(strips_v, dw, S // 2, SEARCH_RANGE,
                                    chroma=True)

        ringsY = {"Lcol": ry[1][0], "Trow": shift1(ry[0][1]),
                  "TRrow": shift1(ry[0][0]),
                  "Cpix": shift1(ry[0][2])[:, S - 1 : S]}
        ringsU = {"Lcol": ru[1][0], "Trow": shift1(ru[0][1]),
                  "TRrow": shift1(ru[0][0]),
                  "Cpix": shift1(ru[0][2])[:, S // 2 - 1 : S // 2]}
        ringsV = {"Lcol": rv[1][0], "Trow": shift1(rv[0][1]),
                  "TRrow": shift1(rv[0][0]),
                  "Cpix": shift1(rv[0][2])[:, S // 2 - 1 : S // 2]}

        # motion cell rings (4 cells per CTB edge)
        L_mv, L_if = mvr_ring[0], ifr_ring[0]          # left CTB right col
        T_mv, T_if = shift1(mvb_ring[1]), shift1(ifb_ring[1])  # above bottom
        TR_mv, TR_if = shift1(mvb_ring[0]), shift1(ifb_ring[0])
        AL_mv = shift1(mvb_ring[2])[:, 3]              # above-left BR cell
        AL_if = shift1(ifb_ring[2])[:, 3]
        zmv = jnp.zeros((lanes, 2), jnp.int32)

        def mcell(mcv, mif, x, y, zcur):
            """(avail (L,), mv (L,2)) for the motion cell containing pixel
            (x, y), z-scan availability (6.4.1)."""
            if y >= 64 or (x >= 64 and y >= 0):
                return fls, zmv
            if x < 0 and y < 0:
                return fal & (AL_if != 0), AL_mv
            if x < 0:
                return fl & (L_if[:, y >> 4] != 0), L_mv[:, y >> 4]
            if y < 0:
                if x < 64:
                    return fa & (T_if[:, x >> 4] != 0), T_mv[:, x >> 4]
                return ftr & (TR_if[:, (x - 64) >> 4] != 0), TR_mv[:, (x - 64) >> 4]
            if _z(x, y) < zcur:
                return mif[:, y >> 4, x >> 4] != 0, mcv[:, y >> 4, x >> 4]
            return fls, zmv

        def unit_lists(mcv, mif, x0, y0, n, temporal):
            zcur = _z(x0, y0)
            mc = lambda x, yy: mcell(mcv, mif, x, yy, zcur)
            a1 = mc(x0 - 1, y0 + n - 1)
            b1 = mc(x0 + n - 1, y0 - 1)
            b0 = mc(x0 + n, y0 - 1)
            a0 = mc(x0 - 1, y0 + n)
            b2 = mc(x0 - 1, y0 - 1)
            cands = {"a1": a1, "b1": b1, "b0": b0, "a0": a0, "b2": b2}
            merge = _merge_list_cells(cands, K, temporal=temporal)
            mvp0, mvp1 = _amvp_cells([a0, a1], [b0, b1, b2],
                                     temporal=temporal)
            return merge, mvp0, mvp1

        def set_cells(mcv, mif, x0, y0, n, mv, is_inter):
            cs = slice(y0 >> 4, (y0 + n) >> 4), slice(x0 >> 4, (x0 + n) >> 4)
            mcv = mcv.at[:, cs[0], cs[1]].set(
                jnp.broadcast_to(mv[:, None, None, :],
                                 (lanes, n >> 4, n >> 4, 2)))
            mif = mif.at[:, cs[0], cs[1]].set(
                jnp.broadcast_to(is_inter.astype(jnp.int32)[:, None, None],
                                 (lanes, n >> 4, n >> 4)))
            return mcv, mif

        def intra_pred(canvas, rings, x0, y0, log2u, sel_idx, is_luma, Sc):
            n = 1 << log2u
            spec = _seg_spec(x0, y0, n, Sc)
            a = _unit_walk(canvas, rings, spec, n, flags)
            preds = ck.predict_modes_subset_flat(a, log2u, is_luma,
                                                 P_PREPASS_MODES)
            return jnp.take_along_axis(preds, sel_idx[:, None, None], 1)[:, 0]

        def code_p_unit(cY, cU, cV, mcv, mif, x0, y0, log2u, imode, icost,
                        memv, temporal):
            """One inter-capable unit at (x0, y0): full arbitration, TQR,
            canvas + cell updates.  Returns updated canvases/cells and the
            decision bundle."""
            n = 1 << log2u
            oyf = oyw[:, y0 : y0 + n, x0 : x0 + n].reshape(lanes, -1)
            win = jax.lax.slice(
                win64, (0, y0, x0),
                (lanes, y0 + n + 2 * SEARCH_RANGE + 7,
                 x0 + n + 2 * SEARCH_RANGE + 7))
            merge, mvp0, mvp1 = unit_lists(mcv, mif, x0, y0, n, temporal)
            arb = _arbitrate(ck, oyf, log2u, win, merge, memv, mvp0, mvp1,
                             icost, lamf, K, mcts=mcts_at(x0))
            isel = jnp.asarray(_PPM_INV)[imode]
            pred_i = intra_pred(cY, ringsY, x0, y0, log2u, isel, True, S)
            pred_y = jnp.where(arb["use_intra"][:, None], pred_i,
                               arb["pred_inter"])
            lev, rec = _code_flat_mode(ck, oyf, pred_y, qpw, log2u,
                                       arb["use_intra"], lamf * lamf, rdoq)
            cY = cY.at[:, y0 : y0 + n, x0 : x0 + n].set(
                rec.reshape(lanes, n, n))
            # chroma: U and V batched through one MC + one TQR chain (the
            # math is per-row independent, so this is bit-identical to
            # per-plane calls — it just halves the dispatch count)
            xc, yc, m = x0 >> 1, y0 >> 1, n >> 1
            sl_c = lambda winc: jax.lax.slice(
                winc, (0, yc, xc),
                (lanes, yc + m + SEARCH_RANGE + 3,
                 xc + m + SEARCH_RANGE + 3))
            ocf2 = jnp.concatenate(
                [ouw[:, yc : yc + m, xc : xc + m].reshape(lanes, -1),
                 ovw[:, yc : yc + m, xc : xc + m].reshape(lanes, -1)], 0)
            pred_ic2 = jnp.concatenate(
                [intra_pred(cU, ringsU, xc, yc, log2u - 1, isel, False,
                            S // 2),
                 intra_pred(cV, ringsV, xc, yc, log2u - 1, isel, False,
                            S // 2)], 0).reshape(2 * lanes, -1)
            wc2 = jnp.concatenate([sl_c(winu32), sl_c(winv32)], 0)
            pred_mc2 = mc_chroma_window_batch(
                wc2, jnp.tile(arb["mv"], (2, 1)), m,
                SEARCH_RANGE).reshape(2 * lanes, -1)
            ui2 = jnp.tile(arb["use_intra"], 2)
            pred_c2 = jnp.where(ui2[:, None], pred_ic2, pred_mc2)
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
            mcv, mif = set_cells(mcv, mif, x0, y0, n, arb["mv"],
                                 ct != CT_INTRA)
            return (cY, cU, cV, mcv, mif,
                    dict(ct=ct, mv=arb["mv"], mi=arb["merge_idx"],
                         mf=arb["mvp_flag"], mvd=arb["mvd"], imode=imode,
                         lev=lev, levu=lev_c[0], levv=lev_c[1]))

        # ---------- split path (z-order, per-quadrant leaf-vs-16s select)
        cY = jnp.zeros((lanes, S, S), jnp.int32)
        cU = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        cV = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        mcv = jnp.zeros((lanes, 4, 4, 2), jnp.int32)
        mif = jnp.zeros((lanes, 4, 4), jnp.int32)
        d32, d16 = [], []     # per-q32 decision bundles
        lev_q, levu_q, levv_q = [], [], []
        for q32, (dy3, dx3) in enumerate(_ZO):
            X, Y = dx3 * 32, dy3 * 32
            sel = (s32[:, q32] != 0)
            t32q = ((t32ok[:, q32] != 0, t32mv[:, q32]) if tmvp else None)
            (cY_l, cU_l, cV_l, mcv_l, mif_l, dec32) = code_p_unit(
                cY, cU, cV, mcv, mif, X, Y, 5, im32[:, q32], ic32[:, q32],
                me32w[:, q32], t32q)
            c16Y, c16U, c16V, m16cv, m16if = cY, cU, cV, mcv, mif
            dec16s, l16, l16u, l16v = [], [], [], []
            for q16, (dy, dx) in enumerate(_ZO):
                xq, yq = X + dx * 16, Y + dy * 16
                t16q = ((t16ok[:, q32, q16] != 0, t16mv[:, q32, q16])
                        if tmvp else None)
                (c16Y, c16U, c16V, m16cv, m16if, dq) = code_p_unit(
                    c16Y, c16U, c16V, m16cv, m16if, xq, yq, 4,
                    im16[:, q32, q16], ic16[:, q32, q16],
                    me16w[:, q32, q16], t16q)
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
            mcv = jnp.where(sel[:, None, None, None], m16cv, mcv_l)
            mif = jnp.where(sel3, m16if, mif_l)
            d32.append(dec32)
            d16.append(dec16s)
            lev_q.append(jnp.where(sel2, jnp.concatenate(l16, 1),
                                   dec32["lev"]))
            levu_q.append(jnp.where(sel2, jnp.concatenate(l16u, 1),
                                    dec32["levu"]))
            levv_q.append(jnp.where(sel2, jnp.concatenate(l16v, 1),
                                    dec32["levv"]))

        # ---------- CU64 leaf (inter-only: merge/AMVP/skip, 4x TU32)
        t64q = ((t64ok != 0, t64mv) if tmvp else None)
        merge64, mvp0_64, mvp1_64 = unit_lists(
            jnp.zeros((lanes, 4, 4, 2), jnp.int32),
            jnp.zeros((lanes, 4, 4), jnp.int32), 0, 0, 64, t64q)
        oy64f = oyw.reshape(lanes, -1)
        arb64 = _arbitrate(ck, oy64f, 6, win64, merge64, me64w, mvp0_64,
                           mvp1_64, jnp.broadcast_to(BIG, (lanes,)), lamf, K,
                           mcts=mcts_at(0))
        # MC the full 64x64 (and 32x32 chroma) ONCE — interpolation is
        # translation-invariant, so slicing equals per-TU32 MC — then run
        # the four forced TU32s (and all 8 chroma TU16s) as ONE batched
        # TQR each: bit-identical, 12 MC + 12 TQR chains -> 2 MC + 2 TQR
        fls_b = jnp.zeros((lanes,), bool)
        pred64 = mc_luma_window_batch(win64, arb64["mv"], S, SEARCH_RANGE)
        pc64 = mc_chroma_window_batch(
            jnp.concatenate([winu32, winv32], 0),
            jnp.tile(arb64["mv"], (2, 1)), S // 2, SEARCH_RANGE)

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
        # quads on the (2*lanes) concat yields z-major blocks of 2*lanes:
        # [q][plane][lane] with plane-major inside each quadrant
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
        mcv_out = jnp.where(sb[:, None, None, None], mcv,
                            jnp.broadcast_to(arb64["mv"][:, None, None, :],
                                             (lanes, 4, 4, 2)))
        mif_out = jnp.where(sb3, mif,
                            jnp.ones((lanes, 4, 4), jnp.int32))

        ry = _ring_push(ry, rec_y[:, S - 1, :], rec_y[:, :, S - 1])
        ru = _ring_push(ru, rec_u[:, S // 2 - 1, :], rec_u[:, :, S // 2 - 1])
        rv = _ring_push(rv, rec_v[:, S // 2 - 1, :], rec_v[:, :, S // 2 - 1])
        push = lambda ring, val: jnp.concatenate([val[None], ring[:2]], axis=0)
        mvb_ring = push(mvb_ring, mcv_out[:, 3, :, :])
        mvr_ring = push(mvr_ring, mcv_out[:, :, 3, :])
        ifb_ring = push(ifb_ring, mif_out[:, 3, :])
        ifr_ring = push(ifr_ring, mif_out[:, :, 3])

        stack32 = lambda key: jnp.stack([d[key] for d in d32], 1)
        stack16 = lambda key: jnp.stack(
            [jnp.stack([d16[q][z][key] for z in range(4)], 1)
             for q in range(4)], 1)
        out = (ct64, arb64["mv"], arb64["merge_idx"], arb64["mvp_flag"],
               arb64["mvd"],
               stack32("ct"), stack32("mv"), stack32("mi"), stack32("mf"),
               stack32("mvd"),
               stack16("ct"), stack16("mv"), stack16("mi"), stack16("mf"),
               stack16("mvd"),
               lev_y.astype(jnp.int16), lev_cb.astype(jnp.int16),
               lev_cr.astype(jnp.int16), rec_y.astype(jnp.uint8),
               rec_u.astype(jnp.uint8), rec_v.astype(jnp.uint8))
        return (ry, ru, rv, mvb_ring, mvr_ring, ifb_ring, ifr_ring), out

    carry0 = (ring0(S), ring0(S // 2), ring0(S // 2),
              jnp.zeros((3, lanes, 4, 2), jnp.int32),
              jnp.zeros((3, lanes, 4, 2), jnp.int32),
              jnp.zeros((3, lanes, 4), jnp.int32),
              jnp.zeros((3, lanes, 4), jnp.int32))
    _, outs = jax.lax.scan(wave, carry0, xs, unroll=QUAD_UNROLL)
    (ct64_w, mv64_w, mi64_w, mf64_w, mvd64_w, ct32_w, mv32_w, mi32_w, mf32_w,
     mvd32_w, ct16_w, mv16_w, mi16_w, mf16_w, mvd16_w, lev_y_w, lev_cb_w,
     lev_cr_w, rec_y_w, rec_u_w, rec_v_w) = outs

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
        "ct64": w2r(ct64_w), "mv64": w2r(mv64_w),
        "merge_idx64": w2r(mi64_w), "mvp_flag64": w2r(mf64_w),
        "mvd64": w2r(mvd64_w),
        "ct32": w2r(ct32_w), "mv32": w2r(mv32_w),
        "merge_idx32": w2r(mi32_w), "mvp_flag32": w2r(mf32_w),
        "mvd32": w2r(mvd32_w),
        "ct16": w2r(ct16_w), "mv16": w2r(mv16_w),
        "merge_idx16": w2r(mi16_w), "mvp_flag16": w2r(mf16_w),
        "mvd16": w2r(mvd16_w),
        "lev_y": w2r(lev_y_w),
        "lev_cb": w2r(lev_cb_w),
        "lev_cr": w2r(lev_cr_w),
        "recon_y": from_blocks(rec_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(rec_u, height // 2,
                               width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(rec_v, height // 2,
                               width // 2).astype(jnp.uint8),
    }


def quad_p64_trees_from_device(out, width: int, height: int):
    """Nested cu32-format trees (size 64) from the CTB64 P device outputs.

    lev_y layout: (nctb, 4096) = z-order 32-quadrants of 1024; within a
    split-32 quadrant, z-order 16-leaves of 256.  The CU64 leaf's levels
    use the same per-quadrant layout (its four TU32s)."""
    cw, ch = width // 64, height // 64
    nctb = cw * ch
    s64 = np.asarray(out["split64"]).reshape(-1)
    s32 = np.asarray(out["split32"]).reshape(nctb, 4)
    d = {k: np.asarray(out[k]) for k in
         ("imode32", "imode16", "ct64", "mv64", "merge_idx64", "mvp_flag64",
          "mvd64", "ct32", "mv32", "merge_idx32", "mvp_flag32", "mvd32",
          "ct16", "mv16", "merge_idx16", "mvp_flag16", "mvd16")}
    from .frame_intra64 import fetch_levels_i32

    lev_y, lev_cb, lev_cr = fetch_levels_i32(out)
    lev_y = lev_y.reshape(nctb, 4, 1024)
    lev_cb = lev_cb.reshape(nctb, 4, 256)
    lev_cr = lev_cr.reshape(nctb, 4, 256)

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
            trees.append(leaf(64, d["ct64"][i], 0, d["mv64"][i],
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
                         d["mv16"][i, q, z], d["merge_idx16"][i, q, z],
                         d["mvp_flag16"][i, q, z], d["mvd16"][i, q, z],
                         ly[z], lb[z], lr[z])
                    for z in range(4)
                ]))
            else:
                sub32.append(
                    leaf(32, d["ct32"][i, q], d["imode32"][i, q],
                         d["mv32"][i, q], d["merge_idx32"][i, q],
                         d["mvp_flag32"][i, q], d["mvd32"][i, q],
                         lev_y[i, q].reshape(32, 32),
                         lev_cb[i, q].reshape(16, 16),
                         lev_cr[i, q].reshape(16, 16)))
        trees.append(dict(size=64, split=sub32))
    return trees
