"""Low-delay P frame encoder: the device-side wavefront with inter tools.

Adds to the intra scan (frame_intra.py): motion-compensated prediction from
one reference picture (the previous deblocked frame), merge / AMVP / skip
decision, and the intra-vs-inter choice — the low-delay P operating point
of the reference (GOP `lp-g4d3t1`-family, kvazaarfilter.cpp:233; here a
one-ref P chain, IDR every intra-period).

Structure: integer+half-pel motion search runs as a dense frame-level
pre-pass (ops/me.py) because it reads only the original and the reference
picture; the wavefront then resolves merge/AMVP (which depend on coded
neighbor MVs), evaluates intra vs inter by SATD + bit cost, and codes the
residual.  Every decision is computed for all candidates and selected —
the dense evaluate-all-then-select shape (SURVEY.md §7).

CU types emitted per CTU: 0 = intra, 1 = merge (with residual),
2 = AMVP, 3 = skip (merge, no residual).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.mc import CHROMA_PAD, LUMA_PAD, mc_chroma, mc_luma, pad_reference
from ..ops.me import _mv_bits, motion_search
from ..ops.quant import dequantize, quantize, quantize_rdoq
from ..ops.satd import satd_blocks
from .frame_intra import (
    WAVE_UNROLL,
    _code_block,
    _encode_ctu,
    _frame_setup,
    _gather_refs_blocks,
    _mode_bits_table,
    from_blocks,
    to_blocks,
    wave_inputs,
    wave_to_raster,
)
from .wavefront import schedule

CT_INTRA, CT_MERGE, CT_AMVP, CT_SKIP = 0, 1, 2, 3

# inverse map of frame_intra.P_PREPASS_MODES (mode number -> subset slot)
from .frame_intra import P_PREPASS_MODES as _PPM  # noqa: E402

_PREPASS_INV = np.zeros(35, np.int32)
for _k, _m in enumerate(_PPM):
    _PREPASS_INV[_m] = _k
P_PREPASS_MODES = _PPM
SEARCH_RANGE = 16
REF_PAD = SEARCH_RANGE + 8


def _first_inter_mv(cands):
    """First available inter neighbor MV from a list of (avail, mv) pairs.

    Returns (found, mv): the HEVC first-merge-candidate rule specialized to
    MaxNumMergeCand == 1 (spatial order A1, B1, B0, B2; TMVP off) — with a
    single candidate, merge_idx is not coded (7.4.9.5) and only the first
    available candidate matters.
    """
    found = jnp.bool_(False)
    mv = jnp.zeros((2,), jnp.int32)
    for avail, cand in cands:
        take = avail & ~found
        mv = jnp.where(take, cand, mv)
        found = found | avail
    return found, mv


def _first_inter_mv_batch(cands):
    """Batched _first_inter_mv: avail (L,), mv (L, 2) per candidate."""
    found = None
    mv = None
    for avail, cand in cands:
        if found is None:
            found = jnp.zeros_like(avail)
            mv = jnp.zeros_like(cand)
        take = avail & ~found
        mv = jnp.where(take[:, None], cand, mv)
        found = found | avail
    return found, mv


def _amvp_list(a_avail, a_mv, b_avail, b_mv):
    """AMVP candidate list (8.5.3.2.6 specialized): A then B, dedupe,
    zero-pad to two."""
    both = a_avail & b_avail
    same = both & jnp.all(a_mv == b_mv)
    # slot 0: A if available else B else zero
    mvp0 = jnp.where(a_avail, a_mv, jnp.where(b_avail, b_mv, jnp.zeros(2, jnp.int32)))
    # slot 1: B if (A and B and distinct) else zero
    use_b1 = both & ~same
    mvp1 = jnp.where(use_b1, b_mv, jnp.zeros(2, jnp.int32))
    # when only one of A/B exists, slot1 is the zero candidate
    return mvp0, mvp1


def _amvp_list_t(a_avail, a_mv, b_avail, b_mv, t_avail, t_mv):
    """AMVP with the temporal candidate (8.5.3.2.6): spatial A, spatial B
    (pruned vs A), temporal when fewer than two entries, zero fill."""
    both = a_avail & b_avail
    same = both & jnp.all(a_mv == b_mv)
    nspat = a_avail.astype(jnp.int32) + (b_avail & ~(a_avail & same)).astype(jnp.int32)
    zero = jnp.zeros(2, jnp.int32)
    mvp0 = jnp.where(a_avail, a_mv,
           jnp.where(b_avail, b_mv, jnp.where(t_avail, t_mv, zero)))
    mvp1 = jnp.where(nspat == 2, b_mv,
           jnp.where((nspat == 1) & t_avail, t_mv, zero))
    return mvp0, mvp1


def _mvd_bits(mvd):
    return _mv_bits(mvd[0]) + _mv_bits(mvd[1]) + 2.0


def _encode_ctu_p(
    blk_y, blk_u, blk_v, mvs, inter_flags,
    refp_y, refp_u, refp_v,
    oy, ou, ov, r, c, cand_a_mode, me_mv,
    qp, qp_c, lam, geom,
):
    """Per-CTU P-slice compute.  Returns coding decisions + recon blocks."""
    n = 16
    cw, ch, width, height = geom
    idx = r * cw + c
    avail_l = c > 0
    avail_a = r > 0
    avail_ar = avail_a & (c + 1 < cw)
    avail_al = avail_a & avail_l
    clampi = lambda i: jnp.clip(i, 0, cw * ch - 1)
    nb = lambda off: (mvs[clampi(idx + off)], inter_flags[clampi(idx + off)])
    mv_l, int_l = nb(-1)
    mv_a, int_a = nb(-cw)
    mv_ar, int_ar = nb(-cw + 1)
    mv_al, int_al = nb(-cw - 1)

    # merge first candidate: A1, B1, B0, B2 (A0 below-left never coded)
    _, merge_mv = _first_inter_mv(
        [
            (avail_l & int_l, mv_l),
            (avail_a & int_a, mv_a),
            (avail_ar & int_ar, mv_ar),
            (avail_al & int_al, mv_al),
        ]
    )
    # AMVP: A from left; B from above-right, above, above-left
    b_avail, b_mv = _first_inter_mv(
        [(avail_ar & int_ar, mv_ar), (avail_a & int_a, mv_a), (avail_al & int_al, mv_al)]
    )
    mvp0, mvp1 = _amvp_list(avail_l & int_l, mv_l, b_avail, b_mv)

    # ---- intra evaluation (same as I slices)
    a_raw, avail = _gather_refs_blocks(blk_y, r, c, n, cw, ch, width)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = intra_ops.predict_all_modes(a, 4, True)
    cost35 = satd_blocks(preds, oy[None]).astype(jnp.float32)
    ibits = _mode_bits_table(jnp.where(avail_l, cand_a_mode, 1))
    intra_mode = jnp.argmin(cost35 + lam * ibits).astype(jnp.int32)
    cost_intra = (cost35 + lam * ibits)[intra_mode] + lam * 3.0  # pred_mode+part+chroma
    pred_intra = preds[intra_mode]

    # ---- inter evaluation
    x0, y0 = c * n, r * n
    mc_y = lambda mv: mc_luma(refp_y, x0, y0, mv[0], mv[1], n, width, height, REF_PAD)
    pred_merge = mc_y(merge_mv)
    pred_me = mc_y(me_mv)
    cost_merge = satd_blocks(pred_merge[None], oy[None])[0].astype(jnp.float32) + lam * 2.0
    mvd0 = me_mv - mvp0
    mvd1 = me_mv - mvp1
    use_mvp1 = _mvd_bits(mvd1) < _mvd_bits(mvd0)
    mvp_flag = use_mvp1.astype(jnp.int32)
    mvd = jnp.where(use_mvp1, mvd1, mvd0)
    cost_me = (
        satd_blocks(pred_me[None], oy[None])[0].astype(jnp.float32)
        + lam * (_mvd_bits(mvd) + 3.0)
    )
    is_merge = cost_merge <= cost_me
    mv_sel = jnp.where(is_merge, merge_mv, me_mv)
    pred_inter = jnp.where(is_merge, pred_merge, pred_me)
    cost_inter = jnp.minimum(cost_merge, cost_me)

    use_intra = cost_intra < cost_inter
    pred_y = jnp.where(use_intra, pred_intra, pred_inter)
    lev_y, rec_y = _code_block(oy, pred_y, qp, 4, intra=True)

    # ---- chroma: DM intra or MC with the same MV
    xc, yc = x0 // 2, y0 // 2
    outs_c = []
    for blk_c, oc, refp_c in ((blk_u, ou, refp_u), (blk_v, ov, refp_v)):
        a_raw_c, avail_c = _gather_refs_blocks(blk_c, r, c, n // 2, cw, ch, width // 2)
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        pred_ci = intra_ops.predict_mode(ac, 3, False, intra_mode)
        pred_cm = mc_chroma(
            refp_c, xc, yc, mv_sel[0], mv_sel[1], n // 2, width // 2, height // 2, REF_PAD // 2
        )
        pred_c = jnp.where(use_intra, pred_ci, pred_cm)
        outs_c.append(_code_block(oc, pred_c, qp_c, 3, intra=True))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = outs_c

    zero_resid = (
        jnp.all(lev_y == 0) & jnp.all(lev_cb == 0) & jnp.all(lev_cr == 0)
    )
    ctype = jnp.where(
        use_intra,
        CT_INTRA,
        jnp.where(is_merge, jnp.where(zero_resid, CT_SKIP, CT_MERGE), CT_AMVP),
    ).astype(jnp.int32)

    return dict(
        ctype=ctype,
        intra_mode=intra_mode,
        mv=mv_sel,
        mvp_flag=mvp_flag,
        mvd=mvd,
        lev_y=lev_y,
        lev_cb=lev_cb,
        lev_cr=lev_cr,
        rec_y=rec_y,
        rec_cb=rec_cb,
        rec_cr=rec_cr,
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq"))
def encode_frame_p(y, u, v, ref_y, ref_u, ref_v, qp, *, width: int, height: int, rdoq: bool = False):
    """Encode one P frame against one reference picture (deblocked).

    Returns per-CTU arrays: ctype, intra_mode, mv, mvp_flag, mvd, levels,
    and the (pre-deblock) reconstruction planes.
    """
    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule(cw, ch)
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)
    geom = (cw, ch, width, height)

    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    me_mv, _ = motion_search(
        y, ref_y, lam_x1k, block=n, search_range=SEARCH_RANGE, width=width, height=height
    )

    blk_y0 = jnp.zeros((nctu, n, n), jnp.int32)
    blk_c0 = jnp.zeros((nctu, n // 2, n // 2), jnp.int32)

    # Hoist ALL reference reads out of the wavefront: per-CTU uint8
    # neighborhood windows covering every |MV| <= search_range.  In-scan MC
    # (merge + ME candidates) then slices a lane-private (55, 55) window —
    # no gathers into the picture-sized reference inside the scan body
    # (the round-1 P-frame bottleneck).
    from ..ops.mc import extract_mc_neighborhoods, mc_chroma_window, mc_luma_window

    refp_y8 = jnp.pad(ref_y, REF_PAD, mode="edge")
    refp_u8 = jnp.pad(ref_u, REF_PAD // 2, mode="edge")
    refp_v8 = jnp.pad(ref_v, REF_PAD // 2, mode="edge")
    win_y = extract_mc_neighborhoods(refp_y8, n, SEARCH_RANGE, cw, ch, REF_PAD)
    win_u = extract_mc_neighborhoods(refp_u8, n // 2, SEARCH_RANGE, cw, ch,
                                     REF_PAD // 2, chroma=True)
    win_v = extract_mc_neighborhoods(refp_v8, n // 2, SEARCH_RANGE, cw, ch,
                                     REF_PAD // 2, chroma=True)

    oy_w, ou_w, ov_w, memv_w, winy_w, winu_w, winv_w, qp_w, qpc_w, lam_w = wave_inputs(
        sched, nctu, [oy, ou, ov, me_mv, win_y, win_u, win_v, qp, qp_c, lam]
    )
    xs = (oy_w, ou_w, ov_w, memv_w, winy_w, winu_w, winv_w, qp_w, qpc_w, lam_w,
          jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
          jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]))

    carry0 = (
        blk_y0, blk_c0, jnp.zeros_like(blk_c0),
        jnp.zeros((nctu,), jnp.int32),         # intra modes
        jnp.zeros((nctu, 2), jnp.int32),       # mvs
        jnp.zeros((nctu,), bool),              # inter flags
    )
    carry, outs = jax.lax.scan(
        functools.partial(_wave_impl, cw=cw, ch=ch, nctu=nctu, geom=geom, rdoq=rdoq),
        carry0,
        xs,
    )
    (blk_y, blk_u, blk_v, modes, mvs, inter_flags) = carry
    w2r = lambda a: wave_to_raster(sched, a)
    return {
        "ctype": w2r(outs["ctype"]),
        "intra_mode": w2r(outs["intra_mode"]),
        "mv": w2r(outs["mv"]),
        "mvp_flag": w2r(outs["mvp_flag"]),
        "mvd": w2r(outs["mvd"]),
        "lev_y": w2r(outs["lev_y"]).astype(jnp.int16),
        "lev_cb": w2r(outs["lev_cb"]).astype(jnp.int16),
        "lev_cr": w2r(outs["lev_cr"]).astype(jnp.int16),
        "recon_y": from_blocks(blk_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk_u, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk_v, height // 2, width // 2).astype(jnp.uint8),
    }


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "rdoq", "xtile",
                                    "merge_cand", "tmvp", "ref_vpad"))
def encode_frame_p_fast(y, u, v, ref_y, ref_u, ref_v, qp, *, width: int,
                        height: int, rdoq: bool = False,
                        xtile=(False, False), xflags=None,
                        merge_cand: int = 1, tmvp: bool = False,
                        col_mv=None, col_inter=None, ref_vpad: bool = False):
    """Dense-decision low-delay P encode (ring-carry scan).

    Everything that does not read coded-neighbor state runs as one dense
    batch over all CTUs: integer+fractional ME, motion compensation at the
    ME MV, its SATD cost, and the intra mode/cost prepass (orig-boundary
    approximation, frame_intra.intra_cost_prepass).  The wavefront scan
    keeps only the true sequential state — reconstruction boundary samples
    and neighbor MVs for merge/AMVP — as 3-wave rings (static lane shifts,
    schedule_r), evaluates the true merge candidate, makes the final
    intra/merge/AMVP/skip choice, and codes the selected prediction.
    Output format matches encode_frame_p."""
    from ..ops import ctu_kernels as ck
    from ..ops.mc import (extract_mc_neighborhoods, mc_chroma_window_batch,
                          mc_luma_window_batch, sheared_ref_strips,
                          strip_window_slice)
    from .frame_intra import (_code_flat_sel, _ring_boundary, _ring_push,
                              intra_cost_prepass)
    from .wavefront import schedule_r

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]
    qp, qp_c, lam, oy, ou, ov = _frame_setup(y, u, v, qp, nctu)
    if col_mv is None:
        col_mv = jnp.zeros((nctu, 2), jnp.int32)
        col_inter = jnp.zeros((nctu,), jnp.int32)
    else:
        col_mv = col_mv.astype(jnp.int32)
        col_inter = col_inter.astype(jnp.int32)

    # ---- dense pre-passes
    # ref_vpad: reference planes arrive with REF_PAD(/2) rows of VERTICAL
    # context attached (true neighbor-strip rows for slice strips, spec
    # picture-edge replication elsewhere) — sliced from the full picture's
    # padded reference, so cross-slice-boundary MC stays bit-exact (MC may
    # read any reference row; only in-picture prediction stops at slices).
    if ref_vpad:
        refp_y8 = jnp.pad(ref_y, ((0, 0), (REF_PAD, REF_PAD)), mode="edge")
        refp_u8 = jnp.pad(ref_u, ((0, 0), (REF_PAD // 2, REF_PAD // 2)),
                          mode="edge")
        refp_v8 = jnp.pad(ref_v, ((0, 0), (REF_PAD // 2, REF_PAD // 2)),
                          mode="edge")
        ref_y_co = ref_y[REF_PAD:-REF_PAD]  # co-located strip for ME
    else:
        refp_y8 = jnp.pad(ref_y, REF_PAD, mode="edge")
        refp_u8 = jnp.pad(ref_u, REF_PAD // 2, mode="edge")
        refp_v8 = jnp.pad(ref_v, REF_PAD // 2, mode="edge")
        ref_y_co = ref_y
    lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
    me_mv, _ = motion_search(
        y, ref_y_co, lam_x1k, block=n, search_range=SEARCH_RANGE, width=width,
        height=height, xtile=xtile, xflags=xflags)
    # dense ME prediction: the one-shot window tensor fuses into its single
    # consumer here; the WAVE's windows come from sheared strips instead
    # (scan-invariant, one dynamic_slice per wave — see sheared_ref_strips)
    win_y = extract_mc_neighborhoods(refp_y8, n, SEARCH_RANGE, cw, ch, REF_PAD)
    strips_y = sheared_ref_strips(refp_y8, n, SEARCH_RANGE, ch, REF_PAD)
    strips_u = sheared_ref_strips(refp_u8, n // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)
    strips_v = sheared_ref_strips(refp_v8, n // 2, SEARCH_RANGE, ch,
                                  REF_PAD // 2, chroma=True)

    pred_me = mc_luma_window_batch(win_y, me_mv, n, SEARCH_RANGE)  # (nctu,n,n)
    oy_flat_all = oy.reshape(nctu, n * n)
    satd_me = ck.satd_flat(pred_me.reshape(nctu, -1), oy_flat_all, 4).astype(jnp.float32)

    from .frame_intra import P_PREPASS_MODES

    imode, icost = intra_cost_prepass(y, oy, qp, qp_c, lam, width=width,
                                      height=height, modes=P_PREPASS_MODES)

    # ---- wave inputs
    (oy_w, ou_w, ov_w, memv_w, pme_w, csme_w, im_w, ic_w,
     qp_w, qpc_w, lam_w, colmv_w, colok_w) = wave_inputs(
        sched, nctu,
        [oy, ou, ov, me_mv, pred_me.astype(jnp.uint8), satd_me, imode, icost,
         qp, qp_c, lam, col_mv, col_inter])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    fal_w = fl_w & fa_w
    xpos_w = jnp.asarray(sched["cs"].astype(np.int32) * n)
    dwave = jnp.arange(sched["n_waves"], dtype=jnp.int32)
    xs = (oy_w, ou_w, ov_w, memv_w, pme_w, csme_w, im_w, ic_w, dwave,
          qp_w, qpc_w, lam_w, fl_w, fa_w, ftr_w, fal_w, xpos_w,
          colmv_w, colok_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    def wave(carry, x):
        ry, ru, rv, mv_ring, if_ring = carry
        (oyw, ouw, ovw, memv, pme, csme, imode_w, icost_w, dw,
         qpw, qpcw, lamw, fl, fa, ftr, fal, xpos, colmv, colok) = x
        winy = strip_window_slice(strips_y, dw, n, SEARCH_RANGE)
        winu = strip_window_slice(strips_u, dw, n // 2, SEARCH_RANGE,
                                  chroma=True)
        winv = strip_window_slice(strips_v, dw, n // 2, SEARCH_RANGE,
                                  chroma=True)
        lamf = lamw.astype(jnp.float32)
        lam2 = lamf * lamf

        # neighbor MVs from the rings (lane k = CTU row k)
        mv_l, if_l = mv_ring[0], if_ring[0]                  # left (d-1)
        mv_a, if_a = shift1(mv_ring[1]), shift1(if_ring[1])  # above (d-2)
        mv_ar, if_ar = shift1(mv_ring[0]), shift1(if_ring[0])
        mv_al, if_al = shift1(mv_ring[2]), shift1(if_ring[2])
        inter_b = lambda f: f[:, 0] != 0
        v_a1 = fl & inter_b(if_l)
        v_b1 = fa & inter_b(if_a)
        v_b0 = ftr & inter_b(if_ar)
        v_b2 = fal & inter_b(if_al)
        b_avail, b_mv = _first_inter_mv_batch([
            (v_b0, mv_ar),
            (v_b1, mv_a),
            (v_b2, mv_al),
        ])
        if tmvp:
            mvp0, mvp1 = jax.vmap(_amvp_list_t)(v_a1, mv_l, b_avail, b_mv,
                                                colok != 0, colmv)
        else:
            mvp0, mvp1 = jax.vmap(_amvp_list)(v_a1, mv_l, b_avail, b_mv)

        # merge candidate list (8.5.3.2.3 on the CTB grid): A1, B1 (pruned
        # vs A1), B0 (pruned vs B1), B2 (pruned vs A1/B1), zero-fill —
        # mirrors entropy/slice_data._merge_list_np / native merge_list_c
        K = merge_cand
        eq = lambda a, b: (a[:, 0] == b[:, 0]) & (a[:, 1] == b[:, 1])
        p_a1 = v_a1
        p_b1 = v_b1 & ~(v_a1 & eq(mv_a, mv_l))
        p_b0 = v_b0 & ~(v_b1 & eq(mv_ar, mv_a))
        p_b2 = v_b2 & ~(v_a1 & eq(mv_al, mv_l)) & ~(v_b1 & eq(mv_al, mv_a))
        i32 = lambda f: f.astype(jnp.int32)
        pos_b1 = i32(p_a1)
        pos_b0 = pos_b1 + i32(p_b1)
        pos_b2 = pos_b0 + i32(p_b0)
        zero_mv = jnp.zeros_like(mv_l)
        t_av = (colok != 0) if tmvp else jnp.zeros_like(fl)
        pos_t = pos_b2 + i32(p_b2)  # temporal: appended, never pruned
        cands = []
        for k in range(K):
            tail = jnp.where((t_av & (pos_t == k))[:, None], colmv, zero_mv) \
                if tmvp else zero_mv
            mvk = jnp.where((p_a1 & (k == 0))[:, None], mv_l,
                  jnp.where((p_b1 & (pos_b1 == k))[:, None], mv_a,
                  jnp.where((p_b0 & (pos_b0 == k))[:, None], mv_ar,
                  jnp.where((p_b2 & (pos_b2 == k))[:, None], mv_al, tail))))
            cands.append(mvk)

        # evaluate every candidate (merge_idx TR bits in the cost); ME and
        # intra costs ride in from the dense pre-pass
        oy_flat = oyw.reshape(lanes, -1)
        mcts = xtile[0] or xtile[1]
        if mcts:
            from ..ops.me import mv_valid_x
            lf, rf = xtile if xflags is None else xflags
        preds_m, costs_m = [], []
        for k in range(K):
            idx_bits = float(min(k + 1, K - 1)) if K > 1 else 0.0
            pk = mc_luma_window_batch(winy, cands[k], n, SEARCH_RANGE)
            cost_k = ck.satd_flat(pk.reshape(lanes, -1), oy_flat, 4).astype(
                jnp.float32) + lamf * (2.0 + idx_bits)
            if mcts:
                # a merge MV whose MC support crosses the tile boundary may
                # not be selected (the decoder would read the other tile)
                mok = mv_valid_x(cands[k][:, 0], xpos, n, width, lf, rf)
                cost_k = jnp.where(mok, cost_k, jnp.float32(3e18))
            preds_m.append(pk.reshape(lanes, -1))
            costs_m.append(cost_k)
        costs_s = jnp.stack(costs_m)  # (K, lanes)
        merge_idx = jnp.argmin(costs_s, axis=0).astype(jnp.int32)
        cost_merge = jnp.take_along_axis(costs_s, merge_idx[None], 0)[0]
        merge_mv = jnp.take_along_axis(
            jnp.stack(cands), merge_idx[None, :, None], 0)[0]
        pm_flat = jnp.take_along_axis(
            jnp.stack(preds_m), merge_idx[None, :, None], 0)[0]
        mvd0 = memv - mvp0
        mvd1 = memv - mvp1
        bits0 = jax.vmap(_mvd_bits)(mvd0)
        bits1 = jax.vmap(_mvd_bits)(mvd1)
        use_mvp1 = bits1 < bits0
        mvp_flag = use_mvp1.astype(jnp.int32)
        mvd = jnp.where(use_mvp1[:, None], mvd1, mvd0)
        cost_me = csme + lamf * (jnp.minimum(bits0, bits1) + 3.0)
        is_merge = cost_merge <= cost_me
        mv_sel = jnp.where(is_merge[:, None], merge_mv, memv)
        pred_inter = jnp.where(is_merge[:, None], pm_flat,
                               pme.reshape(lanes, -1).astype(jnp.int32))
        use_intra = icost_w < jnp.minimum(cost_merge, cost_me)

        # intra prediction at the pre-decided mode (recon boundaries);
        # the mode came from the P_PREPASS_MODES subset, so only those
        # modes are predicted per wave (3.2x less than all 35)
        a_y = intra_ops.substitute_refs_ctb(_ring_boundary(*ry, n), fl, fa, ftr, n)
        preds = ck.predict_modes_subset_flat(a_y, 4, True, P_PREPASS_MODES)
        isel = jnp.asarray(_PREPASS_INV)[imode_w]
        pred_intra = jnp.take_along_axis(preds, isel[:, None, None], 1)[:, 0]

        pred_y = jnp.where(use_intra[:, None], pred_intra, pred_inter)
        coef = ck.fwd_transform_flat(oy_flat - pred_y, 4)
        if rdoq:
            lev_y = quantize_rdoq(coef, qpw, 4, lam2, use_intra)
        else:
            lev_y = quantize(coef, qpw, 4, use_intra)
        deq = dequantize(lev_y, qpw, 4)
        rec_y = jnp.clip(pred_y + ck.inv_transform_flat(deq, 4), 0, 255)

        outs_c = []
        recs_c = []
        m = n // 2
        for ring_c, ocw, winc in ((ru, ouw, winu), (rv, ovw, winv)):
            a_c = intra_ops.substitute_refs_ctb(
                _ring_boundary(*ring_c, m), fl, fa, ftr, m)
            preds_c = ck.predict_modes_subset_flat(a_c, 3, False, P_PREPASS_MODES)
            pred_ci = jnp.take_along_axis(preds_c, isel[:, None, None], 1)[:, 0]
            pred_cm = mc_chroma_window_batch(winc, mv_sel, m, SEARCH_RANGE)
            pred_c = jnp.where(use_intra[:, None], pred_ci,
                               pred_cm.reshape(lanes, -1))
            oc_flat = ocw.reshape(lanes, -1)
            coef_c = ck.fwd_transform_flat(oc_flat - pred_c, 3)
            if rdoq:
                lev_c = quantize_rdoq(coef_c, qpcw, 3, lam2, use_intra)
            else:
                lev_c = quantize(coef_c, qpcw, 3, use_intra)
            deq_c = dequantize(lev_c, qpcw, 3)
            rec_c = jnp.clip(pred_c + ck.inv_transform_flat(deq_c, 3), 0, 255)
            outs_c.append(lev_c)
            recs_c.append(rec_c)

        zero_resid = (jnp.all(lev_y == 0, axis=-1)
                      & jnp.all(outs_c[0] == 0, axis=-1)
                      & jnp.all(outs_c[1] == 0, axis=-1))
        ctype = jnp.where(
            use_intra, CT_INTRA,
            jnp.where(is_merge, jnp.where(zero_resid, CT_SKIP, CT_MERGE),
                      CT_AMVP)).astype(jnp.int32)

        ry = _ring_push(ry, rec_y.reshape(lanes, n, n)[:, n - 1, :],
                        rec_y.reshape(lanes, n, n)[:, :, n - 1])
        ru = _ring_push(ru, recs_c[0].reshape(lanes, m, m)[:, m - 1, :],
                        recs_c[0].reshape(lanes, m, m)[:, :, m - 1])
        rv = _ring_push(rv, recs_c[1].reshape(lanes, m, m)[:, m - 1, :],
                        recs_c[1].reshape(lanes, m, m)[:, :, m - 1])
        mv_ring = jnp.concatenate([mv_sel[None], mv_ring[:2]], axis=0)
        newif = jnp.broadcast_to((ctype != CT_INTRA).astype(jnp.int32)[:, None],
                                 (lanes, 1))
        if_ring = jnp.concatenate([newif[None], if_ring[:2]], axis=0)

        out = (ctype, mv_sel, mvp_flag, mvd, merge_idx,
               lev_y.astype(jnp.int16), outs_c[0].astype(jnp.int16),
               outs_c[1].astype(jnp.int16), rec_y.astype(jnp.uint8),
               recs_c[0].astype(jnp.uint8), recs_c[1].astype(jnp.uint8))
        return (ry, ru, rv, mv_ring, if_ring), out

    carry0 = (ring0(n), ring0(n // 2), ring0(n // 2),
              jnp.zeros((3, lanes, 2), jnp.int32),
              jnp.zeros((3, lanes, 1), jnp.int32))
    _, (ct_w, mv_w, mf_w, mvd_w, mi_w, lev_y_w, lev_cb_w, lev_cr_w, rec_y_w,
        rec_cb_w, rec_cr_w) = jax.lax.scan(wave, carry0, xs,
                                           unroll=WAVE_UNROLL)

    w2r = lambda o: wave_to_raster(sched, o)
    m = n // 2
    blk = lambda o, s: w2r(o).reshape(nctu, s, s)
    return {
        "ctype": w2r(ct_w),
        "intra_mode": imode,
        "mv": w2r(mv_w),
        "mvp_flag": w2r(mf_w),
        "mvd": w2r(mvd_w),
        "merge_idx": w2r(mi_w),
        "lev_y": blk(lev_y_w, n),
        "lev_cb": blk(lev_cb_w, m),
        "lev_cr": blk(lev_cr_w, m),
        "recon_y": from_blocks(blk(rec_y_w, n).astype(jnp.int32), height,
                               width).astype(jnp.uint8),
        "recon_u": from_blocks(blk(rec_cb_w, m).astype(jnp.int32), height // 2,
                               width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk(rec_cr_w, m).astype(jnp.int32), height // 2,
                               width // 2).astype(jnp.uint8),
    }


def _encode_ctu_p_wave(
    blk_y, blk_u, blk_v, mvs, inter_flags, wins, oyw, ouw, ovw,
    rs, cs, cand_a_mode, me_mv, qp, qp_c, lam, geom, rdoq=True,
):
    """Batched P-slice wave compute: per-lane MC slices lane-private
    reference windows, all heavy kernels (intra sweep, SATD, transforms)
    as flat MXU batches.  Decision logic identical to _encode_ctu_p."""
    from ..ops import ctu_kernels as ck
    from ..ops.mc import mc_chroma_window_batch, mc_luma_window_batch
    from .frame_intra import _mode_bits_table

    win_y, win_u, win_v = wins
    n = 16
    cw, ch, width, height = geom
    lanes = rs.shape[0]

    def lane_nb(r, c, memv):
        idx = r * cw + c
        avail_l = c > 0
        avail_a = r > 0
        avail_ar = avail_a & (c + 1 < cw)
        avail_al = avail_a & avail_l
        clampi = lambda i: jnp.clip(i, 0, cw * ch - 1)
        nb = lambda off: (mvs[clampi(idx + off)], inter_flags[clampi(idx + off)])
        mv_l, int_l = nb(-1)
        mv_a, int_a = nb(-cw)
        mv_ar, int_ar = nb(-cw + 1)
        mv_al, int_al = nb(-cw - 1)
        _, merge_mv = _first_inter_mv(
            [(avail_l & int_l, mv_l), (avail_a & int_a, mv_a),
             (avail_ar & int_ar, mv_ar), (avail_al & int_al, mv_al)]
        )
        b_avail, b_mv = _first_inter_mv(
            [(avail_ar & int_ar, mv_ar), (avail_a & int_a, mv_a), (avail_al & int_al, mv_al)]
        )
        mvp0, mvp1 = _amvp_list(avail_l & int_l, mv_l, b_avail, b_mv)
        return merge_mv, mvp0, mvp1

    merge_mv, mvp0, mvp1 = jax.vmap(lane_nb)(rs, cs, me_mv)
    # gather-free batched MC: one-hot select matmuls over lane-private windows
    pred_merge = mc_luma_window_batch(win_y, merge_mv, n, SEARCH_RANGE)
    pred_me = mc_luma_window_batch(win_y, me_mv, n, SEARCH_RANGE)

    # intra sweep (flat kernels)
    a_raw, avail = jax.vmap(
        _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
    )(blk_y, rs, cs, n, cw, ch, width)
    a = intra_ops.substitute_refs(a_raw, avail)
    preds = ck.predict_all_modes_flat(a, 4, True)
    oy_flat = oyw.reshape(lanes, n * n)
    cost35 = ck.satd_flat(preds, oy_flat[:, None, :], 4).astype(jnp.float32)
    ibits = jax.vmap(_mode_bits_table)(jnp.where(cs > 0, cand_a_mode, 1))
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (lanes,))
    costs = cost35 + lam[:, None] * ibits
    intra_mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
    cost_intra = jnp.take_along_axis(costs, intra_mode[:, None], 1)[:, 0] + lam * 3.0
    pred_intra = jnp.take_along_axis(preds, intra_mode[:, None, None], 1)[:, 0]

    # inter costs
    pm_flat = pred_merge.reshape(lanes, -1)
    pe_flat = pred_me.reshape(lanes, -1)
    cost_merge = ck.satd_flat(pm_flat, oy_flat, 4).astype(jnp.float32) + lam * 2.0
    mvd0 = me_mv - mvp0
    mvd1 = me_mv - mvp1
    bits0 = jax.vmap(_mvd_bits)(mvd0)
    bits1 = jax.vmap(_mvd_bits)(mvd1)
    use_mvp1 = bits1 < bits0
    mvp_flag = use_mvp1.astype(jnp.int32)
    mvd = jnp.where(use_mvp1[:, None], mvd1, mvd0)
    cost_me = ck.satd_flat(pe_flat, oy_flat, 4).astype(jnp.float32) + lam * (
        jnp.minimum(bits0, bits1) + 3.0
    )
    is_merge = cost_merge <= cost_me
    mv_sel = jnp.where(is_merge[:, None], merge_mv, me_mv)
    pred_inter = jnp.where(is_merge[:, None], pm_flat, pe_flat)
    cost_inter = jnp.minimum(cost_merge, cost_me)

    use_intra = cost_intra < cost_inter
    pred_y = jnp.where(use_intra[:, None], pred_intra, pred_inter)

    def code_flat(orig, pred, q, log2):
        coef = ck.fwd_transform_flat(orig - pred, log2)
        # deadzone offset is mode-dependent (intra 171/512, inter 85/512);
        # the flag rides as a traced per-lane array -> ONE quant pass
        if rdoq:
            lev = quantize_rdoq(coef, q, log2, lam * lam, use_intra)
        else:
            lev = quantize(coef, q, log2, use_intra)
        deq = dequantize(lev, q, log2)
        rec = jnp.clip(pred + ck.inv_transform_flat(deq, log2), 0, 255)
        return lev, rec

    lev_y, rec_y = code_flat(oy_flat, pred_y, qp, 4)

    chroma = []
    for blk_c, ocw, win_c in ((blk_u, ouw, win_u), (blk_v, ovw, win_v)):
        a_raw_c, avail_c = jax.vmap(
            _gather_refs_blocks, in_axes=(None, 0, 0, None, None, None, None)
        )(blk_c, rs, cs, n // 2, cw, ch, width // 2)
        ac = intra_ops.substitute_refs(a_raw_c, avail_c)
        preds_c = ck.predict_all_modes_flat(ac, 3, False)
        pred_ci = jnp.take_along_axis(preds_c, intra_mode[:, None, None], 1)[:, 0]
        # one chroma MC at the SELECTED MV from the lane-private window
        pred_cm = mc_chroma_window_batch(win_c, mv_sel, n // 2, SEARCH_RANGE)
        pred_cm = pred_cm.reshape(lanes, -1)
        pred_c = jnp.where(use_intra[:, None], pred_ci, pred_cm)
        chroma.append(code_flat(ocw.reshape(lanes, -1), pred_c, qp_c, 3))
    (lev_cb, rec_cb), (lev_cr, rec_cr) = chroma

    zero_resid = (
        jnp.all(lev_y == 0, axis=-1)
        & jnp.all(lev_cb == 0, axis=-1)
        & jnp.all(lev_cr == 0, axis=-1)
    )
    ctype = jnp.where(
        use_intra,
        CT_INTRA,
        jnp.where(is_merge, jnp.where(zero_resid, CT_SKIP, CT_MERGE), CT_AMVP),
    ).astype(jnp.int32)

    sq = lambda x, s: x.reshape(lanes, s, s)
    return dict(
        ctype=ctype,
        intra_mode=intra_mode,
        mv=mv_sel,
        mvp_flag=mvp_flag,
        mvd=mvd,
        lev_y=sq(lev_y, n),
        lev_cb=sq(lev_cb, n // 2),
        lev_cr=sq(lev_cr, n // 2),
        rec_y=sq(rec_y, n),
        rec_cb=sq(rec_cb, n // 2),
        rec_cr=sq(rec_cr, n // 2),
    )


def _wave_impl(carry, x, *, cw, ch, nctu, geom, rdoq=True):
    (blk_y, blk_u, blk_v, modes, mvs, inter_flags) = carry
    oyw, ouw, ovw, memvw, winyw, winuw, winvw, qpw, qpcw, lamw, rs, cs, valid, idx = x
    # 8.4.2: an inter-coded left neighbor contributes DC to the MPM list
    left_i = jnp.maximum(idx - 1, 0)
    cand_a_mode = jnp.where(inter_flags[left_i], 1, modes[left_i])

    out = _encode_ctu_p_wave(
        blk_y, blk_u, blk_v, mvs, inter_flags, (winyw, winuw, winvw),
        oyw, ouw, ovw, rs, cs, cand_a_mode, memvw,
        qpw, qpcw, lamw, geom, rdoq=rdoq,
    )

    out_idx = jnp.where(valid, idx, nctu)
    st = lambda arr, vals: arr.at[out_idx].set(vals, mode="drop")
    blk_y = st(blk_y, out["rec_y"])
    blk_u = st(blk_u, out["rec_cb"])
    blk_v = st(blk_v, out["rec_cr"])
    modes = st(modes, out["intra_mode"])
    mvs = st(mvs, out["mv"])
    inter_flags = st(inter_flags, out["ctype"] != CT_INTRA)
    stacked = {k: out[k] for k in
               ("ctype", "intra_mode", "mv", "mvp_flag", "mvd", "lev_y", "lev_cb", "lev_cr")}
    return (blk_y, blk_u, blk_v, modes, mvs, inter_flags), stacked
