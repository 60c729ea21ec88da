"""Device-native CTB-32 CU-quadtree intra encoder.

The TPU re-design of kvazaar's depth-0/1 CU search at CTB32 (reference:
kvazaar `search.c` CU recursion, exposed through
/root/reference/src/media/processing/kvazaarfilter.cpp's ctu-size config):
instead of the host-sequential recursion in cu32.py, the CU32-vs-4xCU16
decision is made DENSELY for every CTB from original-pixel boundaries
(the same orig-ref approximation kvazaar's own mode search uses), and a
ring-carry wavefront over the 32-grid then performs only normative
reconstruction — the CU32 leaf and the four CU16 leaves are coded
in-step (z-order, true recon boundaries) and the pre-decided split flag
selects which recon/levels survive.

Wave geometry: schedule_r over (W/32, H/32) — HALF the scan steps of the
CTB16 wave at the same picture size (2*ch+cw-2 with ch,cw halved), which
matters because the full-frame paths are step-latency bound
(BENCH_NOTES speed-of-light audit).

Output trees are the cu32.py format, so entropy/quad.py, the generic
decoder tier, and quad_bs_maps consume them unchanged; streams stay
bit-exact under the libavcodec oracle (tests/test_intra32_device.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from .frame_intra import (
    _avail_flags,
    _code_flat_sel,
    _mode_bits_table,
    _orig_boundaries,
    _ring_boundary,
    _ring_push,
    from_blocks,
    to_blocks,
    wave_inputs,
    wave_to_raster,
)
from .frame_intra import QUAD_UNROLL
from .wavefront import schedule_r

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))  # (dy, dx) quadrants in z-order


def _rd_prepass_grid(yp, oyb, qp, lam, *, log2: int, cw: int, ch: int, K: int = 3,
                     bd: int = 8):
    """Orig-boundary intra mode + RD estimate on an n=2^log2 block grid.

    The intra_mode_prepass shape generalized over block size and returning
    the winning RD cost (SSE + lambda^2 * (level bits + mode bits)) so the
    split decision can compare levels of the quadtree."""
    from ..ops import ctu_kernels as ck

    n = 1 << log2
    nb = cw * ch
    fl, fa, ftr = _avail_flags(cw, ch)
    flj = jnp.asarray(fl.reshape(-1))
    a_raw = _orig_boundaries(yp, n, cw, ch)
    a = intra_ops.substitute_refs_ctb(
        a_raw, flj, jnp.asarray(fa.reshape(-1)), jnp.asarray(ftr.reshape(-1)), n,
        bd=bd)
    preds = ck.predict_all_modes_flat(a, log2, True, bd=bd)
    oy_flat = oyb.reshape(nb, n * n)
    satd = ck.satd_flat(preds, oy_flat[:, None, :], log2).astype(jnp.float32)
    mode0 = jnp.argmin(satd, axis=1).astype(jnp.int32)
    left0 = jnp.roll(mode0.reshape(ch, cw), 1, axis=1).reshape(-1)
    cand_a = jnp.where(flj, left0, 1)
    bits = jax.vmap(_mode_bits_table)(cand_a)
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (nb,))
    cost = satd + lam[:, None] * bits
    _, cand = jax.lax.top_k(-cost, K)
    cand_preds = jnp.take_along_axis(preds, cand[:, :, None], axis=1)
    coef = ck.fwd_transform_flat(oy_flat[:, None, :] - cand_preds, log2, bd=bd)
    qpb = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nb,))
    lev = quantize(coef, qpb, log2, True, bd=bd)
    deq = dequantize(lev, qpb, log2, bd=bd)
    rec = jnp.clip(cand_preds + ck.inv_transform_flat(deq, log2, bd=bd), 0,
                   (1 << bd) - 1)
    sse = jnp.sum((rec - oy_flat[:, None, :]) ** 2, axis=-1).astype(jnp.float32)
    lev_bits = jnp.sum(
        jnp.where(lev != 0,
                  2.0 * jnp.log2(jnp.abs(lev).astype(jnp.float32) + 1.0) + 1.0,
                  0.0),
        axis=-1)
    lam2 = (lam * lam)[:, None]
    rd = sse + lam2 * (lev_bits + jnp.take_along_axis(bits, cand, axis=1))
    best_k = jnp.argmin(rd, axis=1)
    mode = jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32)
    rd_best = jnp.take_along_axis(rd, best_k[:, None], 1)[:, 0]
    return mode, rd_best


def _subst_quad(bl, l, c, t, tr, f_bl, f_l, f_c, f_t, f_tr, bd: int = 8):
    """Reference substitution (8.4.4.2.2) with whole-SEGMENT availability.

    Segments in walk order: below-left (L,n), left (L,n), corner (L,1),
    top (L,n), top-right (L,n); flags (L,) bool per segment.  Forward fill
    at segment granularity: unavailable segments take the running carry
    (top of the last available segment), segments before the first
    available one take the first available sample; none -> 1<<(bd-1)."""
    mid = jnp.full_like(c, 1 << (bd - 1))
    e = lambda f: f[:, None]
    fv = jnp.where(e(f_bl), bl[:, :1],
         jnp.where(e(f_l), l[:, :1],
         jnp.where(e(f_c), c,
         jnp.where(e(f_t), t[:, :1],
         jnp.where(e(f_tr), tr[:, :1], mid)))))
    blf = jnp.where(e(f_bl), bl, fv)
    carry = jnp.where(e(f_bl), bl[:, -1:], fv)
    lf = jnp.where(e(f_l), l, carry)
    carry = jnp.where(e(f_l), l[:, -1:], carry)
    cf = jnp.where(e(f_c), c, carry)
    carry = jnp.where(e(f_c), c, carry)
    tf = jnp.where(e(f_t), t, carry)
    carry = jnp.where(e(f_t), t[:, -1:], carry)
    trf = jnp.where(e(f_tr), tr, carry)
    return jnp.concatenate([blf, lf, cf, tf, trf], axis=-1)


def _pred_sel(ck, a, log2: int, is_luma: bool, mode):
    """Predict all modes from substituted walk `a`, select per-lane `mode`."""
    preds = ck.predict_all_modes_flat(a, log2, is_luma)
    return jnp.take_along_axis(preds, mode[:, None, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq"))
def encode_frame_intra32_fast(y, u, v, qp, *, width: int, height: int,
                              rdoq: bool = False):
    """Dense-decision CTB32 quadtree intra encode (ring-carry 32-wave).

    qp: scalar OR a per-CTU (nctb,) int32 vector (the cu_qp_delta/ROI
    hook — QG == CTB, so one QP per CTB is the full signalable space).
    Returns dict(split (nctb,) int32, mode32 (nctb,), modes16 (nctb,4)
    z-order, lev_y (nctb,1024), lev_cb/lev_cr (nctb,256) int16 — the
    SELECTED leaf's levels (CU32 raster or 4x CU16 z-order concatenated) —
    plus recon planes)."""
    from ..core.tables import CHROMA_QP_TABLE
    from ..ops import ctu_kernels as ck

    n = 32
    cw, ch = width // n, height // n
    nctb = cw * ch
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

    # per-block expansion of the CTU grid onto the 16-grid (raster)
    rep2 = lambda a: jnp.repeat(
        jnp.repeat(a.reshape(ch, cw), 2, 0), 2, 1).reshape(-1)

    # ---- dense prepass: modes at both levels + split decision
    oy16 = to_blocks(yi, 16)
    mode16, rd16 = _rd_prepass_grid(yi, oy16, rep2(qpb), rep2(lam), log2=4,
                                    cw=2 * cw, ch=2 * ch)
    mode32, rd32 = _rd_prepass_grid(yi, oy32, qpb, lam, log2=5,
                                    cw=cw, ch=ch)
    # quadrant gather: 16-grid raster (2ch, 2cw) -> (nctb, 4) z-order
    m16 = mode16.reshape(2 * ch, 2 * cw)
    r16 = rd16.reshape(2 * ch, 2 * cw)
    quad = lambda a2: jnp.stack(
        [a2[dy::2, dx::2].reshape(-1) for dy, dx in _ZO], axis=1)
    modes16 = quad(m16)                       # (nctb, 4)
    rd16_sum = jnp.sum(quad(r16), axis=1)     # (nctb,)
    lam2v = lam * lam
    # split_cu_flag + 4 sub split flags on the split side vs 1 flag leaf side
    split = (rd16_sum + lam2v * 5.0 < rd32 + lam2v * 1.0).astype(jnp.int32)

    # ---- wave inputs over the 32-grid
    (oy_w, ou_w, ov_w, m32_w, m16_w, sp_w, qp_w, qpc_w, lam_w) = wave_inputs(
        sched, nctb, [oy32, ou16, ov16, mode32, modes16, split, qpb, qp_c, lam])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    xs = (oy_w, ou_w, ov_w, m32_w, m16_w, sp_w, qp_w, qpc_w, lam_w,
          fl_w, fa_w, ftr_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    def _quad_leaf(ck_, o_flat, walk, mode, q, log2c, lam2):
        # noqa: closes over rdoq
        a = walk
        pred = _pred_sel(ck_, a, log2c, log2c >= 4, mode)
        return _code_flat_sel(ck_, o_flat, pred, q, log2c, lam2, rdoq)

    def wave(carry, x):
        ry, ru, rv = carry
        (oyw, ouw, ovw, m32, m16z, spl, qpw, qpcw, lamw, fl, fa, ftr) = x
        lam2 = (lamw * lamw).astype(jnp.float32)
        tru = jnp.ones_like(fl)
        fls = jnp.zeros_like(fl)

        # ---------- CU32 leaf (TU32 luma + TU16 chroma, DM)
        a32 = intra_ops.substitute_refs_ctb(_ring_boundary(*ry, n), fl, fa, ftr, n)
        pred32 = _pred_sel(ck, a32, 5, True, m32)
        lev32, rec32 = _code_flat_sel(ck, oyw.reshape(lanes, -1), pred32,
                                      qpw, 5, lam2, rdoq)
        a32u = intra_ops.substitute_refs_ctb(
            _ring_boundary(*ru, n // 2), fl, fa, ftr, n // 2)
        a32v = intra_ops.substitute_refs_ctb(
            _ring_boundary(*rv, n // 2), fl, fa, ftr, n // 2)
        predu32 = _pred_sel(ck, a32u, 4, False, m32)
        predv32 = _pred_sel(ck, a32v, 4, False, m32)
        levu32, recu32 = _code_flat_sel(ck, ouw.reshape(lanes, -1), predu32,
                                        qpcw, 4, lam2, rdoq)
        levv32, recv32 = _code_flat_sel(ck, ovw.reshape(lanes, -1), predv32,
                                        qpcw, 4, lam2, rdoq)

        # ---------- 4x CU16 leaves, z-order with in-step recon boundaries
        Lcol = ry[1][0]                  # (L,32) left CTB right column, top-down
        Trow = shift1(ry[0][1])          # above CTB bottom row
        TRrow = shift1(ry[0][0])         # above-right CTB bottom row
        Cpix = shift1(ry[0][2])[:, n - 1 : n]  # above-left CTB corner sample
        LcolU, TrowU = ru[1][0], shift1(ru[0][1])
        TRrowU, CpixU = shift1(ru[0][0]), shift1(ru[0][2])[:, n // 2 - 1 : n // 2]
        LcolV, TrowV = rv[1][0], shift1(rv[0][1])
        TRrowV, CpixV = shift1(rv[0][0]), shift1(rv[0][2])[:, n // 2 - 1 : n // 2]

        oyq = oyw  # (L,32,32)
        recs, levs = [], []
        recs_u, levs_u, recs_v, levs_v = [], [], [], []
        for qi, (dy, dx) in enumerate(_ZO):
            m = m16z[:, qi]
            ys, xs_ = dy * 16, dx * 16
            o16 = oyq[:, ys : ys + 16, xs_ : xs_ + 16].reshape(lanes, -1)
            z16 = jnp.zeros((lanes, 16), jnp.int32)
            if qi == 0:  # TL
                walk = _subst_quad(
                    Lcol[:, 16:32][:, ::-1], Lcol[:, 0:16][:, ::-1], Cpix,
                    Trow[:, :16], Trow[:, 16:32],
                    fl, fl, fl & fa, fa, fa)
            elif qi == 1:  # TR
                walk = _subst_quad(
                    z16, recs[0][:, :, 15][:, ::-1], Trow[:, 15:16],
                    Trow[:, 16:32], TRrow[:, :16],
                    fls, tru, fa, fa, ftr)
            elif qi == 2:  # BL
                walk = _subst_quad(
                    z16, Lcol[:, 16:32][:, ::-1], Lcol[:, 15:16],
                    recs[0][:, 15, :], recs[1][:, 15, :],
                    fls, fl, fl, tru, tru)
            else:  # BR
                walk = _subst_quad(
                    z16, recs[2][:, :, 15][:, ::-1], recs[0][:, 15:16, 15],
                    recs[1][:, 15, :], z16,
                    fls, tru, tru, tru, fls)
            lev16, rec16 = _quad_leaf(ck, o16, walk, m, qpw, 4, lam2)
            recs.append(rec16.reshape(lanes, 16, 16))
            levs.append(lev16)

            # chroma TU8 (DM), same class geometry at half scale
            z8 = jnp.zeros((lanes, 8), jnp.int32)
            for (Lc, Tc, TRc, Cc, oc, rc_list, lv_list) in (
                (LcolU, TrowU, TRrowU, CpixU, ouw, recs_u, levs_u),
                (LcolV, TrowV, TRrowV, CpixV, ovw, recs_v, levs_v),
            ):
                o8 = oc[:, dy * 8 : dy * 8 + 8, dx * 8 : dx * 8 + 8]
                o8 = o8.reshape(lanes, -1)
                if qi == 0:
                    wk = _subst_quad(
                        Lc[:, 8:16][:, ::-1], Lc[:, 0:8][:, ::-1], Cc,
                        Tc[:, :8], Tc[:, 8:16], fl, fl, fl & fa, fa, fa)
                elif qi == 1:
                    wk = _subst_quad(
                        z8, rc_list[0][:, :, 7][:, ::-1], Tc[:, 7:8],
                        Tc[:, 8:16], TRc[:, :8], fls, tru, fa, fa, ftr)
                elif qi == 2:
                    wk = _subst_quad(
                        z8, Lc[:, 8:16][:, ::-1], Lc[:, 7:8],
                        rc_list[0][:, 7, :], rc_list[1][:, 7, :],
                        fls, fl, fl, tru, tru)
                else:
                    wk = _subst_quad(
                        z8, rc_list[2][:, :, 7][:, ::-1], rc_list[0][:, 7:8, 7],
                        rc_list[1][:, 7, :], z8, fls, tru, tru, tru, fls)
                lev8, rec8 = _quad_leaf(ck, o8, wk, m, qpcw, 3, lam2)
                rc_list.append(rec8.reshape(lanes, 8, 8))
                lv_list.append(lev8)

        cat2 = lambda a, b: jnp.concatenate([a, b], axis=2)
        cat1 = lambda a, b: jnp.concatenate([a, b], axis=1)
        rec_split = cat1(cat2(recs[0], recs[1]), cat2(recs[2], recs[3]))
        recu_split = cat1(cat2(recs_u[0], recs_u[1]), cat2(recs_u[2], recs_u[3]))
        recv_split = cat1(cat2(recs_v[0], recs_v[1]), cat2(recs_v[2], recs_v[3]))

        sb = (spl != 0)[:, None]
        lev_y = jnp.where(sb, jnp.concatenate(levs, axis=1), lev32)
        lev_cb = jnp.where(sb, jnp.concatenate(levs_u, axis=1), levu32)
        lev_cr = jnp.where(sb, jnp.concatenate(levs_v, axis=1), levv32)
        sb3 = (spl != 0)[:, None, None]
        rec_y = jnp.where(sb3, rec_split, rec32.reshape(lanes, n, n))
        rec_u = jnp.where(sb3, recu_split, recu32.reshape(lanes, n // 2, n // 2))
        rec_v = jnp.where(sb3, recv_split, recv32.reshape(lanes, n // 2, n // 2))

        ry = _ring_push(ry, rec_y[:, n - 1, :], rec_y[:, :, n - 1])
        ru = _ring_push(ru, rec_u[:, n // 2 - 1, :], rec_u[:, :, n // 2 - 1])
        rv = _ring_push(rv, rec_v[:, n // 2 - 1, :], rec_v[:, :, n // 2 - 1])
        out = (lev_y.astype(jnp.int16), lev_cb.astype(jnp.int16),
               lev_cr.astype(jnp.int16), rec_y.astype(jnp.uint8),
               rec_u.astype(jnp.uint8), rec_v.astype(jnp.uint8))
        return (ry, ru, rv), out

    carry0 = (ring0(n), ring0(n // 2), ring0(n // 2))
    _, (lev_y_w, lev_cb_w, lev_cr_w, rec_y_w, rec_u_w, rec_v_w) = jax.lax.scan(
        wave, carry0, xs, unroll=QUAD_UNROLL)

    w2r = lambda o: wave_to_raster(sched, o)
    m = n // 2
    rec_y = w2r(rec_y_w).reshape(nctb, n, n).astype(jnp.int32)
    rec_u = w2r(rec_u_w).reshape(nctb, m, m).astype(jnp.int32)
    rec_v = w2r(rec_v_w).reshape(nctb, m, m).astype(jnp.int32)
    return {
        "split": split,
        "mode32": mode32,
        "modes16": modes16,
        "lev_y": w2r(lev_y_w),
        "lev_cb": w2r(lev_cb_w),
        "lev_cr": w2r(lev_cr_w),
        "recon_y": from_blocks(rec_y, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(rec_u, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(rec_v, height // 2, width // 2).astype(jnp.uint8),
    }


def quad_trees_from_device(out, width: int, height: int):
    """Assemble cu32.py-format decision trees from the device outputs so
    entropy/quad.py and quad_bs_maps consume the device encode unchanged."""
    cw, ch = width // 32, height // 32
    nctb = cw * ch
    split = np.asarray(out["split"]).reshape(-1)
    mode32 = np.asarray(out["mode32"]).reshape(-1)
    modes16 = np.asarray(out["modes16"]).reshape(nctb, 4)
    lev_y = np.asarray(out["lev_y"], np.int32).reshape(nctb, -1)
    lev_cb = np.asarray(out["lev_cb"], np.int32).reshape(nctb, -1)
    lev_cr = np.asarray(out["lev_cr"], np.int32).reshape(nctb, -1)
    trees = []
    for i in range(nctb):
        if split[i]:
            ly = lev_y[i].reshape(4, 16, 16)
            lb = lev_cb[i].reshape(4, 8, 8)
            lr = lev_cr[i].reshape(4, 8, 8)
            sub = [
                dict(size=16, part=0, modes=[int(modes16[i, z])],
                     lev_y=ly[z], lev_cb=lb[z], lev_cr=lr[z])
                for z in range(4)
            ]
            trees.append(dict(size=32, split=sub))
        else:
            trees.append(dict(size=32, part=0, modes=[int(mode32[i])],
                              lev_y=lev_y[i].reshape(32, 32),
                              lev_cb=lev_cb[i].reshape(16, 16),
                              lev_cr=lev_cr[i].reshape(16, 16)))
    return trees
