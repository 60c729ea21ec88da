"""Device-native CTB-64 CU-quadtree intra encoder (depth 0..2: CU64/32/16).

kvazaar's DEFAULT CTU size (--ctu 64, kvazaarfilter.cpp config surface)
as a TPU wavefront: the deepest extension of frame_intra32.py.  A dense
orig-boundary prepass decides the full split tree (split64 + per-
quadrant split32) and every mode; the ring-carry wave over the 64-grid
(2*ch+cw-2 steps — 62 at 1080p vs 254 for the CTB16 wave) then runs
normative reconstruction only.  Each step codes, per lane, BOTH the
CU64 leaf (one mode, transform tree force-split to four TU32s +
per-quadrant TU16 chroma, 7.3.8.8 log2TrafoSize > MaxTbLog2SizeY) and
the split path (4x [CU32 leaf | 4x CU16], z-order on a per-lane recon
canvas), selecting by the pre-decided flags.

Boundary walks come from a generic z-scan segment builder (_seg_spec):
each unit's five walk segments resolve statically to ring slices,
canvas slices, or unavailable, with availability by the 6.4.1 z-scan
order — so ALL 21 sequential units share one code path.

Trees are the cu32.py format; entropy/quad.py (which already codes CU64
forced-TT leaves), quad_bs_maps, and the generic decoder tier consume
them unchanged; bit-exact under the libavcodec oracle
(tests/test_intra64_device.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from .frame_intra import (
    QUAD_UNROLL,
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
from .frame_intra32 import _rd_prepass_grid, _subst_quad
from .wavefront import schedule_r

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))


def _z(x: int, y: int) -> int:
    """Morton index of the 4x4 cell containing (x, y) within its CTB."""
    cx, cy = x >> 2, y >> 2
    m = 0
    for k in range(8):
        m |= ((cx >> k) & 1) << (2 * k)
        m |= ((cy >> k) & 1) << (2 * k + 1)
    return m


def _seg_spec(x0: int, y0: int, n: int, S: int):
    """Static walk-segment sources for a unit at (x0, y0, n) inside an
    S-sized CTB.  Returns per segment (below-left, left, corner, top,
    top-right) a (source, flag) pair; source is a tag tuple resolved by
    `_unit_walk`, flag is True/False or one of 'fl'/'fa'/'ftr'/'fal'.
    Availability follows the z-scan rule (6.4.1) inside the CTB and the
    CTB-grid neighbor flags across CTB edges."""
    zcur = _z(x0, y0)
    # left column
    if x0 == 0:
        left = (("L", y0), "fl")
        if y0 + 2 * n <= S:
            bl = (("L", y0 + n), "fl")
        else:
            bl = (("Z",), False)
    else:
        left = (("CCOL", x0 - 1, y0), True)
        if y0 + 2 * n <= S and _z(x0 - 1, y0 + n) < zcur:
            bl = (("CCOL", x0 - 1, y0 + n), True)
        else:
            bl = (("Z",), False)
    # corner
    if x0 == 0 and y0 == 0:
        corner = (("CPIX",), "fal")
    elif x0 == 0:
        corner = (("LPX", y0 - 1), "fl")
    elif y0 == 0:
        corner = (("TPX", x0 - 1), "fa")
    else:
        corner = (("CPX", y0 - 1, x0 - 1), True)
    # top row
    if y0 == 0:
        top = (("T", x0), "fa")
    else:
        top = (("CROW", y0 - 1, x0), True)
    # top-right
    if y0 == 0:
        if x0 + 2 * n <= S:
            tr = (("T", x0 + n), "fa")
        elif x0 + n == S:
            tr = (("TR", 0), "ftr")
        else:
            tr = (("Z",), False)
    else:
        if x0 + 2 * n <= S and _z(x0 + n, y0 - 1) < zcur:
            tr = (("CROW", y0 - 1, x0 + n), True)
        else:
            tr = (("Z",), False)
    return bl, left, corner, top, tr


def _unit_walk(canvas, rings, spec, n, flags, bd: int = 8):
    """Materialize a unit's substituted boundary walk.

    canvas: (L, S, S) in-step recon canvas; rings: dict with Lcol (L, S),
    Trow (L, S), TRrow (L, S), Cpix (L, 1); spec from _seg_spec; flags:
    dict fl/fa/ftr/fal -> (L,) bool plus True/False resolved to
    constants."""
    L = canvas.shape[0]
    tru = flags["fl"] | True  # (L,) all-True with the right shape
    fls = flags["fl"] & False

    def fvec(f):
        if f is True:
            return tru
        if f is False:
            return fls
        return flags[f]

    def seg(src, ln):
        tag = src[0]
        if tag == "Z":
            return jnp.zeros((L, ln), jnp.int32)
        if tag == "L":       # ring left column rows src[1].., bottom-up
            r0 = src[1]
            return rings["Lcol"][:, r0 : r0 + ln][:, ::-1]
        if tag == "T":
            c0 = src[1]
            return rings["Trow"][:, c0 : c0 + ln]
        if tag == "TR":
            c0 = src[1]
            return rings["TRrow"][:, c0 : c0 + ln]
        if tag == "CCOL":    # canvas column x at rows y.., bottom-up
            x, r0 = src[1], src[2]
            return canvas[:, r0 : r0 + ln, x][:, ::-1]
        if tag == "CROW":
            y, c0 = src[1], src[2]
            return canvas[:, y, c0 : c0 + ln]
        raise AssertionError(tag)

    def px(src):
        tag = src[0]
        if tag == "CPIX":
            return rings["Cpix"]
        if tag == "LPX":
            return rings["Lcol"][:, src[1] : src[1] + 1]
        if tag == "TPX":
            return rings["Trow"][:, src[1] : src[1] + 1]
        if tag == "CPX":
            return canvas[:, src[1], src[2] : src[2] + 1]
        raise AssertionError(tag)

    (bl_s, bl_f), (l_s, l_f), (c_s, c_f), (t_s, t_f), (tr_s, tr_f) = spec
    return _subst_quad(
        seg(bl_s, n), seg(l_s, n), px(c_s), seg(t_s, n), seg(tr_s, n),
        fvec(bl_f), fvec(l_f), fvec(c_f), fvec(t_f), fvec(tr_f), bd=bd)


def _rd64_prepass(yp, oy32, qp, lam, *, cw64: int, ch64: int, K: int = 2,
                  bd: int = 8):
    """CU64 leaf mode + RD estimate: orig-boundary 35-mode sweeps on the
    32-grid summed per 64-CTB (the forced-TT structure: one mode, four
    TU32s), then TQR RD for the top-K shared modes."""
    from ..ops import ctu_kernels as ck

    cw, ch = 2 * cw64, 2 * ch64
    nb = cw * ch
    n64 = cw64 * ch64
    fl, fa, ftr = _avail_flags(cw, ch)
    a_raw = _orig_boundaries(yp, 32, cw, ch)
    a = intra_ops.substitute_refs_ctb(
        a_raw, jnp.asarray(fl.reshape(-1)), jnp.asarray(fa.reshape(-1)),
        jnp.asarray(ftr.reshape(-1)), 32, bd=bd)
    preds = ck.predict_all_modes_flat(a, 5, True, bd=bd)  # (nb, 35, 1024)
    oy_flat = oy32.reshape(nb, 32 * 32)
    satd = ck.satd_flat(preds, oy_flat[:, None, :], 5).astype(jnp.float32)
    quad = lambda a2: jnp.stack(
        [a2[dy::2, dx::2].reshape((-1,) + a2.shape[2:]) for dy, dx in _ZO],
        axis=1)                                          # (n64, 4, ...)
    satd4 = quad(satd.reshape(ch, cw, 35))               # (n64, 4, 35)
    satd64 = jnp.sum(satd4, axis=1)
    lamv = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (n64,))
    bits = jax.vmap(_mode_bits_table)(jnp.ones((n64,), jnp.int32))
    cost = satd64 + lamv[:, None] * bits
    _, cand = jax.lax.top_k(-cost, K)                    # (n64, K)
    # TQR each quadrant at each shared candidate mode
    pred4 = quad(preds.reshape(ch, cw, 35, 1024))        # (n64, 4, 35, 1024)
    candp = jnp.take_along_axis(pred4, cand[:, None, :, None], axis=2)
    oy4 = quad(oy_flat.reshape(ch, cw, 1024))            # (n64, 4, 1024)
    resid = oy4[:, :, None, :] - candp                   # (n64, 4, K, 1024)
    coef = ck.fwd_transform_flat(resid.reshape(-1, K, 1024), 5, bd=bd)
    # per-quadrant repeat: flat order is (n64, 4) — ctu-major
    qpb = jnp.repeat(jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (n64,)), 4)
    lev = quantize(coef, qpb, 5, True, bd=bd)
    deq = dequantize(lev, qpb, 5, bd=bd)
    rec = jnp.clip(candp.reshape(-1, K, 1024)
                   + ck.inv_transform_flat(deq, 5, bd=bd),
                   0, (1 << bd) - 1)
    sse = jnp.sum((rec - oy4.reshape(-1, 1024)[:, None, :]) ** 2,
                  axis=-1).astype(jnp.float32)
    lev_bits = jnp.sum(
        jnp.where(lev != 0,
                  2.0 * jnp.log2(jnp.abs(lev).astype(jnp.float32) + 1.0) + 1.0,
                  0.0), axis=-1)
    lam2 = (lamv * lamv)[:, None]
    rd = jnp.sum(sse.reshape(n64, 4, K), axis=1) + lam2 * (
        jnp.sum(lev_bits.reshape(n64, 4, K), axis=1)
        + jnp.take_along_axis(bits, cand, axis=1))
    best_k = jnp.argmin(rd, axis=1)
    mode = jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32)
    rd_best = jnp.take_along_axis(rd, best_k[:, None], 1)[:, 0]
    return mode, rd_best


@functools.partial(jax.jit, static_argnames=("width", "height", "rdoq",
                                              "bit_depth"))
def encode_frame_intra64_fast(y, u, v, qp, *, width: int, height: int,
                              rdoq: bool = False, bit_depth: int = 8):
    """Dense-decision CTB64 quadtree intra encode (ring-carry 64-wave).

    bit_depth 10 = Main10: same syntax/decision structure, bd-scaled
    transform/quant shifts and clip bounds, uint16 recon planes, lambda
    scaled by 2^(bd-8) (SATD domain; its square pairs with the bd-scaled
    SSE in the RD comparisons)."""
    bd = bit_depth
    from ..core.tables import CHROMA_QP_TABLE
    from ..ops import ctu_kernels as ck

    S = 64
    cw, ch = width // S, height // S
    nctb = cw * ch
    sched = schedule_r(cw, ch)
    lanes = sched["lanes"]

    qp = jnp.asarray(qp, jnp.int32)
    qpb = jnp.broadcast_to(qp, (nctb,))  # qp may be scalar or per-CTU (nctb,)
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qpb, 0, 57)]
    lam = jnp.sqrt(0.57 * 2.0 ** ((qpb.astype(jnp.float32) - 12.0) / 3.0))
    # the scaling chain runs at Qp' = qp + QpBdOffset (8.6.3); headers
    # still signal qp.  The relative step at (qp, bd) thus matches
    # (qp, 8-bit), which is also why the lambda base keeps plain qp.
    # The bd == 8 branch adds NO graph nodes so the traced jaxpr (and
    # the persistent-cache key) is bit-identical to the pre-Main10 one.
    if bd > 8:
        lam = lam * (1 << (bd - 8))
        qpq = qpb + 6 * (bd - 8)
        qpc_q = qp_c + 6 * (bd - 8)
    else:
        qpq, qpc_q = qpb, qp_c
    yi = y.astype(jnp.int32)
    oy64 = to_blocks(yi, S)
    ou32 = to_blocks(u.astype(jnp.int32), S // 2)
    ov32 = to_blocks(v.astype(jnp.int32), S // 2)

    # per-block expansions of the CTU grid onto the 16-/32-grids (raster)
    rep = lambda a, f: jnp.repeat(
        jnp.repeat(a.reshape(ch, cw), f, 0), f, 1).reshape(-1)
    qp16, lam16 = rep(qpq, 4), rep(lam, 4)
    qp32, lam32 = rep(qpq, 2), rep(lam, 2)

    # ---- dense prepass at all three levels
    oy16 = to_blocks(yi, 16)
    oy32 = to_blocks(yi, 32)
    mode16, rd16 = _rd_prepass_grid(yi, oy16, qp16, lam16, log2=4,
                                    cw=4 * cw, ch=4 * ch, bd=bd)
    mode32, rd32 = _rd_prepass_grid(yi, oy32, qp32, lam32, log2=5,
                                    cw=2 * cw, ch=2 * ch, bd=bd)
    mode64, rd64 = _rd64_prepass(yi, oy32, qpq, lam, cw64=cw, ch64=ch, bd=bd)

    lam2_32 = (lam32 * lam32).astype(jnp.float32)
    lam2v = (lam * lam).astype(jnp.float32)
    # split32 per 32-block: 4x CU16 vs CU32 leaf
    q16 = lambda a2, c2, r2: jnp.stack(
        [a2.reshape(r2, c2)[dy::2, dx::2].reshape(-1) for dy, dx in _ZO],
        axis=1)
    rd16q = q16(rd16, 4 * cw, 4 * ch)                    # (n32, 4)
    sum16 = jnp.sum(rd16q, axis=1)
    split32_g = (sum16 + lam2_32 * 5.0 < rd32 + lam2_32 * 1.0)  # (n32,) raster
    best32 = jnp.minimum(sum16 + lam2_32 * 5.0, rd32 + lam2_32 * 1.0)
    # split64 per CTB: 4x best-32 subtrees vs CU64 leaf
    best32q = q16(best32, 2 * cw, 2 * ch)                # (nctb, 4)
    sum32 = jnp.sum(best32q, axis=1)
    split64 = (sum32 + lam2v * 1.0 < rd64 + lam2v * 1.0).astype(jnp.int32)
    split32 = q16(split32_g.astype(jnp.int32), 2 * cw, 2 * ch)  # (nctb, 4)

    # per-CTB gathers in z-order: mode32 (nctb, 4), mode16 (nctb, 4, 4)
    m32z = q16(mode32, 2 * cw, 2 * ch)                   # (nctb, 4)
    m16_32 = q16(mode16, 4 * cw, 4 * ch)                 # (n32, 4)
    # (nctb, 4, 4): for each 32-quadrant of each CTB, its four 16-modes
    m16_g = m16_32.reshape(2 * ch, 2 * cw, 4)
    m16z = jnp.stack([m16_g[dy::2, dx::2].reshape(-1, 4) for dy, dx in _ZO],
                     axis=1)                              # (nctb, 4, 4)

    # ---- wave
    (oy_w, ou_w, ov_w, m64_w, m32_w, m16_w, s64_w, s32_w,
     qp_w, qpc_w, lam_w) = wave_inputs(
        sched, nctb,
        [oy64, ou32, ov32, mode64, m32z, m16z, split64, split32, qpq, qpc_q,
         lam])
    fl_w = jnp.asarray(sched["cs"] > 0)
    fa_w = jnp.asarray(sched["rs"] > 0)
    ftr_w = jnp.asarray((sched["rs"] > 0) & (sched["cs"] + 1 < cw))
    xs = (oy_w, ou_w, ov_w, m64_w, m32_w, m16_w, s64_w, s32_w, qp_w, qpc_w,
          lam_w, fl_w, fa_w, ftr_w)

    ring0 = lambda m: (jnp.zeros((3, lanes, m), jnp.int32),
                       jnp.zeros((3, lanes, m), jnp.int32))
    shift1 = lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    def wave(carry, x):
        ry, ru, rv = carry
        (oyw, ouw, ovw, m64, m32, m16, s64, s32, qpw, qpcw, lamw,
         fl, fa, ftr) = x
        lam2 = (lamw * lamw).astype(jnp.float32)
        flags = {"fl": fl, "fa": fa, "ftr": ftr, "fal": fl & fa}

        ringsY = {"Lcol": ry[1][0], "Trow": shift1(ry[0][1]),
                  "TRrow": shift1(ry[0][0]),
                  "Cpix": shift1(ry[0][2])[:, S - 1 : S]}
        ringsU = {"Lcol": ru[1][0], "Trow": shift1(ru[0][1]),
                  "TRrow": shift1(ru[0][0]),
                  "Cpix": shift1(ru[0][2])[:, S // 2 - 1 : S // 2]}
        ringsV = {"Lcol": rv[1][0], "Trow": shift1(rv[0][1]),
                  "TRrow": shift1(rv[0][0]),
                  "Cpix": shift1(rv[0][2])[:, S // 2 - 1 : S // 2]}

        def code_unit(canvas, rings, x0, y0, log2u, mode, qpv, is_luma, Sc):
            """Predict+TQR one unit on the canvas; returns (lev, rec)."""
            n = 1 << log2u
            spec = _seg_spec(x0, y0, n, Sc)
            a = _unit_walk(canvas, rings, spec, n, flags, bd=bd)
            preds = ck.predict_all_modes_flat(a, log2u, is_luma, bd=bd)
            return jnp.take_along_axis(preds, mode[:, None, None], 1)[:, 0]

        def tqr(pred, orig, qpv, log2u):
            return _code_flat_sel(ck, orig, pred, qpv, log2u, lam2, rdoq,
                                  bd=bd)

        def unit(canvas, rings, orig_blk, x0, y0, log2u, mode, qpv, is_luma,
                 Sc):
            n = 1 << log2u
            o = orig_blk[:, y0 : y0 + n, x0 : x0 + n].reshape(lanes, -1)
            pred = code_unit(canvas, rings, x0, y0, log2u, mode, qpv,
                             is_luma, Sc)
            lev, rec = tqr(pred, o, qpv, log2u)
            canvas = canvas.at[:, y0 : y0 + n, x0 : x0 + n].set(
                rec.reshape(lanes, n, n))
            return canvas, lev

        # ---------- split path: 4x [CU32 leaf | 4x CU16] on canvases
        cS = jnp.zeros((lanes, S, S), jnp.int32)
        cSu = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        cSv = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        lev32_sel = []   # per 32-quadrant selected luma levels (L, 1024)
        levu_sel, levv_sel = [], []
        for q32, (dy3, dx3) in enumerate(_ZO):
            X, Y = dx3 * 32, dy3 * 32
            sel = (s32[:, q32] != 0)
            # CU32 leaf candidate
            c_leaf, lev32q = unit(cS, ringsY, oyw, X, Y, 5, m32[:, q32],
                                  qpw, True, S)
            cu_leaf, levu32q = unit(cSu, ringsU, ouw, X // 2, Y // 2, 4,
                                    m32[:, q32], qpcw, False, S // 2)
            cv_leaf, levv32q = unit(cSv, ringsV, ovw, X // 2, Y // 2, 4,
                                    m32[:, q32], qpcw, False, S // 2)
            # CU16 path
            c16, c16u, c16v = cS, cSu, cSv
            l16, l16u, l16v = [], [], []
            for q16i, (dy, dx) in enumerate(_ZO):
                xq, yq = X + dx * 16, Y + dy * 16
                c16, lq = unit(c16, ringsY, oyw, xq, yq, 4,
                               m16[:, q32, q16i], qpw, True, S)
                c16u, lqu = unit(c16u, ringsU, ouw, xq // 2, yq // 2, 3,
                                 m16[:, q32, q16i], qpcw, False, S // 2)
                c16v, lqv = unit(c16v, ringsV, ovw, xq // 2, yq // 2, 3,
                                 m16[:, q32, q16i], qpcw, False, S // 2)
                l16.append(lq)
                l16u.append(lqu)
                l16v.append(lqv)
            sel3 = sel[:, None, None]
            pick = lambda a, b: jnp.where(sel3, a, b)
            cS = pick(c16, c_leaf)
            cSu = pick(c16u, cu_leaf)
            cSv = pick(c16v, cv_leaf)
            sel2 = sel[:, None]
            lev32_sel.append(jnp.where(sel2, jnp.concatenate(l16, 1), lev32q))
            levu_sel.append(jnp.where(sel2, jnp.concatenate(l16u, 1), levu32q))
            levv_sel.append(jnp.where(sel2, jnp.concatenate(l16v, 1), levv32q))

        # ---------- CU64 leaf: four TU32s + per-quadrant TU16 chroma
        cL = jnp.zeros((lanes, S, S), jnp.int32)
        cLu = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        cLv = jnp.zeros((lanes, S // 2, S // 2), jnp.int32)
        lev64, lev64u, lev64v = [], [], []
        for q32, (dy3, dx3) in enumerate(_ZO):
            X, Y = dx3 * 32, dy3 * 32
            cL, lq = unit(cL, ringsY, oyw, X, Y, 5, m64, qpw, True, S)
            cLu, lqu = unit(cLu, ringsU, ouw, X // 2, Y // 2, 4, m64, qpcw,
                            False, S // 2)
            cLv, lqv = unit(cLv, ringsV, ovw, X // 2, Y // 2, 4, m64, qpcw,
                            False, S // 2)
            lev64.append(lq)
            lev64u.append(lqu)
            lev64v.append(lqv)

        s3 = (s64 != 0)[:, None, None]
        s2 = (s64 != 0)[:, None]
        rec_y = jnp.where(s3, cS, cL)
        rec_u = jnp.where(s3, cSu, cLu)
        rec_v = jnp.where(s3, cSv, cLv)
        lev_y = jnp.where(s2, jnp.concatenate(lev32_sel, 1),
                          jnp.concatenate(lev64, 1))
        lev_cb = jnp.where(s2, jnp.concatenate(levu_sel, 1),
                           jnp.concatenate(lev64u, 1))
        lev_cr = jnp.where(s2, jnp.concatenate(levv_sel, 1),
                           jnp.concatenate(lev64v, 1))

        ry = _ring_push(ry, rec_y[:, S - 1, :], rec_y[:, :, S - 1])
        ru = _ring_push(ru, rec_u[:, S // 2 - 1, :], rec_u[:, :, S // 2 - 1])
        rv = _ring_push(rv, rec_v[:, S // 2 - 1, :], rec_v[:, :, S // 2 - 1])
        pix = jnp.uint8 if bd == 8 else jnp.uint16
        out = (lev_y.astype(jnp.int16), lev_cb.astype(jnp.int16),
               lev_cr.astype(jnp.int16), rec_y.astype(pix),
               rec_u.astype(pix), rec_v.astype(pix))
        return (ry, ru, rv), out

    carry0 = (ring0(S), ring0(S // 2), ring0(S // 2))
    _, (lev_y_w, lev_cb_w, lev_cr_w, rec_y_w, rec_u_w, rec_v_w) = jax.lax.scan(
        wave, carry0, xs, unroll=QUAD_UNROLL)

    w2r = lambda o: wave_to_raster(sched, o)
    m = S // 2
    rec_y = w2r(rec_y_w).reshape(nctb, S, S).astype(jnp.int32)
    rec_u = w2r(rec_u_w).reshape(nctb, m, m).astype(jnp.int32)
    rec_v = w2r(rec_v_w).reshape(nctb, m, m).astype(jnp.int32)
    pix = jnp.uint8 if bd == 8 else jnp.uint16
    return {
        "split64": split64,
        "split32": split32,
        "mode64": mode64,
        "modes32": m32z,
        "modes16": m16z,
        "lev_y": w2r(lev_y_w),
        "lev_cb": w2r(lev_cb_w),
        "lev_cr": w2r(lev_cr_w),
        "recon_y": from_blocks(rec_y, height, width).astype(pix),
        "recon_u": from_blocks(rec_u, height // 2, width // 2).astype(pix),
        "recon_v": from_blocks(rec_v, height // 2, width // 2).astype(pix),
    }


def fetch_levels_i32(out):
    """Host numpy (int32) level planes from device outputs, shipped as
    int8 over the link when every |level| <= 127 (true at streaming QPs)
    — the device->host level transfer is the dominant fetch cost on a
    remote-attached TPU (VERDICT r4 ask #5), and this halves it.  One
    scalar fetch (the max) decides; falls through for host arrays."""
    ly, lcb, lcr = out["lev_y"], out["lev_cb"], out["lev_cr"]
    try:
        import jax.numpy as jnp

        if hasattr(ly, "device"):  # device arrays only
            maxabs = int(jnp.maximum(
                jnp.abs(ly).max(),
                jnp.maximum(jnp.abs(lcb).max(), jnp.abs(lcr).max())))
            if maxabs <= 127:
                ly, lcb, lcr = (x.astype(jnp.int8) for x in (ly, lcb, lcr))
    except Exception:
        pass
    return (np.asarray(ly).astype(np.int32),
            np.asarray(lcb).astype(np.int32),
            np.asarray(lcr).astype(np.int32))

def quad_trees_from_device64(out, width: int, height: int):
    """cu32-format trees from the CTB64 device outputs.

    Level layout of lev_y (nctb, 4096): z-order 32-quadrants of 1024;
    within a split-32 quadrant, z-order 16-leaves of 256.  Chroma
    (nctb, 1024) analogous at half block sizes."""
    cw, ch = width // 64, height // 64
    nctb = cw * ch
    s64 = np.asarray(out["split64"]).reshape(-1)
    s32 = np.asarray(out["split32"]).reshape(nctb, 4)
    m64 = np.asarray(out["mode64"]).reshape(-1)
    m32 = np.asarray(out["modes32"]).reshape(nctb, 4)
    m16 = np.asarray(out["modes16"]).reshape(nctb, 4, 4)
    lev_y, lev_cb, lev_cr = fetch_levels_i32(out)
    lev_y = lev_y.reshape(nctb, 4, 1024)
    lev_cb = lev_cb.reshape(nctb, 4, 256)
    lev_cr = lev_cr.reshape(nctb, 4, 256)
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
            trees.append(dict(size=64, part=0, modes=[int(m64[i])],
                              lev_y=ly, lev_cb=lb, lev_cr=lr))
            continue
        sub32 = []
        for q, _ in enumerate(_ZO):
            if s32[i, q]:
                ly = lev_y[i, q].reshape(4, 16, 16)
                lb = lev_cb[i, q].reshape(4, 8, 8)
                lr = lev_cr[i, q].reshape(4, 8, 8)
                sub32.append(dict(size=32, split=[
                    dict(size=16, part=0, modes=[int(m16[i, q, z])],
                         lev_y=ly[z], lev_cb=lb[z], lev_cr=lr[z])
                    for z in range(4)
                ]))
            else:
                sub32.append(dict(size=32, part=0, modes=[int(m32[i, q])],
                                  lev_y=lev_y[i, q].reshape(32, 32),
                                  lev_cb=lev_cb[i, q].reshape(16, 16),
                                  lev_cr=lev_cr[i, q].reshape(16, 16)))
        trees.append(dict(size=64, split=sub32))
    return trees
