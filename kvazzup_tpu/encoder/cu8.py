"""CU quadtree (CTB16 -> 4x CU8) intra coding — reference raster path.

The first level of kvazaar's CTU quadtree RDO (`search.c` CU depth
recursion, SURVEY §2.6 Compression group): each 16x16 CTB is either one
CU16 (TU16 luma / TU8 chroma, as v1) or four z-order CU8s (TU8 luma /
TU4 chroma, mode-dependent scans 7.4.9.11, own MPM per CU).  The RD
choice compares true SSE + lambda^2 * rate on both paths.

This module is the sequential *reference* implementation working on
full-frame canvases with exact z-scan availability (6.4.1); the wavefront
device path (frame_intra_cu8.py) must match it bit-for-bit.  Neighbor
pixel availability: available iff inside the picture and its 8x8 block
precedes the current block in coding order (CTB raster, z-order within).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from ..ops.satd import satd_blocks
from ..ops.transforms import fwd_transform, inv_transform

# z-order sub-CU pixel offsets within a CTB
_ZOFF = [(0, 0), (0, 8), (8, 0), (8, 8)]


def _zaddr(x: int, y: int, cw: int, luma: bool = True) -> int:
    """Coding-order (z-scan, 6.4.1) index of the min cell containing pixel
    (x, y).  Luma: 4x4 cells, three z levels (CTB -> 8x8 CU -> 4x4 PU/TU,
    needed once NxN partitions exist).  Chroma: 4x4 cells, two levels (the
    co-located cells of the 8x8 CUs) — availability must be evaluated at
    the plane's own granularity or intra-CTB neighbors get lost."""
    if luma:
        r8, c8 = y >> 3, x >> 3
        base = (((r8 >> 1) * cw + (c8 >> 1)) * 4 + (r8 & 1) * 2 + (c8 & 1)) * 4
        return base + ((y >> 2) & 1) * 2 + ((x >> 2) & 1)
    r4, c4 = y >> 2, x >> 2
    return ((r4 >> 1) * cw + (c4 >> 1)) * 4 + (r4 & 1) * 2 + (c4 & 1)


def boundary_np(canvas: np.ndarray, x0: int, y0: int, n: int, cw: int,
                luma: bool = True):
    """(a_raw, avail) of length 4n+1 in the frame_intra layout:
    [below-left(n) bottom-up | left(n) bottom-up | corner | top(n) | top-right(n)]."""
    h, w = canvas.shape
    cur = _zaddr(x0, y0, cw, luma)

    def ok(x, y):
        return 0 <= x < w and 0 <= y < h and _zaddr(x, y, cw, luma) < cur

    a = np.zeros(4 * n + 1, np.int32)
    av = np.zeros(4 * n + 1, bool)
    for j in range(n):  # below-left, bottom-up
        x, y = x0 - 1, y0 + 2 * n - 1 - j
        if ok(x, y):
            a[j], av[j] = canvas[y, x], True
    for j in range(n):  # left, bottom-up
        x, y = x0 - 1, y0 + n - 1 - j
        if ok(x, y):
            a[n + j], av[n + j] = canvas[y, x], True
    if ok(x0 - 1, y0 - 1):
        a[2 * n], av[2 * n] = canvas[y0 - 1, x0 - 1], True
    for j in range(2 * n):  # top + top-right
        x, y = x0 + j, y0 - 1
        if ok(x, y):
            a[2 * n + 1 + j], av[2 * n + 1 + j] = canvas[y, x], True
    return a, av


def predict_np(canvas, x0, y0, log2, is_luma, mode, cw):
    a_raw, av = boundary_np(canvas, x0, y0, 1 << log2, cw, is_luma)
    a = intra_ops.substitute_refs(jnp.asarray(a_raw), jnp.asarray(av))
    return np.asarray(intra_ops.predict_mode(a, log2, is_luma, mode))


def _mpm(cand_a: int, cand_b: int):
    if cand_a == cand_b:
        if cand_a < 2:
            return [0, 1, 26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 1) % 32)]
    m2 = 0 if (cand_a != 0 and cand_b != 0) else (1 if (cand_a != 1 and cand_b != 1) else 26)
    return [cand_a, cand_b, m2]


def _mode_bits(mode: int, cand_a: int, cand_b: int) -> float:
    mpm = _mpm(cand_a, cand_b)
    if mode == mpm[0]:
        return 2.0
    if mode in mpm[1:]:
        return 3.0
    return 6.0


def _code_np(orig, pred, qp, log2, dst: bool = False):
    resid = jnp.asarray(orig - pred)
    lev = quantize(fwd_transform(resid, log2, dst), qp, log2, True)
    rec = np.asarray(
        jnp.clip(jnp.asarray(pred) + inv_transform(dequantize(lev, qp, log2), log2, dst),
                 0, 255)
    )
    return np.asarray(lev), rec


def _lev_bits(lev: np.ndarray) -> float:
    nz = lev != 0
    return float(np.sum(np.where(nz, 2.0 * np.log2(np.abs(lev) + 1.0) + 1.0, 0.0)))


def _best_mode(canvas, orig, x0, y0, log2, qp, lam, cand_a, cand_b, cw, K=3,
               dst: bool = False):
    """Two-stage luma decision (SATD top-K -> SSE + lambda^2*rate), exactly
    the frame_intra shape.  Returns (mode, lev, rec, rd_cost)."""
    n = 1 << log2
    a_raw, av = boundary_np(canvas, x0, y0, n, cw, True)
    a = intra_ops.substitute_refs(jnp.asarray(a_raw), jnp.asarray(av))
    preds = intra_ops.predict_all_modes(a, log2, True)  # (35, n, n)
    o = jnp.asarray(orig)
    satd = np.asarray(satd_blocks(preds, o[None])).astype(np.float64)
    bits = np.array([_mode_bits(m, cand_a, cand_b) for m in range(35)])
    order = np.argsort(satd + lam * bits, kind="stable")[:K]
    best = None
    preds_np = np.asarray(preds)
    for m in order:
        lev, rec = _code_np(orig, preds_np[m], qp, log2, dst)
        sse = float(np.sum((rec.astype(np.int64) - orig) ** 2))
        rd = sse + lam * lam * (_lev_bits(lev) + bits[m])
        if best is None or rd < best[3]:
            best = (int(m), lev, rec, rd)
    return best


def _cands4_np(modes4, i, r4, c4, c_ctb):
    """entropy/slice_data._cands4 mirror (MPM neighbors at 4x4 cells)."""
    if c4 > 0:
        k = (r4 >> 1) * 2 + (c4 - 1 >> 1)
        a = int(modes4[i][k * 4 + (r4 & 1) * 2 + (c4 - 1 & 1)])
    elif c_ctb > 0:
        a = int(modes4[i - 1][((r4 >> 1) * 2 + 1) * 4 + (r4 & 1) * 2 + 1])
    else:
        a = 1
    if r4 > 0:
        k = (r4 - 1 >> 1) * 2 + (c4 >> 1)
        b = int(modes4[i][k * 4 + (r4 - 1 & 1) * 2 + (c4 & 1)])
    else:
        b = 1
    return a, b


def encode_frame_intra_cu8_ref(y, u, v, qp: int, *, width: int, height: int,
                               nxn: bool = True):
    """Sequential CU-quadtree intra encoder over numpy canvases.

    Candidates per CTB: CU16, and per-CU8 the better of PART_2Nx2N (TU8)
    and PART_NxN (four 4x4 PUs, DST-VII TUs) when `nxn`.  Returns
    dict(split (nctu,), part (nctu,4), modes4 (nctu,16), modes8 (nctu,4)
    view, quadrant-packed levels, recon planes)."""
    from ..core.tables import CHROMA_QP_TABLE

    cw, ch = width // 16, height // 16
    nctu = cw * ch
    qp_c = int(CHROMA_QP_TABLE[min(max(qp, 0), 57)])
    lam = float(np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0)))
    y = np.asarray(y, np.int32)
    u = np.asarray(u, np.int32)
    v = np.asarray(v, np.int32)
    cy = np.zeros_like(y)
    cu_ = np.zeros_like(u)
    cv = np.zeros_like(v)
    split = np.zeros(nctu, np.int32)
    part = np.zeros((nctu, 4), np.int32)
    modes4 = np.zeros((nctu, 16), np.int32)
    lev_y = np.zeros((nctu, 16, 16), np.int32)
    lev_cb = np.zeros((nctu, 8, 8), np.int32)
    lev_cr = np.zeros((nctu, 8, 8), np.int32)

    def chroma_code(canvas_c, orig_c, xc, yc, log2c, mode, qpc):
        pred = predict_np(canvas_c, xc, yc, log2c, False, mode, cw)
        lev, rec = _code_np(orig_c, pred, qpc, log2c)
        sse = float(np.sum((rec.astype(np.int64) - orig_c) ** 2))
        return lev, rec, sse + lam * lam * _lev_bits(lev)

    for r in range(ch):
        for c in range(cw):
            i = r * cw + c
            x0, y0 = c * 16, r * 16
            oy = y[y0 : y0 + 16, x0 : x0 + 16]
            ocb = u[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8]
            ocr = v[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8]

            # ---- CU16 candidate
            ca16, cb16 = _cands4_np(modes4, i, 0, 0, c)
            m16, lev16, rec16, rd16 = _best_mode(
                cy, oy, x0, y0, 4, qp, lam, ca16, cb16, cw
            )
            lcb16, rcb16, rdc16 = chroma_code(cu_, ocb, x0 // 2, y0 // 2, 3, m16, qp_c)
            lcr16, rcr16, rdr16 = chroma_code(cv, ocr, x0 // 2, y0 // 2, 3, m16, qp_c)
            rd16_total = rd16 + rdc16 + rdr16 + lam * lam * 5.0

            # ---- split candidate: per CU8, best of 2Nx2N / NxN (z-order)
            sy = cy.copy()
            su = cu_.copy()
            sv = cv.copy()
            m4_save = modes4[i].copy()
            sub = []
            sub_part = [0, 0, 0, 0]
            rd8_total = lam * lam * 1.0
            for k, (dy, dx) in enumerate(_ZOFF):
                xs, ys = x0 + dx, y0 + dy
                kr, kc = (k >> 1) * 2, (k & 1) * 2
                o8 = y[ys : ys + 8, xs : xs + 8]
                # 2Nx2N candidate (on a fork of the scratch canvas)
                ca, cb = _cands4_np(modes4, i, kr, kc, c)
                m8, l8, r8_, rd8 = _best_mode(sy, o8, xs, ys, 3, qp, lam, ca, cb, cw)
                cand2 = dict(part=0, modes=[m8] * 4, lev=l8, rec=r8_,
                             rd=rd8 + lam * lam * 5.0, dm=m8)
                best = cand2
                if nxn:
                    # NxN candidate: 4 sequential 4x4 PUs with DST TUs
                    ny = sy.copy()
                    m4l = [0, 0, 0, 0]
                    lq = np.zeros((8, 8), np.int32)
                    rdn = lam * lam * 9.0  # part bin + 4 cbf + mode sig overhead
                    for j, (jr, jc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                        pr, pc = kr + jr, kc + jc
                        xp, yp = x0 + pc * 4, y0 + pr * 4
                        # stash already-chosen PU modes so cands see them
                        for jj in range(j):
                            modes4[i][k * 4 + jj] = m4l[jj]
                        caj, cbj = _cands4_np(modes4, i, pr, pc, c)
                        o4 = y[yp : yp + 4, xp : xp + 4]
                        mj, lj, rj, rdj = _best_mode(
                            ny, o4, xp, yp, 2, qp, lam, caj, cbj, cw, dst=True
                        )
                        m4l[j] = mj
                        ny[yp : yp + 4, xp : xp + 4] = rj
                        lq[jr * 4 : jr * 4 + 4, jc * 4 : jc * 4 + 4] = lj
                        rdn += rdj
                    modes4[i][k * 4 : k * 4 + 4] = m4_save[k * 4 : k * 4 + 4]
                    if rdn < cand2["rd"]:
                        best = dict(part=1, modes=m4l, lev=lq,
                                    rec=ny[ys : ys + 8, xs : xs + 8].copy(),
                                    rd=rdn, dm=m4l[0])
                # commit the chosen luma candidate to the scratch state
                sub_part[k] = best["part"]
                for j in range(4):
                    modes4[i][k * 4 + j] = best["modes"][j]
                sy[ys : ys + 8, xs : xs + 8] = best["rec"]
                # chroma (4x4, DM from the CU's derivation mode)
                oc8b = u[ys // 2 : ys // 2 + 4, xs // 2 : xs // 2 + 4]
                oc8r = v[ys // 2 : ys // 2 + 4, xs // 2 : xs // 2 + 4]
                lc8b, rc8b, rdcb = chroma_code(su, oc8b, xs // 2, ys // 2, 2, best["dm"], qp_c)
                lc8r, rc8r, rdcr = chroma_code(sv, oc8r, xs // 2, ys // 2, 2, best["dm"], qp_c)
                su[ys // 2 : ys // 2 + 4, xs // 2 : xs // 2 + 4] = rc8b
                sv[ys // 2 : ys // 2 + 4, xs // 2 : xs // 2 + 4] = rc8r
                sub.append((best["lev"], lc8b, lc8r))
                rd8_total += best["rd"] + rdcb + rdcr

            if rd8_total < rd16_total:
                split[i] = 1
                part[i] = sub_part
                for k, (dy, dx) in enumerate(_ZOFF):
                    lev_y[i][dy : dy + 8, dx : dx + 8] = sub[k][0]
                    lev_cb[i][dy // 2 : dy // 2 + 4, dx // 2 : dx // 2 + 4] = sub[k][1]
                    lev_cr[i][dy // 2 : dy // 2 + 4, dx // 2 : dx // 2 + 4] = sub[k][2]
                cy[y0 : y0 + 16, x0 : x0 + 16] = sy[y0 : y0 + 16, x0 : x0 + 16]
                cu_[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = su[
                    y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
                ]
                cv[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = sv[
                    y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
                ]
            else:
                modes4[i][:] = m16
                lev_y[i] = lev16
                lev_cb[i] = lcb16
                lev_cr[i] = lcr16
                cy[y0 : y0 + 16, x0 : x0 + 16] = rec16
                cu_[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = rcb16
                cv[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = rcr16

    return {
        "split": split, "part": part, "modes4": modes4,
        "modes8": np.ascontiguousarray(modes4.reshape(-1, 4, 4)[:, :, 0]),
        "lev_y": lev_y, "lev_cb": lev_cb, "lev_cr": lev_cr,
        "recon_y": cy.astype(np.uint8), "recon_u": cu_.astype(np.uint8),
        "recon_v": cv.astype(np.uint8),
    }


def reconstruct_frame_intra_cu8_ref(split, modes4, lev_y, lev_cb, lev_cr, qp,
                                    *, width: int, height: int, part=None):
    """Decoder-side sequential reconstruction (mirror of the encoder).
    modes4 may be (nctu, 16); a legacy (nctu, 4) modes8 array is expanded."""
    from ..core.tables import CHROMA_QP_TABLE

    modes4 = np.asarray(modes4)
    if modes4.ndim == 2 and modes4.shape[1] == 4:
        modes4 = np.repeat(modes4, 4, axis=1)
    cw, ch = width // 16, height // 16
    nctu = cw * ch
    if part is None:
        part = np.zeros((nctu, 4), np.int32)
    qp_c = int(CHROMA_QP_TABLE[min(max(qp, 0), 57)])
    cy = np.zeros((height, width), np.int32)
    cu_ = np.zeros((height // 2, width // 2), np.int32)
    cv = np.zeros((height // 2, width // 2), np.int32)

    def rec_block(canvas, x0, y0, log2, is_luma, mode, lev, q, dst=False):
        pred = predict_np(canvas, x0, y0, log2, is_luma, mode, cw)
        resid = np.asarray(inv_transform(dequantize(jnp.asarray(lev), q, log2), log2, dst))
        canvas[y0 : y0 + (1 << log2), x0 : x0 + (1 << log2)] = np.clip(
            pred + resid, 0, 255
        )

    for r in range(ch):
        for c in range(cw):
            i = r * cw + c
            x0, y0 = c * 16, r * 16
            if not split[i]:
                m = int(modes4[i][0])
                rec_block(cy, x0, y0, 4, True, m, lev_y[i], qp)
                rec_block(cu_, x0 // 2, y0 // 2, 3, False, m, lev_cb[i], qp_c)
                rec_block(cv, x0 // 2, y0 // 2, 3, False, m, lev_cr[i], qp_c)
                continue
            for k, (dy, dx) in enumerate(_ZOFF):
                xs, ys = x0 + dx, y0 + dy
                ly8 = lev_y[i][dy : dy + 8, dx : dx + 8]
                if part[i][k]:
                    for j, (jr, jc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                        m = int(modes4[i][k * 4 + j])
                        rec_block(cy, xs + jc * 4, ys + jr * 4, 2, True, m,
                                  ly8[jr * 4 : jr * 4 + 4, jc * 4 : jc * 4 + 4],
                                  qp, dst=True)
                    dm = int(modes4[i][k * 4])
                else:
                    m = int(modes4[i][k * 4])
                    rec_block(cy, xs, ys, 3, True, m, ly8, qp)
                    dm = m
                rec_block(cu_, xs // 2, ys // 2, 2, False, dm,
                          lev_cb[i][dy // 2 : dy // 2 + 4, dx // 2 : dx // 2 + 4],
                          qp_c)
                rec_block(cv, xs // 2, ys // 2, 2, False, dm,
                          lev_cr[i][dy // 2 : dy // 2 + 4, dx // 2 : dx // 2 + 4],
                          qp_c)
    return cy.astype(np.uint8), cu_.astype(np.uint8), cv.astype(np.uint8)
