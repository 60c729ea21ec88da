"""Generic B-slice decoder: bi-prediction for alien random-access streams.

Extends the P engine (generic_inter.py) with list 1: inter_pred_idc,
per-list merge/AMVP with full-motion candidates and pruning (8.5.3.2.3),
combined bi-predictive merge candidates (8.5.3.2.4), TMVP from the
collocated list, mvd_l1_zero, and default/weighted bi-prediction in the
14-bit domain (8.5.3.3.4.3).

Envelope (vs libx265): B slices from `bframes=N no-b-pyramid` low-delay /
random-access chains.  The motion state carries both lists at 4x4 cells;
list-0-only data also feeds the inherited P bookkeeping so deblock bS and
TMVP retention keep working.
"""

from __future__ import annotations

import numpy as np

from ..entropy.cabac_tables import OFFSETS
from ..entropy.slice_data import _decode_mvd
from .generic_inter import GenericInterDecoder, _mc_np, _scale_mv_np


def _bi_round(a14, b14):
    return np.clip((a14 + b14 + 64) >> 7, 0, 255).astype(np.int32)


def _bi_weighted(a14, b14, w0, o0, w1, o1, denom):
    """Explicit weighted bi-prediction (8.5.3.3.4.3), log2Wd = denom + 6."""
    log2wd = denom + 6
    val = (a14 * w0 + b14 * w1 + ((o0 + o1 + 1) << log2wd)) >> (log2wd + 1)
    return np.clip(val, 0, 255).astype(np.int32)


def _uni_weighted(p14, w, o, denom):
    log2wd = denom + 6
    val = ((p14 * w + (1 << (log2wd - 1))) >> log2wd) + o
    return np.clip(val, 0, 255).astype(np.int32)


class GenericBDecoder(GenericInterDecoder):
    """refs_l: (refs0, refs1) each [((y,u,v) planes, poc), ...]."""

    def __init__(self, sps, pps, sh, refs0, refs1, col=None, cur_poc=0):
        super().__init__(sps, pps, sh, refs0, col=col, cur_poc=cur_poc)
        self.refs1 = refs1
        self.nref1 = len(refs1)
        self.mvd_l1_zero = bool(getattr(sh, "mvd_l1_zero", False))
        h4, w4 = self.h // 4, self.w // 4
        # full dual-list motion state (the inherited maps stay the L0 view)
        self.pf4 = np.zeros((h4, w4, 2), bool)
        self.mv4l = np.zeros((h4, w4, 2, 2), np.int32)
        self.refpoc4l = np.zeros((h4, w4, 2), np.int32)

    # ----------------------------------------------------------- neighbors
    def _nb_full(self, x, y):
        """Full motion (pf (2,), mv (2,2), refpocs (2,)) or None."""
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return None
        if not self._same_slice(x, y):
            return None
        if not self.inter4[y >> 2, x >> 2]:
            return None
        c = (y >> 2, x >> 2)
        return (tuple(self.pf4[c]),
                tuple(tuple(int(v) for v in self.mv4l[c][l]) for l in range(2)),
                tuple(int(v) for v in self.refpoc4l[c]))

    # ------------------------------------------------------------ CU level
    def _coding_unit(self, dec, x0, y0, log2) -> None:
        n = 1 << log2
        ctx = 0
        if x0 > 0 and self._same_slice(x0 - 1, y0) \
                and self.skip4[y0 >> 2, (x0 - 1) >> 2]:
            ctx += 1
        if y0 > 0 and self._same_slice(x0, y0 - 1) \
                and self.skip4[(y0 - 1) >> 2, x0 >> 2]:
            ctx += 1
        if dec.decode_bin(OFFSETS["cu_skip_flag"] + ctx):
            mot = self._merge_full(dec, x0, y0, n, n, "2Nx2N", 0)
            self._commit_b(x0, y0, n, n, mot, skip=True)
            self._mark_edges(x0, y0, n)
            return
        if dec.decode_bin(OFFSETS["pred_mode_flag"]):
            GenericInterDecoder.__mro__[1]._coding_unit(self, dec, x0, y0, log2)
            return
        amp = getattr(self.sps, "amp_enabled", False) and log2 > self.min_cb_log2
        if dec.decode_bin(OFFSETS["part_mode"]):
            part = "2Nx2N"
        else:
            horiz = bool(dec.decode_bin(OFFSETS["part_mode"] + 1))
            if amp:
                if dec.decode_bin(OFFSETS["part_mode"] + 3):
                    part = "2NxN" if horiz else "Nx2N"
                elif dec.decode_bypass():
                    part = "2NxnD" if horiz else "nRx2N"
                else:
                    part = "2NxnU" if horiz else "nLx2N"
            else:
                part = "2NxN" if horiz else "Nx2N"
        self._mark_edges(x0, y0, n)
        q = n >> 2
        geom = {
            "2Nx2N": None,
            "2NxN": (0, n >> 1), "2NxnU": (0, q), "2NxnD": (0, 3 * q),
            "Nx2N": (n >> 1, 0), "nLx2N": (q, 0), "nRx2N": (3 * q, 0),
        }[part]
        if geom is None:
            pus = [(x0, y0, n, n)]
        elif geom[1]:
            pus = [(x0, y0, n, geom[1]), (x0, y0 + geom[1], n, n - geom[1])]
            self._mark_edges(x0, y0 + geom[1], n)
        else:
            pus = [(x0, y0, geom[0], n), (x0 + geom[0], y0, n - geom[0], n)]
            self._mark_edges(x0 + geom[0], y0, n)
        merged_2nx2n = False
        for pi, (px, py, pw, ph) in enumerate(pus):
            if dec.decode_bin(OFFSETS["merge_flag"]):
                mot = self._merge_full(dec, px, py, pw, ph, part, pi)
                if part == "2Nx2N":
                    merged_2nx2n = True
            else:
                mot = self._b_amvp_pu(dec, px, py, pw, ph, log2)
            self._commit_b(px, py, pw, ph, mot, skip=False)
        self._inter_residual(dec, x0, y0, log2, root_cbf_coded=not merged_2nx2n,
                             part_2nx2n=(part == "2Nx2N"))

    # ----------------------------------------------------------- merge (B)
    def _merge_full(self, dec, px, py, pw, ph, part, pi):
        idx = 0
        if self.max_merge > 1:
            if dec.decode_bin(OFFSETS["merge_idx"]):
                idx = 1
                while idx < self.max_merge - 1 and dec.decode_bypass():
                    idx += 1
        mot = self._merge_list_b(px, py, pw, ph, part, pi)[idx]
        if pw + ph == 12 and mot[0][0] and mot[0][1]:
            # 8x4/4x8 PUs may not be bi-predicted: drop list 1 (8.5.3.2.3)
            mot = ((True, False), mot[1], mot[2])
        return mot

    def _merge_list_b(self, x0, y0, nw, nh, part, part_idx):
        a1 = self._nb_full(x0 - 1, y0 + nh - 1)
        b1 = self._nb_full(x0 + nw - 1, y0 - 1)
        b0 = self._nb_full(x0 + nw, y0 - 1)
        a0 = self._nb_full(x0 - 1, y0 + nh)
        if part_idx == 1 and part in ("Nx2N", "nLx2N", "nRx2N"):
            a1 = None
        if part_idx == 1 and part in ("2NxN", "2NxnU", "2NxnD"):
            b1 = None
        cands = []
        if a1 is not None:
            cands.append(a1)
        if b1 is not None and b1 != a1:
            cands.append(b1)
        if b0 is not None and b0 != b1:
            cands.append(b0)
        if a0 is not None and a0 != a1:
            cands.append(a0)
        if len(cands) < 4:
            b2 = self._nb_full(x0 - 1, y0 - 1)
            if b2 is not None and b2 != a1 and b2 != b1:
                cands.append(b2)
        t = self._tmvp_full(x0, y0, nw, nh)
        if t is not None:
            cands.append(t)
        # combined bi-predictive candidates (8.5.3.2.4)
        order = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
                 (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))
        base = list(cands)
        for i, j in order:
            if len(cands) >= self.max_merge:
                break
            if i >= len(base) or j >= len(base):
                continue
            pfi, mvi, rpi = base[i]
            pfj, mvj, rpj = base[j]
            if pfi[0] and pfj[1]:
                comb = ((True, True), (mvi[0], mvj[1]), (rpi[0], rpj[1]))
                if not (rpi[0] == rpj[1] and mvi[0] == mvj[1]):
                    cands.append(comb)
        zr = 0
        while len(cands) < self.max_merge:
            r0 = min(zr, self.nref - 1)
            r1 = min(zr, self.nref1 - 1)
            cands.append(((True, True), ((0, 0), (0, 0)),
                          (self.refs[r0][1], self.refs1[r1][1])))
            zr += 1
        return cands[: self.max_merge]

    def _tmvp_full(self, x0, y0, nw, nh):
        t0 = self._tmvp_pu(x0, y0, nw, nh, 0)
        if t0 is None:
            return None
        # list 1 target ref 0 (8.5.3.2.8 invoked per list)
        if self.col is None or self.nref1 == 0:
            return None
        c_inter4, c_mv4, c_refpoc4, col_poc = self.col

        def probe(x, y):
            if x >= self.w or y >= self.h:
                return None
            xg, yg = (x >> 4) << 4, (y >> 4) << 4
            if not c_inter4[yg >> 2, xg >> 2]:
                return None
            return (tuple(int(v) for v in c_mv4[yg >> 2, xg >> 2]),
                    int(c_refpoc4[yg >> 2, xg >> 2]))

        got = None
        if ((y0 + nh) >> self.ctb_log2) == (y0 >> self.ctb_log2):
            got = probe(x0 + nw, y0 + nh)
        if got is None:
            got = probe(x0 + (nw >> 1), y0 + (nh >> 1))
        if got is None:
            return None
        mv, col_ref = got
        tb1 = self.cur_poc - self.refs1[0][1]
        td = col_poc - col_ref
        t1 = mv if tb1 == td else _scale_mv_np(mv, tb1, td)
        return ((True, True), (t0, t1), (self.refs[0][1], self.refs1[0][1]))

    # ------------------------------------------------------------ AMVP (B)
    def _b_amvp_pu(self, dec, px, py, pw, ph, log2):
        # inter_pred_idc (9.3.3.10): 8x4/4x8 PUs use a single ctx-4 bin
        if pw + ph == 12:
            kinds = "L1" if dec.decode_bin(OFFSETS["inter_pred_idc"] + 4) else "L0"
        else:
            if dec.decode_bin(OFFSETS["inter_pred_idc"] + self._ctdepth(log2)):
                kinds = "BI"
            elif dec.decode_bin(OFFSETS["inter_pred_idc"] + 4):
                kinds = "L1"
            else:
                kinds = "L0"
        pf = [kinds in ("L0", "BI"), kinds in ("L1", "BI")]
        mv = [(0, 0), (0, 0)]
        rp = [0, 0]
        if pf[0]:
            r0 = self._decode_ref_idx(dec)
            mvd = _decode_mvd(dec)
            mvp0, mvp1 = self._amvp_rect_list(px, py, pw, ph, 0, r0)
            mvp = mvp1 if dec.decode_bin(OFFSETS["mvp_flag"]) else mvp0
            mv[0] = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            rp[0] = self.refs[r0][1]
        if pf[1]:
            r1 = self._decode_ref_idx_l1(dec)
            if self.mvd_l1_zero and kinds == "BI":
                mvd = (0, 0)
            else:
                mvd = _decode_mvd(dec)
            mvp0, mvp1 = self._amvp_rect_list(px, py, pw, ph, 1, r1)
            mvp = mvp1 if dec.decode_bin(OFFSETS["mvp_flag"]) else mvp0
            mv[1] = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            rp[1] = self.refs1[r1][1]
        return (tuple(pf), (tuple(mv[0]), tuple(mv[1])), tuple(rp))

    def _ctdepth(self, log2):
        return self.ctb_log2 - log2

    def _decode_ref_idx_l1(self, dec) -> int:
        if self.nref1 <= 1:
            return 0
        if not dec.decode_bin(OFFSETS["ref_idx"]):
            return 0
        idx = 1
        if self.nref1 > 2:
            if dec.decode_bin(OFFSETS["ref_idx"] + 1):
                idx = 2
                while idx < self.nref1 - 1 and dec.decode_bypass():
                    idx += 1
        return idx

    def _amvp_rect_list(self, x0, y0, nw, nh, lx, ridx):
        """Per-list AMVP using full-motion neighbors (8.5.3.2.7)."""
        tpoc = (self.refs if lx == 0 else self.refs1)[ridx][1]
        a_pos = ((x0 - 1, y0 + nh), (x0 - 1, y0 + nh - 1))
        b_pos = ((x0 + nw, y0 - 1), (x0 + nw - 1, y0 - 1), (x0 - 1, y0 - 1))

        def cand_at(pos, allow_scale):
            nb = self._nb_full(*pos)
            if nb is None:
                return None
            pf, mvs, rps = nb
            # same-ref: prefer the same list then the other list (same poc)
            for l in (lx, 1 - lx):
                if pf[l] and rps[l] == tpoc:
                    return mvs[l]
            if not allow_scale:
                return None
            for l in (lx, 1 - lx):
                if pf[l]:
                    return _scale_mv_np(mvs[l], self.cur_poc - tpoc,
                                        self.cur_poc - rps[l])
            return None

        def pass_over(positions, allow_scale):
            for pos in positions:
                c = cand_at(pos, allow_scale)
                if c is not None:
                    return c
            return None

        is_scaled = any(self._nb_full(*p) is not None for p in a_pos)
        a = pass_over(a_pos, False)
        if a is None and is_scaled:
            a = pass_over(a_pos, True)
        b = pass_over(b_pos, False)
        if not is_scaled:
            if a is None:
                a = b
            b = pass_over(b_pos, True)
        cands = []
        if a is not None:
            cands.append(a)
        if b is not None and b != a:
            cands.append(b)
        if len(cands) < 2 and self.col is not None:
            # temporal candidate scaled to THIS list's target ref picture
            # (8.5.3.2.8 invoked with refIdxLX: not always L1 ref 0)
            t = self._tmvp_pu(x0, y0, nw, nh, 0, target_poc=tpoc)
            if t is not None:
                cands.append(t)
        while len(cands) < 2:
            cands.append((0, 0))
        return cands[0], cands[1]

    # ------------------------------------------------------------- commit
    def _commit_b(self, x0, y0, nw, nh, mot, skip: bool) -> None:
        pf, mvs, rps = mot
        wtab = self.weights
        preds = []
        ridxs = [0, 0]
        for l, (refl, active) in enumerate(((self.refs, pf[0]), (self.refs1, pf[1]))):
            if not active:
                preds.append(None)
                continue
            ridx = 0
            for k, (pl, poc) in enumerate(refl):
                if poc == rps[l]:
                    ridx = k
                    break
            ridxs[l] = ridx
            (ry, ru, rv), _poc = refl[ridx]
            mvx, mvy = mvs[l]
            raw = "raw14" if (pf[0] and pf[1]) or wtab is not None else None
            py_ = _mc_np(ry, x0, y0, nw, nh, mvx, mvy, True, raw)
            pu_ = _mc_np(ru, x0 >> 1, y0 >> 1, nw >> 1, nh >> 1, mvx, mvy, False, raw)
            pv_ = _mc_np(rv, x0 >> 1, y0 >> 1, nw >> 1, nh >> 1, mvx, mvy, False, raw)
            preds.append((py_, pu_, pv_))

        def lw(l, r):
            key = "luma" if l == 0 else "luma1"
            return wtab[key][r]

        def cw(l, r):
            key = "chroma" if l == 0 else "chroma1"
            return wtab[key][r]

        if pf[0] and pf[1]:
            if wtab is None:
                out = [_bi_round(a, b) for a, b in zip(preds[0], preds[1])]
            else:
                ld, cd = wtab["luma_denom"], wtab["chroma_denom"]
                (w0, o0), (w1, o1) = lw(0, ridxs[0]), lw(1, ridxs[1])
                (cb0, cbo0), (cr0, cro0) = cw(0, ridxs[0])
                (cb1, cbo1), (cr1, cro1) = cw(1, ridxs[1])
                out = [
                    _bi_weighted(preds[0][0], preds[1][0], w0, o0, w1, o1, ld),
                    _bi_weighted(preds[0][1], preds[1][1], cb0, cbo0, cb1, cbo1, cd),
                    _bi_weighted(preds[0][2], preds[1][2], cr0, cro0, cr1, cro1, cd),
                ]
        else:
            l = 0 if pf[0] else 1
            if wtab is None:
                out = preds[l]
            else:
                ld, cd = wtab["luma_denom"], wtab["chroma_denom"]
                w_, o_ = lw(l, ridxs[l])
                (cbw, cbo), (crw, cro) = cw(l, ridxs[l])
                out = [
                    _uni_weighted(preds[l][0], w_, o_, ld),
                    _uni_weighted(preds[l][1], cbw, cbo, cd),
                    _uni_weighted(preds[l][2], crw, cro, cd),
                ]
        self.y[y0 : y0 + nh, x0 : x0 + nw] = out[0]
        self.u[y0 >> 1 : (y0 + nh) >> 1, x0 >> 1 : (x0 + nw) >> 1] = out[1]
        self.v[y0 >> 1 : (y0 + nh) >> 1, x0 >> 1 : (x0 + nw) >> 1] = out[2]
        s = slice(y0 >> 2, (y0 + nh) >> 2), slice(x0 >> 2, (x0 + nw) >> 2)
        self.inter4[s] = 1
        self.pf4[s] = pf
        self.mv4l[s] = np.asarray(mvs, np.int32)
        self.refpoc4l[s] = rps
        # L0 view for inherited bookkeeping (bS, TMVP retention)
        self.mv4[s] = mvs[0] if pf[0] else mvs[1]
        self.refpoc4[s] = rps[0] if pf[0] else rps[1]
        self.skip4[s] = 1 if skip else 0
        self.mode4[s] = 1

    # ------------------------------------------------------------- deblock
    def bs_maps(self):
        """bS for B pictures (8.7.2.4 full rule: hypothesis counts, ref
        sets, per-list or cross-list MV compares), 4-segment granularity."""
        h8, w8 = self.edge_v.shape
        intra4 = self.inter4 == 0

        def mv_bs_cell(ca, cb):
            pa, ma, ra = self.pf4[ca], self.mv4l[ca], self.refpoc4l[ca]
            pb, mb, rb = self.pf4[cb], self.mv4l[cb], self.refpoc4l[cb]
            na, nb_ = int(pa[0]) + int(pa[1]), int(pb[0]) + int(pb[1])
            if na != nb_:
                return 1
            big = lambda x, y: bool(np.any(np.abs(x - y) >= 4))
            if na == 1:
                la = 0 if pa[0] else 1
                lb = 0 if pb[0] else 1
                if ra[la] != rb[lb]:
                    return 1
                return 1 if big(ma[la], mb[lb]) else 0
            # bi vs bi
            sa, sb = {int(ra[0]), int(ra[1])}, {int(rb[0]), int(rb[1])}
            if sa != sb:
                return 1
            if ra[0] != ra[1]:  # two distinct pictures: match by picture
                for l in range(2):
                    lb = 0 if rb[0] == ra[l] else 1
                    if big(ma[l], mb[lb]):
                        return 1
                return 0
            # same picture both hypotheses: either pairing may satisfy
            straight = not (big(ma[0], mb[0]) or big(ma[1], mb[1]))
            crossed = not (big(ma[0], mb[1]) or big(ma[1], mb[0]))
            return 0 if (straight or crossed) else 1

        def edge_bs(on, cells_p, cells_q):
            out = np.zeros(len(cells_p), np.int32)
            for k, (cp, cq) in enumerate(zip(cells_p, cells_q)):
                if not on[k]:
                    continue
                if intra4[cp] or intra4[cq]:
                    out[k] = 2
                elif self.cbf4[cp] or self.cbf4[cq]:
                    out[k] = 1
                else:
                    out[k] = mv_bs_cell(cp, cq)
            return out

        h4, w4 = self.inter4.shape
        bs_v = np.zeros((w8 - 1, 2 * h8), np.int32)
        for e in range(1, w8):
            c4 = 2 * e
            on = np.repeat(self.edge_v[:, e], 2)
            cells_p = [(r, c4 - 1) for r in range(h4)]
            cells_q = [(r, c4) for r in range(h4)]
            bs_v[e - 1] = edge_bs(on, cells_p, cells_q)
        bs_h = np.zeros((h8 - 1, 2 * w8), np.int32)
        for e in range(1, h8):
            r4 = 2 * e
            on = np.repeat(self.edge_h[e, :], 2)
            cells_p = [(r4 - 1, c) for c in range(w4)]
            cells_q = [(r4, c) for c in range(w4)]
            bs_h[e - 1] = edge_bs(on, cells_p, cells_q)
        return bs_v, bs_h
