"""Generic recursive P-slice decoder: alien inter streams (restricted set).

Extends the any-CTB intra engine (generic_intra.py) with the P-slice CU
toolset: cu_skip_flag, pred_mode, PART_2Nx2N inter PUs, spatial merge
(8.5.3.2.3, pruned candidate list), AMVP (8.5.3.2.7), MVD (7.3.8.9),
exact per-sample-clipped MC (8.5.4.2, the DCT-IF taps from ops/mc.py),
rqt_root_cbf + inter transform trees, and inter bS derivation for
deblocking (8.7.2.4).

Current envelope (checked against libx265): P slices with the COMPLETE
partition set (2Nx2N, 2NxN, Nx2N, and all four AMP shapes), up to 5
merge candidates, multiple references, temporal MVP, weighted
prediction, inter TU trees, adaptive QP — beyond x265's default medium
preset and its slow presets' partition tools.  Remaining for round 2:
B slices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..entropy.cabac_tables import OFFSETS
from ..entropy.slice_data import _decode_mvd
from ..entropy.syntax import decode_residual
from ..ops.mc import CHROMA_FILTERS, LUMA_FILTERS
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform
from .generic_intra import GenericIntraDecoder


def _scale_mv_np(mv, tb: int, td: int):
    """Temporal MV scaling (8.5.3.2.9) in exact integer arithmetic."""
    tb = max(-128, min(127, tb))
    td = max(-128, min(127, td))
    abs_td = abs(td)
    tx = (16384 + (abs_td >> 1)) // max(abs_td, 1)
    if td < 0:
        tx = -tx
    dsf = max(-4096, min(4095, (tb * tx + 32) >> 6))
    out = []
    for v in mv:
        prod = dsf * v
        sign = -1 if prod < 0 else 1
        out.append(max(-32768, min(32767, sign * ((abs(prod) + 127) >> 8))))
    return tuple(out)


def _mc_np(ref: np.ndarray, x0: int, y0: int, w: int, h: int,
           mvx: int, mvy: int, luma: bool, weight=None) -> np.ndarray:
    """Exact MC for one block: per-sample coordinate clipping (8.5.4.2.2),
    two-stage DCT-IF, uni-pred rounding.  mv in luma quarter-pel units."""
    H, W = ref.shape
    if luma:
        ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
        fx, fy = mvx & 3, mvy & 3
        taps_h = LUMA_FILTERS[fx].astype(np.int64)
        taps_v = LUMA_FILTERS[fy].astype(np.int64)
        reach = 3
        ntap = 8
    else:
        ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
        fx, fy = mvx & 7, mvy & 7
        taps_h = CHROMA_FILTERS[fx].astype(np.int64)
        taps_v = CHROMA_FILTERS[fy].astype(np.int64)
        reach = 1
        ntap = 4
    xs = np.clip(np.arange(ix - reach, ix - reach + w + ntap - 1), 0, W - 1)
    ys = np.clip(np.arange(iy - reach, iy - reach + h + ntap - 1), 0, H - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int64)
    tmp = np.zeros((win.shape[0], w), np.int64)
    for k in range(ntap):
        tmp += taps_h[k] * win[:, k : k + w]
    out = np.zeros((h, w), np.int64)
    for k in range(ntap):
        out += taps_v[k] * tmp[k : k + h, :]
    out >>= 6  # 14-bit intermediate domain (shift2; shift1 = 0 at 8 bit)
    if weight == "raw14":
        return out
    if weight is None:
        return np.clip((out + 32) >> 6, 0, 255).astype(np.int32)
    # explicit weighted uni-prediction (8.5.3.3.4.3): operands in the
    # 14-bit domain, log2Wd = denom + (14 - bitDepth)
    wgt, off, denom = weight
    log2wd = denom + 6
    val = ((out * wgt + (1 << (log2wd - 1))) >> log2wd) + off
    return np.clip(val, 0, 255).astype(np.int32)


class GenericInterDecoder(GenericIntraDecoder):
    """Adds P-slice decoding over the intra engine.

    refs: RefPicList0 as [((y, u, v) int32 planes, poc), ...];
    col: optional TMVP source = (inter4, mv4, refpoc4, col_poc) from the
    collocated picture; cur_poc: this picture's POC."""

    def __init__(self, sps, pps, sh, refs, col=None, cur_poc=0):
        super().__init__(sps, pps, sh.qp, sh=sh)
        self.refs = refs
        self.weights = getattr(sh, "weights", None)
        self.cur_poc = cur_poc
        self.nref = len(refs)
        self.max_merge = getattr(sh, "max_num_merge_cand", 5) or 5
        self.col = col if getattr(sh, "temporal_mvp", False) else None
        # inter state maps at 4x4 cells
        h4, w4 = self.h // 4, self.w // 4
        self.inter4 = np.zeros((h4, w4), np.int32)  # 1 = inter-coded cell
        self.mv4 = np.zeros((h4, w4, 2), np.int32)
        self.ref4 = np.zeros((h4, w4), np.int32)  # ref_idx per cell
        self.refpoc4 = np.zeros((h4, w4), np.int32)  # its ref picture POC
        self.skip4 = np.zeros((h4, w4), np.int32)
        self.cbf4 = np.zeros((h4, w4), np.int32)  # luma TU cbf (for bS 1)

    # --------------------------------------------------------- CU dispatch
    def _coding_unit(self, dec, x0, y0, log2) -> None:
        n = 1 << log2
        # cu_skip_flag (ctx from neighbor skip flags, 9.3.4.2.2)
        ctx = 0
        if x0 > 0 and self._same_slice(x0 - 1, y0) \
                and self.skip4[y0 >> 2, (x0 - 1) >> 2]:
            ctx += 1
        if y0 > 0 and self._same_slice(x0, y0 - 1) \
                and self.skip4[(y0 - 1) >> 2, x0 >> 2]:
            ctx += 1
        if dec.decode_bin(OFFSETS["cu_skip_flag"] + ctx):
            self._inter_pu_merge(dec, x0, y0, n, skip=True)
            self._mark_edges(x0, y0, n)
            return
        if dec.decode_bin(OFFSETS["pred_mode_flag"]):
            # intra CU in a P slice: inter neighbors contribute DC to MPM
            super()._coding_unit(dec, x0, y0, log2)
            return
        # inter CU: part_mode binarization (9.3.3.7 incl. the AMP suffix)
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
        if part == "2Nx2N":
            if dec.decode_bin(OFFSETS["merge_flag"]):
                self._inter_pu_merge(dec, x0, y0, n, skip=False)
                return
            ridx = self._decode_ref_idx(dec)
            mvd = _decode_mvd(dec)
            mvp0, mvp1 = self._amvp(x0, y0, n, ridx)
            use1 = dec.decode_bin(OFFSETS["mvp_flag"])
            mvp = mvp1 if use1 else mvp0
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            self._commit_inter(x0, y0, n, mv, ridx, skip=False)
            self._inter_residual(dec, x0, y0, log2, root_cbf_coded=True)
            return
        # rect / AMP partitions: two PUs, each merge or AMVP
        q = n >> 2
        geom = {
            "2NxN": ((n, n >> 1), (0, n >> 1)),
            "2NxnU": ((n, q), (0, q)),
            "2NxnD": ((n, 3 * q), (0, 3 * q)),
            "Nx2N": ((n >> 1, n), (n >> 1, 0)),
            "nLx2N": ((q, n), (q, 0)),
            "nRx2N": ((3 * q, n), (3 * q, 0)),
        }
        (w0, h0), (dx1, dy1) = geom[part]
        pus = [(x0, y0, w0, h0),
               (x0 + dx1, y0 + dy1, n - dx1 if dx1 else n, n - dy1 if dy1 else n)]
        # the split edge (marked only when it lands on the 8-pel grid)
        if dy1:
            pus[1] = (x0, y0 + dy1, n, n - dy1)
            self._mark_edges(x0, y0 + dy1, n)
        else:
            pus[1] = (x0 + dx1, y0, n - dx1, n)
            self._mark_edges(x0 + dx1, y0, n)
        for pi, (px, py, pw, ph) in enumerate(pus):
            if dec.decode_bin(OFFSETS["merge_flag"]):
                idx = 0
                if self.max_merge > 1:
                    if dec.decode_bin(OFFSETS["merge_idx"]):
                        idx = 1
                        while idx < self.max_merge - 1 and dec.decode_bypass():
                            idx += 1
                mv, ridx = self._merge_list(px, py, pw, ph, part, pi)[idx]
            else:
                ridx = self._decode_ref_idx(dec)
                mvd = _decode_mvd(dec)
                mvp0, mvp1 = self._amvp_rect(px, py, pw, ph, ridx)
                use1 = dec.decode_bin(OFFSETS["mvp_flag"])
                mvp = mvp1 if use1 else mvp0
                mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            self._commit_inter_rect(px, py, pw, ph, mv, ridx, skip=False)
        self._inter_residual(dec, x0, y0, log2, root_cbf_coded=True,
                             part_2nx2n=False)

    def _decode_ref_idx(self, dec) -> int:
        """ref_idx_l0 TR coding (9.3.3.x): two context bins then bypass."""
        if self.nref <= 1:
            return 0
        if not dec.decode_bin(OFFSETS["ref_idx"]):
            return 0
        idx = 1
        if self.nref > 2:
            if dec.decode_bin(OFFSETS["ref_idx"] + 1):
                idx = 2
                while idx < self.nref - 1 and dec.decode_bypass():
                    idx += 1
        return idx

    # ------------------------------------------------------------- motion
    def _nb_mv(self, x, y):
        """((mvx, mvy), ref_idx) at sample position (x, y), or None.

        Availability is commit order: inter4 is set exactly when a PU's
        motion is decoded, which IS the spec decoding order — including
        PU0 of the current CU being available to PU1's AMVP (the merge
        derivation's extra partIdx-1 exclusions are applied by the
        caller, 8.5.3.2.3)."""
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return None
        if not self._same_slice(x, y):
            return None
        if not self.inter4[y >> 2, x >> 2]:
            return None
        return (tuple(int(v) for v in self.mv4[y >> 2, x >> 2]),
                int(self.ref4[y >> 2, x >> 2]))

    def _merge_list(self, x0, y0, nw, nh=None, part="2Nx2N", part_idx=0):
        """Spatial merge candidates with spec pruning (8.5.3.2.3); the
        second PU of a rect partition excludes the candidate inside its
        own CU (A1 for Nx2N, B1 for 2NxN)."""
        if nh is None:
            nh = nw
        n = nw  # TMVP uses the PU extent below
        self._cur_x, self._cur_y = x0, y0
        a1 = self._nb_mv(x0 - 1, y0 + nh - 1)
        b1 = self._nb_mv(x0 + nw - 1, y0 - 1)
        b0 = self._nb_mv(x0 + nw, y0 - 1)
        a0 = self._nb_mv(x0 - 1, y0 + nh)
        if part_idx == 1 and part in ("Nx2N", "nLx2N", "nRx2N"):
            a1 = None  # vertical splits: A1 lies in PU0 (8.5.3.2.3)
        if part_idx == 1 and part in ("2NxN", "2NxnU", "2NxnD"):
            b1 = None  # horizontal splits: B1 lies in PU0
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
            b2 = self._nb_mv(x0 - 1, y0 - 1)
            if b2 is not None and b2 != a1 and b2 != b1:
                cands.append(b2)
        t = self._tmvp_pu(x0, y0, nw, nh, 0)
        if t is not None:
            cands.append((t, 0))  # temporal candidate: appended, never pruned
        # zero candidates cycle through the reference indices (8.5.3.2.4)
        zr = 0
        while len(cands) < self.max_merge:
            cands.append(((0, 0), min(zr, self.nref - 1)))
            zr += 1
        return cands[: self.max_merge]

    def _tmvp(self, x0, y0, n, target_ref):
        return self._tmvp_pu(x0, y0, n, n, target_ref)

    def _tmvp_pu(self, x0, y0, nw, nh, target_ref, target_poc=None):
        """Temporal MV candidate (8.5.3.2.8): bottom-right col position if
        inside the picture and the same CTB row, else the center; sampled
        at the 16x16 compression grid; scaled by POC distances.  The
        scaling target is refs[target_ref] unless an explicit target_poc
        is given (B slices scale per-list, 8.5.3.2.9)."""
        if self.col is None:
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
        xbr, ybr = x0 + nw, y0 + nh
        if (ybr >> self.ctb_log2) == (y0 >> self.ctb_log2):
            got = probe(xbr, ybr)
        if got is None:
            got = probe(x0 + (nw >> 1), y0 + (nh >> 1))
        if got is None:
            return None
        mv, col_ref_poc = got
        if target_poc is None:
            target_poc = self.refs[target_ref][1]
        tb = self.cur_poc - target_poc
        td = col_poc - col_ref_poc
        if tb == td:
            return mv
        return _scale_mv_np(mv, tb, td)

    def _inter_pu_merge(self, dec, x0, y0, n, skip: bool) -> None:
        idx = 0
        if self.max_merge > 1:
            # merge_idx: first bin ctx-coded, rest bypass TR (9.3.3.9)
            if dec.decode_bin(OFFSETS["merge_idx"]):
                idx = 1
                while idx < self.max_merge - 1 and dec.decode_bypass():
                    idx += 1
        mv, ridx = self._merge_list(x0, y0, n, n, "2Nx2N", 0)[idx]
        self._commit_inter(x0, y0, n, mv, ridx, skip)
        if not skip:
            # 2Nx2N merge: rqt_root_cbf is inferred 1 (7.3.8.5)
            self._inter_residual(dec, x0, y0, n.bit_length() - 1, root_cbf_coded=False)

    def _amvp(self, x0, y0, n, target_ref):
        return self._amvp_rect(x0, y0, n, n, target_ref)

    def _amvp_rect(self, x0, y0, nw, nh, target_ref):
        """AMVP (8.5.3.2.7): same-ref pass then POC-scaled pass per side,
        with the B->A promotion when no left neighbor is inter."""
        self._cur_x, self._cur_y = x0, y0
        n = nw
        tpoc = self.refs[target_ref][1]
        a_pos = ((x0 - 1, y0 + nh), (x0 - 1, y0 + nh - 1))
        b_pos = ((x0 + nw, y0 - 1), (x0 + nw - 1, y0 - 1), (x0 - 1, y0 - 1))

        def ref_poc(r):
            return self.refs[r][1]

        def same_ref_pass(positions):
            for pos in positions:
                nb = self._nb_mv(*pos)
                if nb is not None and ref_poc(nb[1]) == tpoc:
                    return nb[0]
            return None

        def scaled_pass(positions):
            for pos in positions:
                nb = self._nb_mv(*pos)
                if nb is not None:
                    mv, r = nb
                    if ref_poc(r) == tpoc:
                        return mv
                    return _scale_mv_np(
                        mv, self.cur_poc - tpoc, self.cur_poc - ref_poc(r)
                    )
            return None

        is_scaled = any(self._nb_mv(*p) is not None for p in a_pos)
        a = same_ref_pass(a_pos)
        if a is None and is_scaled:
            a = scaled_pass(a_pos)
        b = same_ref_pass(b_pos)
        if not is_scaled:
            # promotion (8.5.3.2.7): B's no-scale result becomes A, and B is
            # re-derived with scaling allowed
            if a is None:
                a = b
            b = scaled_pass(b_pos)
        cands = []
        if a is not None:
            cands.append(a)
        if b is not None and b != a:
            cands.append(b)
        if len(cands) < 2:
            t = self._tmvp_pu(x0, y0, nw, nh, target_ref)
            if t is not None:
                cands.append(t)
        while len(cands) < 2:
            cands.append((0, 0))
        return cands[0], cands[1]

    def _commit_inter_rect(self, x0, y0, nw, nh, mv, ridx, skip: bool) -> None:
        (ry, ru, rv), rpoc = self.refs[ridx]
        wl = wcb = wcr = None
        if self.weights is not None:
            ld, cd = self.weights["luma_denom"], self.weights["chroma_denom"]
            lw, lo = self.weights["luma"][ridx]
            (cbw, cbo), (crw, cro) = self.weights["chroma"][ridx]
            wl = (lw, lo, ld)
            wcb = (cbw, cbo, cd)
            wcr = (crw, cro, cd)
        self.y[y0 : y0 + nh, x0 : x0 + nw] = _mc_np(ry, x0, y0, nw, nh, mv[0], mv[1], True, wl)
        xc, yc = x0 >> 1, y0 >> 1
        wc, hc = nw >> 1, nh >> 1
        self.u[yc : yc + hc, xc : xc + wc] = _mc_np(ru, xc, yc, wc, hc, mv[0], mv[1], False, wcb)
        self.v[yc : yc + hc, xc : xc + wc] = _mc_np(rv, xc, yc, wc, hc, mv[0], mv[1], False, wcr)
        s = slice(y0 >> 2, (y0 + nh) >> 2), slice(x0 >> 2, (x0 + nw) >> 2)
        self.inter4[s] = 1
        self.mv4[s] = mv
        self.ref4[s] = ridx
        self.refpoc4[s] = rpoc
        self.skip4[s] = 1 if skip else 0
        self.mode4[s] = 1

    def _commit_inter(self, x0, y0, n, mv, ridx, skip: bool) -> None:
        (ry, ru, rv), rpoc = self.refs[ridx]
        wl = wcb = wcr = None
        if self.weights is not None:
            ld, cd = self.weights["luma_denom"], self.weights["chroma_denom"]
            lw, lo = self.weights["luma"][ridx]
            (cbw, cbo), (crw, cro) = self.weights["chroma"][ridx]
            wl = (lw, lo, ld)
            wcb = (cbw, cbo, cd)
            wcr = (crw, cro, cd)
        self.y[y0 : y0 + n, x0 : x0 + n] = _mc_np(ry, x0, y0, n, n, mv[0], mv[1], True, wl)
        xc, yc, nc = x0 >> 1, y0 >> 1, n >> 1
        self.u[yc : yc + nc, xc : xc + nc] = _mc_np(ru, xc, yc, nc, nc, mv[0], mv[1], False, wcb)
        self.v[yc : yc + nc, xc : xc + nc] = _mc_np(rv, xc, yc, nc, nc, mv[0], mv[1], False, wcr)
        s = slice(y0 >> 2, (y0 + n) >> 2), slice(x0 >> 2, (x0 + n) >> 2)
        self.inter4[s] = 1
        self.mv4[s] = mv
        self.ref4[s] = ridx
        self.refpoc4[s] = rpoc
        self.skip4[s] = 1 if skip else 0
        self.mode4[s] = 1  # inter cells contribute DC to intra MPM (8.4.2)

    # ----------------------------------------------------------- residual
    def _inter_residual(self, dec, x0, y0, log2, root_cbf_coded: bool,
                        part_2nx2n: bool = True) -> None:
        if root_cbf_coded and not dec.decode_bin(OFFSETS["rqt_root_cbf"]):
            return
        self._inter_tt(dec, x0, y0, log2, 0, cbf_cb_parent=True,
                       cbf_cr_parent=True, inter_split=not part_2nx2n)

    def _inter_tt(self, dec, x0, y0, log2, depth, cbf_cb_parent, cbf_cr_parent,
                  inter_split=False) -> None:
        # interSplitFlag (7.3.8.8) = 1 only when max_td_inter == 0 and the
        # CU is not 2Nx2N; it both forces the depth-0 split and extends
        # MaxTrafoDepth by one.  With max_td_inter > 0 nothing changes.
        td = getattr(self.sps, "max_td_inter", 0)
        isf = 1 if (inter_split and td == 0) else 0
        max_depth = td + isf
        forced = isf == 1 and depth == 0
        if log2 <= self.max_tb_log2 and log2 > self.min_tb_log2 \
                and depth < max_depth and not forced:
            split = bool(dec.decode_bin(OFFSETS["split_transform_flag"] + 5 - log2))
        else:
            split = log2 > self.max_tb_log2 or forced
        cbf_cb = cbf_cr = False
        if log2 > 2:
            if cbf_cb_parent:
                cbf_cb = bool(dec.decode_bin(OFFSETS["cbf_chroma"] + depth))
            if cbf_cr_parent:
                cbf_cr = bool(dec.decode_bin(OFFSETS["cbf_chroma"] + depth))
        else:
            cbf_cb, cbf_cr = cbf_cb_parent, cbf_cr_parent
        if split:
            h = 1 << (log2 - 1)
            for j, (dy, dx) in enumerate(((0, 0), (0, h), (h, 0), (h, h))):
                self._inter_tt(dec, x0 + dx, y0 + dy, log2 - 1, depth + 1,
                               cbf_cb, cbf_cr, inter_split)
                if log2 - 1 == 2 and j == 3:
                    self._add_chroma_resid(dec, x0, y0, 2, cbf_cb, cbf_cr)
            return
        # leaf: inter cbf_luma coded only if depth > 0 or any chroma cbf
        if depth == 0 and not (cbf_cb or cbf_cr):
            cbf_luma = True  # inferred (rqt_root_cbf was 1)
        else:
            cbf_luma = bool(dec.decode_bin(OFFSETS["cbf_luma"] + (1 if depth == 0 else 0)))
        if cbf_luma or ((cbf_cb or cbf_cr) and log2 > 2) or (
            log2 == 2 and ((y0 >> 2) & 1) and ((x0 >> 2) & 1) and (cbf_cb or cbf_cr)
        ):
            self._maybe_qp_delta(dec)
        n = 1 << log2
        self._mark_edges(x0, y0, n)
        if cbf_luma:
            if self.tskip and log2 == 2:
                lev, tsf = decode_residual(dec, log2, 0, 0, sdh=self.sdh,
                                           tskip=True)
            else:
                lev, tsf = decode_residual(dec, log2, 0, 0, sdh=self.sdh), False
            resid = (self._resid_ts(lev, self.qp_y, log2, 0, False) if tsf
                     else self._resid(lev, self.qp_y, log2, 0, False))
            reg = self.y[y0 : y0 + n, x0 : x0 + n]
            self.y[y0 : y0 + n, x0 : x0 + n] = np.clip(reg + resid, 0, 255)
            self.cbf4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = 1
        if log2 > 2:
            self._add_chroma_resid(dec, x0, y0, log2 - 1, cbf_cb, cbf_cr)

    def _add_chroma_resid(self, dec, x0, y0, log2c, cbf_cb, cbf_cr) -> None:
        xc, yc = x0 >> 1, y0 >> 1
        n = 1 << log2c
        for canvas, cbf, cidx, qpc in ((self.u, cbf_cb, 1, self.qp_cb),
                                       (self.v, cbf_cr, 2, self.qp_cr)):
            if not cbf:
                continue
            if self.tskip and log2c == 2:
                lev, tsf = decode_residual(dec, log2c, cidx, 0, sdh=self.sdh,
                                           tskip=True)
            else:
                lev, tsf = decode_residual(dec, log2c, cidx, 0,
                                           sdh=self.sdh), False
            resid = (self._resid_ts(lev, qpc, log2c, cidx, False) if tsf
                     else self._resid(lev, qpc, log2c, cidx, False))
            reg = canvas[yc : yc + n, xc : xc + n]
            canvas[yc : yc + n, xc : xc + n] = np.clip(reg + resid, 0, 255)

    # ------------------------------------------------------------ deblock
    def bs_maps(self):
        """bS per 8-pel edge at 4-sample-segment granularity (8.7.2.4):
        derived from the 4x4 cells ADJACENT to each edge (p side / q side),
        so TU-split cbf and per-PU MVs resolve exactly."""
        h8, w8 = self.edge_v.shape
        intra4 = self.inter4 == 0
        bs_v = np.zeros((w8 - 1, 2 * h8), np.int32)
        for e in range(1, w8):
            c4 = 2 * e  # 4-cell column right of the edge
            on = np.repeat(self.edge_v[:, e], 2)
            p_i, q_i = intra4[:, c4 - 1], intra4[:, c4]
            mvdiff = np.any(np.abs(self.mv4[:, c4 - 1] - self.mv4[:, c4]) >= 4, axis=-1)
            refdiff = self.refpoc4[:, c4 - 1] != self.refpoc4[:, c4]
            one = (self.cbf4[:, c4 - 1] | self.cbf4[:, c4] | mvdiff | refdiff) > 0
            bs_v[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
        bs_h = np.zeros((h8 - 1, 2 * w8), np.int32)
        for e in range(1, h8):
            r4 = 2 * e
            on = np.repeat(self.edge_h[e, :], 2)
            p_i, q_i = intra4[r4 - 1, :], intra4[r4, :]
            mvdiff = np.any(np.abs(self.mv4[r4 - 1] - self.mv4[r4]) >= 4, axis=-1)
            refdiff = self.refpoc4[r4 - 1] != self.refpoc4[r4]
            one = (self.cbf4[r4 - 1] | self.cbf4[r4] | mvdiff | refdiff) > 0
            bs_h[e - 1] = np.where(on, np.where(p_i | q_i, 2, one.astype(int)), 0)
        return bs_v, bs_h
