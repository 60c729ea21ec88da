"""Generic CU-quadtree I-slice entropy coding (any CTB size).

Walks the decision trees produced by encoder/cu32.py and emits exact
7.3.8.4/7.3.8.5/7.3.8.8 syntax: split_cu_flag with the depth-map context
(9.3.4.2.2), per-leaf intra PU syntax (PART_NxN at min CB), DM chroma,
and transform-unit residuals with mode-dependent scans (7.4.9.11).  The
inverse is the generic decoder (decoder/generic_intra.py), which this
mirrors map-for-map; streams are validated against libavcodec in
tests/test_cu32.py.
"""

from __future__ import annotations

import numpy as np

from ..core.tables import residual_scan_idx
from .cabac import CabacEncoder
from .cabac_tables import OFFSETS
from .slice_data import _encode_luma_mode, _encode_luma_mode_tail, _mpm_list_np
from .syntax import encode_residual

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))


class _QuadWriter:
    """Frame-level maps mirroring GenericIntraDecoder (depth4/mode4)."""

    def __init__(self, cfg, slice_qp, qs=None):
        self.cfg = cfg
        self.w, self.h = cfg.width, cfg.height
        self.ctb_log2 = cfg.ctb_size.bit_length() - 1
        self.min_cb_log2 = cfg.min_cb_log2
        self.depth4 = np.zeros((self.h // 4, self.w // 4), np.int32)
        self.mode4 = np.ones((self.h // 4, self.w // 4), np.int32)
        self.qs = qs  # QpState: cu_qp_delta coded at the first cbf TU

    def _qp_tu(self, enc, any_cbf) -> None:
        if self.qs is not None and any_cbf:
            self.qs.tu(enc)

    def _split_ctx(self, x0, y0, depth):
        ctx = 0
        if x0 > 0 and int(self.depth4[y0 >> 2, (x0 - 1) >> 2]) > depth:
            ctx += 1
        if y0 > 0 and int(self.depth4[(y0 - 1) >> 2, x0 >> 2]) > depth:
            ctx += 1
        return ctx

    def _cands(self, x0, y0):
        cl = 1 << self.ctb_log2
        a = 1 if x0 == 0 else int(self.mode4[y0 >> 2, (x0 - 1) >> 2])
        if y0 == 0 or ((y0 - 1) // cl) != (y0 // cl):
            b = 1
        else:
            b = int(self.mode4[(y0 - 1) >> 2, x0 >> 2])
        return a, b

    def ctu(self, enc, node, x0, y0):
        self._quadtree(enc, node, x0, y0, self.ctb_log2, 0)

    def _quadtree(self, enc, node, x0, y0, log2, depth):
        n = 1 << log2
        split = "split" in node
        if log2 > self.min_cb_log2:
            enc.encode_bin(OFFSETS["split_cu_flag"] + self._split_ctx(x0, y0, depth),
                           1 if split else 0)
        if split:
            h = n >> 1
            for (dy, dx), sub in zip(_ZO, node["split"]):
                self._quadtree(enc, sub, x0 + dx * h, y0 + dy * h, log2 - 1,
                               depth + 1)
            return
        self.depth4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = depth
        self._coding_unit(enc, node, x0, y0, log2)

    def _coding_unit(self, enc, node, x0, y0, log2):
        n = 1 << log2
        nxn = bool(node.get("part"))
        if log2 == self.min_cb_log2:
            enc.encode_bin(OFFSETS["part_mode"], 0 if nxn else 1)
        modes = node["modes"]
        if not nxn:
            ca, cb = self._cands(x0, y0)
            _encode_luma_mode(enc, modes[0], ca, cb)
            self.mode4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = modes[0]
        else:
            h = n >> 1
            cands, flags = [], []
            for j, (dy, dx) in enumerate(_ZO):
                a, b = self._cands(x0 + dx * h, y0 + dy * h)
                cands.append((a, b))
                flags.append(modes[j] in _mpm_list_np(a, b))
                # the decoder reads all 4 prev flags before any tail, so
                # candidate modes come from the already-written map only
                self.mode4[(y0 + dy * h) >> 2 : (y0 + (dy + 1) * h) >> 2,
                           (x0 + dx * h) >> 2 : (x0 + (dx + 1) * h) >> 2] = modes[j]
            for f in flags:
                enc.encode_bin(OFFSETS["prev_intra_luma_pred_flag"], 1 if f else 0)
            for j in range(4):
                _encode_luma_mode_tail(enc, modes[j], *cands[j], flags[j])
        enc.encode_bin(OFFSETS["intra_chroma_pred_mode"], 0)  # DM chroma
        # transform tree (7.3.8.8): explicit split_transform_flag when
        # max_td_intra allows it; NxN forces one split (IntraSplitFlag);
        # CU64 force-splits (log2TrafoSize > MaxTbLog2SizeY)
        lev_y, lev_cb, lev_cr = node["lev_y"], node["lev_cb"], node["lev_cr"]
        tsplit = int(node.get("tsplit", 0))
        td = self.cfg.max_transform_hierarchy_depth_intra
        if log2 <= 5 and log2 > 2 and 0 < td and not nxn:
            enc.encode_bin(OFFSETS["split_transform_flag"] + 5 - log2, tsplit)
        cbf_cb = 1 if np.any(lev_cb) else 0
        cbf_cr = 1 if np.any(lev_cr) else 0
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cb)
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cr)
        if tsplit:
            # trafoDepth 1: four quarter luma TUs, each with its own
            # quarter chroma TUs (child log2-1 > 2 here: CU16/CU32 only)
            m = modes[0]
            h = n >> 1
            q = h >> 1
            for dy, dx in _ZO:
                ty = lev_y[dy * h : (dy + 1) * h, dx * h : (dx + 1) * h]
                tcb = lev_cb[dy * q : (dy + 1) * q, dx * q : (dx + 1) * q]
                tcr = lev_cr[dy * q : (dy + 1) * q, dx * q : (dx + 1) * q]
                c_cb = 1 if np.any(tcb) else 0
                c_cr = 1 if np.any(tcr) else 0
                if cbf_cb:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cb)
                if cbf_cr:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cr)
                c_y = 1 if np.any(ty) else 0
                enc.encode_bin(OFFSETS["cbf_luma"], c_y)  # trafoDepth 1
                self._qp_tu(enc, c_y or c_cb or c_cr)
                if c_y:
                    encode_residual(enc, ty, log2 - 1, 0,
                                    residual_scan_idx(m, log2 - 1, 0))
                if c_cb:
                    encode_residual(enc, tcb, log2 - 2, 1,
                                    residual_scan_idx(m, log2 - 2, 1))
                if c_cr:
                    encode_residual(enc, tcr, log2 - 2, 2,
                                    residual_scan_idx(m, log2 - 2, 2))
            return
        if log2 == 6:
            # CU64: log2TrafoSize > MaxTbLog2SizeY forces a TT split to four
            # TU32s; each child re-codes chroma cbf at trafoDepth 1 and its
            # own chroma TU16 residuals (7.3.8.8)
            m = modes[0]
            for dy, dx in _ZO:
                ty = lev_y[dy * 32 : dy * 32 + 32, dx * 32 : dx * 32 + 32]
                tcb = lev_cb[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16]
                tcr = lev_cr[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16]
                c_cb = 1 if np.any(tcb) else 0
                c_cr = 1 if np.any(tcr) else 0
                if cbf_cb:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cb)
                if cbf_cr:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cr)
                c_y = 1 if np.any(ty) else 0
                enc.encode_bin(OFFSETS["cbf_luma"], c_y)  # trafoDepth 1
                self._qp_tu(enc, c_y or c_cb or c_cr)
                if c_y:
                    encode_residual(enc, ty, 5, 0, residual_scan_idx(m, 5, 0))
                if c_cb:
                    encode_residual(enc, tcb, 4, 1, residual_scan_idx(m, 4, 1))
                if c_cr:
                    encode_residual(enc, tcr, 4, 2, residual_scan_idx(m, 4, 2))
            return
        if not nxn:
            cbf_y = 1 if np.any(lev_y) else 0
            enc.encode_bin(OFFSETS["cbf_luma"] + 1, cbf_y)
            self._qp_tu(enc, cbf_y or cbf_cb or cbf_cr)
            if cbf_y:
                encode_residual(enc, lev_y, log2, 0,
                                residual_scan_idx(modes[0], log2, 0))
            if cbf_cb:
                encode_residual(enc, lev_cb, log2 - 1, 1,
                                residual_scan_idx(modes[0], log2 - 1, 1))
            if cbf_cr:
                encode_residual(enc, lev_cr, log2 - 1, 2,
                                residual_scan_idx(modes[0], log2 - 1, 2))
            return
        h = n >> 1
        for j, (dy, dx) in enumerate(_ZO):
            t = lev_y[dy * h : (dy + 1) * h, dx * h : (dx + 1) * h]
            cbf_t = 1 if np.any(t) else 0
            enc.encode_bin(OFFSETS["cbf_luma"], cbf_t)  # trafoDepth 1
            # 4x4 children: chroma rides the last child (7.3.8.10 last4)
            self._qp_tu(enc, cbf_t or (j == 3 and (cbf_cb or cbf_cr)))
            if cbf_t:
                encode_residual(enc, t, log2 - 1, 0,
                                residual_scan_idx(modes[j], log2 - 1, 0))
        dm = modes[0]
        if cbf_cb:
            encode_residual(enc, lev_cb, log2 - 1, 1,
                            residual_scan_idx(dm, log2 - 1, 1))
        if cbf_cr:
            encode_residual(enc, lev_cr, log2 - 1, 2,
                            residual_scan_idx(dm, log2 - 1, 2))


class _QuadWriterP(_QuadWriter):
    """P-slice quadtree writer: inter leaves (2Nx2N merge/AMVP/skip, TU ==
    CU) alongside the intra leaf syntax — mirrors
    decoder/generic_inter.py's _coding_unit/_inter_tt parse exactly."""

    def __init__(self, cfg, slice_qp, merge_k=1, qs=None):
        super().__init__(cfg, slice_qp, qs)
        self.skip4 = np.zeros((self.h // 4, self.w // 4), np.int32)
        self.merge_k = merge_k

    def _coding_unit(self, enc, node, x0, y0, log2):
        from .slice_data import _encode_merge_idx, _encode_mvd

        ctx = 0
        if x0 > 0 and self.skip4[y0 >> 2, (x0 - 1) >> 2]:
            ctx += 1
        if y0 > 0 and self.skip4[(y0 - 1) >> 2, x0 >> 2]:
            ctx += 1
        ct = int(node.get("ctype", 0))
        n = 1 << log2
        is_skip = ct == 3
        enc.encode_bin(OFFSETS["cu_skip_flag"] + ctx, 1 if is_skip else 0)
        s = slice(y0 >> 2, (y0 + n) >> 2), slice(x0 >> 2, (x0 + n) >> 2)
        self.skip4[s] = 1 if is_skip else 0
        if is_skip:
            _encode_merge_idx(enc, int(node["merge_idx"]), self.merge_k)
            return
        enc.encode_bin(OFFSETS["pred_mode_flag"], 1 if ct == 0 else 0)
        if ct == 0:
            super()._coding_unit(enc, node, x0, y0, log2)
            return
        # inter CU, PART_2Nx2N
        enc.encode_bin(OFFSETS["part_mode"], 1)
        enc.encode_bin(OFFSETS["merge_flag"], 1 if ct == 1 else 0)
        if ct == 1:
            _encode_merge_idx(enc, int(node["merge_idx"]), self.merge_k)
        else:
            self._amvp_pu(enc, node, log2)
        self._inter_residual(enc, node, log2, ct)

    def _amvp_pu(self, enc, node, log2):
        from .slice_data import _encode_mvd

        # single reference: ref_idx_l0 absent
        _encode_mvd(enc, int(node["mvd"][0]), int(node["mvd"][1]))
        enc.encode_bin(OFFSETS["mvp_flag"], int(node["mvp_flag"]))

    def _inter_residual(self, enc, node, log2, ct):
        lev_y, lev_cb, lev_cr = node["lev_y"], node["lev_cb"], node["lev_cr"]
        cbf_y = 1 if np.any(lev_y) else 0
        cbf_cb = 1 if np.any(lev_cb) else 0
        cbf_cr = 1 if np.any(lev_cr) else 0
        root = cbf_y or cbf_cb or cbf_cr
        if ct == 2:
            enc.encode_bin(OFFSETS["rqt_root_cbf"], 1 if root else 0)
            if not root:
                return
        else:
            assert root, "zero-residual merge must be coded as skip"
        if log2 == 6:
            # inter CU64: log2TrafoSize > MaxTbLog2SizeY forces a TT split
            # to four TU32s (7.3.8.8); parent chroma cbfs at depth 0, then
            # per-child cbfs at depth 1 (mirrors generic_inter._inter_tt)
            enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cb)
            enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cr)
            for dy, dx in _ZO:
                ty = lev_y[dy * 32 : dy * 32 + 32, dx * 32 : dx * 32 + 32]
                tcb = lev_cb[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16]
                tcr = lev_cr[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16]
                c_cb = 1 if np.any(tcb) else 0
                c_cr = 1 if np.any(tcr) else 0
                if cbf_cb:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cb)
                if cbf_cr:
                    enc.encode_bin(OFFSETS["cbf_chroma"] + 1, c_cr)
                c_y = 1 if np.any(ty) else 0
                enc.encode_bin(OFFSETS["cbf_luma"], c_y)  # trafoDepth 1
                self._qp_tu(enc, c_y or c_cb or c_cr)
                if c_y:
                    encode_residual(enc, ty, 5, 0)
                if c_cb:
                    encode_residual(enc, tcb, 4, 1)
                if c_cr:
                    encode_residual(enc, tcr, 4, 2)
            return
        # transform tree at depth 0, TU == CU (max_td_inter 0, 2Nx2N)
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cb)
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cr)
        if cbf_cb or cbf_cr:
            enc.encode_bin(OFFSETS["cbf_luma"] + 1, cbf_y)
        # else: cbf_luma inferred 1 (rqt_root_cbf / merge residual present)
        self._qp_tu(enc, cbf_y or cbf_cb or cbf_cr)
        if cbf_y:
            encode_residual(enc, lev_y, log2, 0)
        if cbf_cb:
            encode_residual(enc, lev_cb, log2 - 1, 1)
        if cbf_cr:
            encode_residual(enc, lev_cr, log2 - 1, 2)


def encode_slice_data_p_quad(cfg, trees, slice_qp=None, sao=None,
                             merge_k: int = 1, qp_map=None) -> bytes:
    """P-slice data for the quad-P tree representation (single slice):
    CTBs in raster order, init_type 1.  qp_map: per-CTU QP grid
    (cu_qp_delta, QG == CTB)."""
    from .slice_data import QpState

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 1, False, sq, sao, qp_map, merge_k)
    if out is not None:
        return out[0]
    enc = CabacEncoder(init_type=1, slice_qp=sq)
    cw = cfg.ctbs_w
    nctu = cw * cfg.ctbs_h
    qs = QpState(sq, qp_map, nctu) if qp_map is not None else None
    wr = _QuadWriterP(cfg, sq, merge_k, qs)
    n = cfg.ctb_size
    for i, node in enumerate(trees):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, node, (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()
        enc.encode_terminate(1 if i == nctu - 1 else 0)
    return enc.data()


def encode_slice_data_quad_tiles(cfg, trees, slice_type: int, n_cols: int,
                                 slice_qp=None, sao=None, merge_k: int = 1):
    """Tile-column quad slice data (CTB32/64 quadtrees): one independent
    CABAC substream per tile, CTUs in tile-raster order, end_of_subset
    termination (7.3.8.1).  Each tile gets a FRESH writer with
    tile-LOCAL coordinates — the writer's x0==0 availability rule then
    IS the tile-boundary rule (split/skip contexts, MPM cand_a and the
    P cell maps all stop at the tile edge, matching the per-strip device
    encode).  SAO keeps picture-raster indexing with SaoState.tile_of
    gating merge flags.  Returns (payload, entry_point_offsets)."""
    import dataclasses

    from .slice_data import tile_grid

    sq = cfg.qp if slice_qp is None else slice_qp
    cw, chh = cfg.ctbs_w, cfg.ctbs_h
    n = cfg.ctb_size
    cols = tile_grid(cfg, n_cols)
    payloads = []
    last_tile = n_cols - 1
    for t, (x0, x1) in enumerate(cols):
        cfg_t = dataclasses.replace(cfg, width=(x1 - x0) * n, tile_cols=1,
                                    display_width=0, display_height=0)
        wr = (_QuadWriter(cfg_t, sq) if slice_type == 2
              else _QuadWriterP(cfg_t, sq, merge_k))
        enc = CabacEncoder(init_type=0 if slice_type == 2 else 1,
                           slice_qp=sq)
        for r in range(chh):
            for c in range(x0, x1):
                i = r * cw + c
                if sao is not None:
                    sao.encode(enc, i)
                wr.ctu(enc, trees[i], (c - x0) * n, r * n)
                last_in_slice = (t == last_tile and r == chh - 1
                                 and c == x1 - 1)
                enc.encode_terminate(1 if last_in_slice else 0)
                if not last_in_slice and r == chh - 1 and c == x1 - 1:
                    enc.encode_terminate(1)  # end_of_subset_one_bit
        payloads.append(enc.data())
    return b"".join(payloads), [len(p) for p in payloads[:-1]]


def encode_slice_data_p_quad_wpp(cfg, trees, slice_qp=None, sao=None,
                                 merge_k: int = 1, qp_map=None):
    """WPP variant of the P-quad writer (entropy_coding_sync): per-row
    substreams with CABAC context inheritance; skip/depth/mode maps are
    picture state and persist across rows.  Returns
    (payload, entry_point_offsets)."""
    from .slice_data import QpState, encode_slice_data_wpp

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 1, True, sq, sao, qp_map, merge_k)
    if out is not None:
        return out
    cw = cfg.ctbs_w
    qs = QpState(sq, qp_map, cw * cfg.ctbs_h) if qp_map is not None else None
    wr = _QuadWriterP(cfg, sq, merge_k, qs)
    n = cfg.ctb_size

    def fn(enc, i):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, trees[i], (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()

    fn.init_type = 1
    return encode_slice_data_wpp(cfg, fn, qs, slice_qp=sq)


class _QuadWriterB(_QuadWriterP):
    """B-slice quadtree writer: dual-list inter leaves (2Nx2N
    merge/AMVP/skip with inter_pred_idc, per-list mvd + mvp_flag) —
    mirrors decoder/generic_b.py's _coding_unit/_b_amvp_pu parse exactly
    (one reference per list, so both ref_idx fields are absent;
    mvd_l1_zero_flag is 0)."""

    def _amvp_pu(self, enc, node, log2):
        from .slice_data import _encode_mvd

        dr = int(node["inter_dir"])  # 1 = L0, 2 = L1, 3 = BI
        # inter_pred_idc (9.3.3.10): 2Nx2N PUs use the CtDepth ctx for the
        # bi/uni bin, then ctx 4 for the list bin
        ctd = self.ctb_log2 - log2
        enc.encode_bin(OFFSETS["inter_pred_idc"] + ctd, 1 if dr == 3 else 0)
        if dr != 3:
            enc.encode_bin(OFFSETS["inter_pred_idc"] + 4, 1 if dr == 2 else 0)
        for l in range(2):
            if dr & (1 << l):
                _encode_mvd(enc, int(node["mvd"][l][0]),
                            int(node["mvd"][l][1]))
                enc.encode_bin(OFFSETS["mvp_flag"], int(node["mvp_flag"][l]))


def encode_slice_data_b_quad(cfg, trees, slice_qp=None, sao=None,
                             merge_k: int = 1, qp_map=None) -> bytes:
    """B-slice data for the quad-B tree representation (single slice,
    init_type 2 — cabac_init_flag 0)."""
    from .slice_data import QpState

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 0, False, sq, sao, qp_map, merge_k)
    if out is not None:
        return out[0]
    enc = CabacEncoder(init_type=2, slice_qp=sq)
    cw = cfg.ctbs_w
    nctu = cw * cfg.ctbs_h
    qs = QpState(sq, qp_map, nctu) if qp_map is not None else None
    wr = _QuadWriterB(cfg, sq, merge_k, qs)
    n = cfg.ctb_size
    for i, node in enumerate(trees):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, node, (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()
        enc.encode_terminate(1 if i == nctu - 1 else 0)
    return enc.data()


def encode_slice_data_b_quad_wpp(cfg, trees, slice_qp=None, sao=None,
                                 merge_k: int = 1, qp_map=None):
    """WPP variant of the B-quad writer.  Returns (payload,
    entry_point_offsets)."""
    from .slice_data import QpState, encode_slice_data_wpp

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 0, True, sq, sao, qp_map, merge_k)
    if out is not None:
        return out
    cw = cfg.ctbs_w
    qs = QpState(sq, qp_map, cw * cfg.ctbs_h) if qp_map is not None else None
    wr = _QuadWriterB(cfg, sq, merge_k, qs)
    n = cfg.ctb_size

    def fn(enc, i):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, trees[i], (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()

    fn.init_type = 2
    return encode_slice_data_wpp(cfg, fn, qs, slice_qp=sq)


def encode_slice_data_intra_quad(cfg, trees, slice_qp=None, sao=None,
                                 qp_map=None) -> bytes:
    """I-slice data for the cu32.py tree representation (single slice,
    no WPP/tiles); CTBs in raster order with end_of_slice flags.  When
    `sao` (a SaoState) is given its per-CTB parameters precede each CTU's
    syntax (7.3.8.2).  qp_map: per-CTU QP grid (cu_qp_delta, QG == CTB)."""
    from .slice_data import QpState

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 2, False, sq, sao, qp_map, 1)
    if out is not None:
        return out[0]
    enc = CabacEncoder(init_type=0, slice_qp=sq)
    cw = cfg.ctbs_w
    nctu = cw * cfg.ctbs_h
    qs = QpState(sq, qp_map, nctu) if qp_map is not None else None
    wr = _QuadWriter(cfg, sq, qs)
    n = cfg.ctb_size
    for i, node in enumerate(trees):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, node, (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()
        enc.encode_terminate(1 if i == nctu - 1 else 0)
    return enc.data()


def encode_slice_data_intra_quad_wpp(cfg, trees, slice_qp=None, sao=None,
                                     qp_map=None):
    """WPP variant (entropy_coding_sync): per-row substreams with CABAC
    context inheritance; the frame-level depth/mode maps persist across
    rows (they are picture state, not entropy state).  Returns
    (payload, entry_point_offsets)."""
    from .slice_data import QpState, encode_slice_data_wpp

    sq = cfg.qp if slice_qp is None else slice_qp
    out = _try_native_quad(cfg, trees, 2, True, sq, sao, qp_map, 1)
    if out is not None:
        return out
    cw = cfg.ctbs_w
    qs = QpState(sq, qp_map, cw * cfg.ctbs_h) if qp_map is not None else None
    wr = _QuadWriter(cfg, sq, qs)
    n = cfg.ctb_size

    def fn(enc, i):
        if sao is not None:
            sao.encode(enc, i)
        if qs is not None:
            qs.begin_ctu(i)
        wr.ctu(enc, trees[i], (i % cw) * n, (i // cw) * n)
        if qs is not None:
            qs.end_ctu()

    fn.init_type = 0
    return encode_slice_data_wpp(cfg, fn, qs, slice_qp=sq)


# ------------------------------------------------ native writer frontend

def _serialize_trees(cfg, trees, slice_type: int):
    """Flatten the tree dicts into the native writer's token/levels streams
    (see slice_cabac.c encode_slice_quad_c's grammar).

    Levels are preallocated and filled in place: leaves partition each
    CTB's area, so every CTB contributes exactly n^2 + 2*(n/2)^2 =
    1.5*S^2 coefficients regardless of its split shape."""
    toks: list[int] = []
    min_cb = cfg.min_cb_log2
    S = cfg.ctb_size
    levels = np.empty(len(trees) * (3 * S * S) // 2, np.int32)
    pos = [0]

    def put(a):
        n = a.size
        levels[pos[0] : pos[0] + n] = a.reshape(-1)
        pos[0] += n

    def walk(node, log2):
        split = "split" in node
        if log2 > min_cb:
            toks.append(1 if split else 0)
        if split:
            for sub in node["split"]:
                walk(sub, log2 - 1)
            return
        if slice_type != 2:
            ct = int(node.get("ctype", 0))
            toks.append(ct)
            if ct in (1, 3):
                toks.append(int(node["merge_idx"]))
            elif ct == 2 and slice_type == 0:
                # B AMVP: [inter_dir] + (mvd_x mvd_y mvp) per active list
                dr = int(node["inter_dir"])
                toks.append(dr)
                for l in range(2):
                    if dr & (1 << l):
                        toks.extend((int(node["mvd"][l][0]),
                                     int(node["mvd"][l][1]),
                                     int(node["mvp_flag"][l])))
            elif ct == 2:
                toks.extend((int(node["mvd"][0]), int(node["mvd"][1]),
                             int(node["mvp_flag"])))
            if ct:
                put(node["lev_y"])
                put(node["lev_cb"])
                put(node["lev_cr"])
                return
        nxn = 1 if node.get("part") else 0
        toks.append(nxn)
        modes = node["modes"]
        if nxn:
            toks.extend(int(m) for m in modes[:4])
        else:
            toks.append(int(modes[0]))
        toks.append(int(node.get("tsplit", 0)))
        put(node["lev_y"])
        put(node["lev_cb"])
        put(node["lev_cr"])

    for tree in trees:
        walk(tree, cfg.ctb_log2)
    return np.asarray(toks, np.int32), levels


def _try_native_quad(cfg, trees, slice_type, wpp, slice_qp, sao, qp_map,
                     merge_k):
    from ..native import encode_slice_quad_native

    sq = cfg.qp if slice_qp is None else slice_qp
    qpm = None
    if qp_map is not None:
        qpm = np.clip(np.asarray(qp_map, np.int32).reshape(-1), 0, 51)
    tokens, levels = _serialize_trees(cfg, trees, slice_type)
    return encode_slice_quad_native(cfg, slice_type, wpp, tokens, levels, sq,
                                    sao=sao, qp_map=qpm, merge_k=merge_k)
