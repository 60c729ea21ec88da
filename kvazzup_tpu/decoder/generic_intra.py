"""Generic recursive intra decoder: any CTB size, full CU/TU quadtrees.

The alien-stream workhorse (openHEVC-replacement scope, SURVEY §2.6):
decodes intra pictures from independent encoders at their DEFAULT
operating points — x265's ctu=64 with deep CU quadtrees, residual
quadtrees (split_transform_flag), PART_NxN, explicit chroma modes,
strong intra smoothing, SDH, SAO — bit-exactly.

This is the sequential reference engine (numpy canvases + per-block JAX
prediction); the wavefront device engines (frame_intra*.py) cover the
high-throughput CTB-16 operating point.  Spec references:
coding_quadtree 7.3.8.4, coding_unit 7.3.8.5, transform_tree 7.3.8.8,
transform_unit 7.3.8.10, intra sample prediction 8.4.4, z-scan 6.4.1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy.cabac import CabacDecoder
from ..entropy.cabac_tables import OFFSETS
from ..entropy.slice_data import (
    _decode_chroma_mode,
    _decode_luma_mode_tail,
    _decode_qp_delta,
    _mpm_list_np,
)
from ..entropy.syntax import decode_residual
from ..core.tables import residual_scan_idx
from ..ops import intra as intra_ops
from ..ops.quant import dequantize
from ..ops.transforms import inv_transform


# fused jitted steps — one dispatch per TU instead of dozens of eager jnp
# ops (the recursive engines are host-driven; dispatch overhead dominated)

@functools.partial(jax.jit, static_argnames=("bd",))
def _jit_subst(a_raw, av, bd=8):
    return intra_ops.substitute_refs(a_raw, av, bd=bd)


@functools.partial(jax.jit, static_argnames=("log2", "is_luma", "strong", "bd"))
def _jit_predict(a_raw, av, mode, log2, is_luma, strong, bd=8):
    a = intra_ops.substitute_refs(a_raw, av, bd=bd)
    return intra_ops.predict_mode(a, log2, is_luma, mode, strong, bd=bd)


@functools.partial(jax.jit, static_argnames=("log2", "dst", "bd"))
def _jit_resid(lev, qp, log2, dst=False, bd=8):
    return inv_transform(dequantize(lev, qp, log2, bd=bd), log2, dst=dst, bd=bd)


@functools.partial(jax.jit, static_argnames=("log2", "bd"))
def _jit_dequant(lev, qp, log2, bd=8):
    return dequantize(lev, qp, log2, bd=bd)


@functools.partial(jax.jit, static_argnames=("log2", "bd"))
def _jit_dequant_m(lev, qp, m, log2, bd=8):
    from ..ops.quant import dequantize_scaled

    return dequantize_scaled(lev, qp, log2, m, bd=bd)


@functools.partial(jax.jit, static_argnames=("log2", "dst", "bd"))
def _jit_resid_m(lev, qp, m, log2, dst=False, bd=8):
    from ..ops.quant import dequantize_scaled

    return inv_transform(dequantize_scaled(lev, qp, log2, m, bd=bd), log2,
                         dst=dst, bd=bd)


def _morton(r: int, c: int, bits: int) -> int:
    z = 0
    for b in range(bits - 1, -1, -1):
        z = (z << 2) | (((r >> b) & 1) << 1) | ((c >> b) & 1)
    return z


class GenericIntraDecoder:
    """Stateful per-picture decoder over numpy canvases."""

    def __init__(self, sps, pps, slice_qp: int, sh=None):
        self.sps, self.pps = sps, pps
        self.bd = getattr(sps, "bit_depth", 8)
        self.maxv = (1 << self.bd) - 1
        self.qp_bd_off = 6 * (self.bd - 8)  # QpBdOffset (8-bit QP domain)
        self.slice_of_ctu = None  # per-CTU slice index (multi-slice pictures)
        self.cur_slice = 0
        # chroma QP offsets: pps_cb/cr_qp_offset + slice_cb/cr_qp_offset (8.6.1)
        self.cb_off = pps.cb_qp_offset + (getattr(sh, "cb_qp_offset", 0) if sh else 0)
        self.cr_off = pps.cr_qp_offset + (getattr(sh, "cr_qp_offset", 0) if sh else 0)
        self._set_qp(slice_qp)
        # scaling lists (7.4.5): PPS data overrides SPS; default when
        # enabled-but-absent
        self.scaling = None
        if getattr(sps, "scaling_list_enabled", False):
            self.scaling = getattr(pps, "scaling_lists", None) or sps.scaling_lists
        self.ctb_log2 = sps.ctb_log2
        self.min_cb_log2 = sps.min_cb_log2
        self.min_tb_log2 = getattr(sps, "min_tb_log2", 2)
        self.max_tb_log2 = getattr(sps, "max_tb_log2", 5)
        self.max_td_intra = getattr(sps, "max_td_intra", 0)
        self.strong_smoothing = bool(getattr(sps, "strong_intra_smoothing", False))
        self.sdh = bool(pps.sign_data_hiding)
        self.tskip = bool(getattr(pps, "transform_skip", False))
        self.pcm_range = None
        if getattr(sps, "pcm_enabled", False):
            self.pcm_range = (sps.pcm_min_log2, sps.pcm_max_log2)
            self.pcm_depth = sps.pcm_bit_depth
            self.pcm_depth_c = sps.pcm_bit_depth_chroma
        self.cu_qp_delta = bool(getattr(pps, "cu_qp_delta_enabled", False))
        self.qg_log2 = self.ctb_log2 - int(getattr(pps, "diff_cu_qp_delta_depth", 0))
        self.w, self.h = sps.width, sps.height
        n = 1 << self.ctb_log2
        self.cw = -(-self.w // n)
        self.ch = -(-self.h // n)
        # canvases are allocated uninitialized (~12 MB of memset saved
        # per 1080p picture): the native recon writes every sample, and
        # native_recon._reset zeroes them before any Python-tier fallback
        # (the Python CTU loop also writes every sample, but starts from
        # the zeroed constructor state for determinism)
        self.y = np.empty((self.h, self.w), np.int32)
        self.u = np.empty((self.h // 2, self.w // 2), np.int32)
        self.v = np.empty((self.h // 2, self.w // 2), np.int32)
        # 4x4-cell maps over the picture: luma mode (MPM), CU depth (split
        # ctx), coded flag (z-scan availability is tracked positionally)
        self.mode4 = np.full((self.h // 4, self.w // 4), 1, np.int32)
        self.depth4 = np.zeros((self.h // 4, self.w // 4), np.int32)
        # per-8-pel-edge boundary masks (CU/TU edges) for deblocking
        self.edge_v = np.zeros((self.h // 8, self.w // 8), bool)  # left edges
        self.edge_h = np.zeros((self.h // 8, self.w // 8), bool)  # top edges
        self._cells_bits = self.ctb_log2 - 2  # morton bits at 4x4 cells
        # adaptive QP (8.6.1): per-4x4-cell QpY map + decoding-order chain
        self.qp4 = np.full((self.h // 4, self.w // 4), slice_qp, np.int32)
        self.qp_prev = slice_qp  # qPY_PREV: last decoded CU's QpY
        self.slice_qp = slice_qp
        self._qg_key = None
        self._qg_pred = slice_qp
        self._delta_pending = False

    # --------------------------------------------------------- availability
    def _zaddr(self, x: int, y: int, chroma: bool) -> int:
        """z-scan order of the 4x4 cell holding pixel (x, y) of a plane."""
        if chroma:
            x, y = 2 * x, 2 * y  # co-located luma position
        cl = self.ctb_log2
        ctb = (y >> cl) * self.cw + (x >> cl)
        r4 = (y & ((1 << cl) - 1)) >> 2
        c4 = (x & ((1 << cl) - 1)) >> 2
        return (ctb << (2 * self._cells_bits)) + _morton(r4, c4, self._cells_bits)

    def _boundary(self, canvas, x0, y0, n, chroma: bool):
        h, w = canvas.shape
        cur = self._zaddr(x0, y0, chroma)

        def ok(x, y):
            return (0 <= x < w and 0 <= y < h and self._zaddr(x, y, chroma) < cur
                    and self._same_slice(x, y, chroma))

        a = np.zeros(4 * n + 1, np.int32)
        av = np.zeros(4 * n + 1, bool)
        for j in range(2 * n):  # below-left + left, bottom-up
            x, y = x0 - 1, y0 + 2 * n - 1 - j
            if ok(x, y):
                a[j], av[j] = canvas[y, x], True
        if ok(x0 - 1, y0 - 1):
            a[2 * n], av[2 * n] = canvas[y0 - 1, x0 - 1], True
        for j in range(2 * n):  # top + top-right
            x, y = x0 + j, y0 - 1
            if ok(x, y):
                a[2 * n + 1 + j], av[2 * n + 1 + j] = canvas[y, x], True
        return a, av

    def _same_slice(self, x, y, chroma=False):
        """Neighbor availability across slice segments (6.4.1: samples in
        a different slice are unavailable for prediction)."""
        if self.slice_of_ctu is None:
            return True
        if chroma:
            x <<= 1
            y <<= 1
        i = (y >> self.ctb_log2) * self.cw + (x >> self.ctb_log2)
        return self.slice_of_ctu[i] == self.cur_slice

    def _predict(self, canvas, x0, y0, log2, is_luma, mode, chroma: bool):
        n = 1 << log2
        a_raw, av = self._boundary(canvas, x0, y0, n, chroma)
        strong = False
        if is_luma and self.strong_smoothing and log2 == 5:
            a = np.asarray(_jit_subst(jnp.asarray(a_raw), jnp.asarray(av), bd=self.bd))
            thr = 1 << (self.bd - 5)
            strong = (
                abs(int(a[2 * n]) + int(a[4 * n]) - 2 * int(a[3 * n])) < thr
                and abs(int(a[2 * n]) + int(a[0]) - 2 * int(a[n])) < thr
            )
        return np.asarray(_jit_predict(jnp.asarray(a_raw), jnp.asarray(av),
                                       mode, log2, is_luma, strong, bd=self.bd))

    # ------------------------------------------------------------- QP (8.6.1)
    def _enter_qg(self, x0, y0) -> None:
        from ..core.tables import CHROMA_QP_TABLE

        key = (y0 >> self.qg_log2, x0 >> self.qg_log2)
        if key == self._qg_key:
            return
        self._qg_key = key
        xqg = (x0 >> self.qg_log2) << self.qg_log2
        yqg = (y0 >> self.qg_log2) << self.qg_log2
        cl = 1 << self.ctb_log2
        same_ctb_l = xqg > 0 and (xqg - 1) // cl == xqg // cl and yqg // cl == yqg // cl
        qp_a = int(self.qp4[yqg >> 2, (xqg - 1) >> 2]) if xqg % cl != 0 else self.qp_prev
        qp_b = int(self.qp4[(yqg - 1) >> 2, xqg >> 2]) if yqg % cl != 0 else self.qp_prev
        self._qg_pred = (qp_a + qp_b + 1) >> 1
        self._delta_pending = True
        self._set_qp(self._qg_pred)

    def _chroma_qp(self, qpi: int) -> int:
        """qPi -> Qp'C (8.6.1: table map for 30..43, identity below,
        -6 above; + QpBdOffsetC)."""
        from ..core.tables import CHROMA_QP_TABLE

        qpi = max(-self.qp_bd_off, min(57, qpi))
        qpc = qpi if qpi < 0 else int(CHROMA_QP_TABLE[qpi])
        return qpc + self.qp_bd_off

    def _set_qp(self, qp: int) -> None:
        self.qp = qp
        self.qp_y = qp + self.qp_bd_off  # Qp'Y for dequant
        self.qp_cb = self._chroma_qp(qp + self.cb_off)
        self.qp_cr = self._chroma_qp(qp + self.cr_off)
        self.qp_c = self.qp_cb  # legacy alias (zero-offset streams)

    def _maybe_qp_delta(self, dec) -> None:
        if self.cu_qp_delta and self._delta_pending:
            self._delta_pending = False
            delta = _decode_qp_delta(dec)
            self._set_qp((self._qg_pred + delta + 52) % 52)

    # ------------------------------------------------------------ MPM cands
    def _cands(self, x0: int, y0: int):
        cl = 1 << self.ctb_log2
        if x0 == 0 or not self._same_slice(x0 - 1, y0):
            a = 1
        else:
            a = int(self.mode4[y0 >> 2, (x0 - 1) >> 2])
        if y0 == 0 or ((y0 - 1) // cl) != (y0 // cl):
            b = 1  # above row is in another CTB -> DC (8.4.2)
        else:
            b = int(self.mode4[(y0 - 1) >> 2, x0 >> 2])
        return a, b

    def _decode_luma_mode(self, dec, x0, y0):
        a, b = self._cands(x0, y0)
        prev = dec.decode_bin(OFFSETS["prev_intra_luma_pred_flag"])
        return _decode_luma_mode_tail(dec, a, b, prev)

    # --------------------------------------------------------------- edges
    def _mark_edges(self, x0, y0, n):
        """Record CU/TU boundary edges on the 8-pel grid for deblocking.

        4x4 TUs also mark (a TU line on the 8-grid is a boundary along the
        whole 8-segment: any larger TU crossing it would contain both
        sides, contradicting the 4x4 split)."""
        e8 = 8
        if x0 % e8 == 0 and x0 // e8 < self.edge_v.shape[1]:
            self.edge_v[y0 // e8 : -(-(y0 + n) // e8), x0 // e8] = True
        if y0 % e8 == 0 and y0 // e8 < self.edge_h.shape[0]:
            self.edge_h[y0 // e8, x0 // e8 : -(-(x0 + n) // e8)] = True

    # ------------------------------------------------------------ quadtree
    def decode_ctu(self, dec, i: int) -> None:
        n = 1 << self.ctb_log2
        x0 = (i % self.cw) * n
        y0 = (i // self.cw) * n
        if i % self.cw == 0 and getattr(self.pps, "entropy_sync", False):
            # 8.6.1: qPY_PREV = SliceQpY at the start of each CTU row when
            # entropy_coding_sync is enabled
            self.qp_prev = self.slice_qp
        self._coding_quadtree(dec, x0, y0, self.ctb_log2, 0)

    def _split_ctx(self, x0, y0, depth) -> int:
        ctx = 0
        if x0 > 0 and self._same_slice(x0 - 1, y0) \
                and int(self.depth4[y0 >> 2, (x0 - 1) >> 2]) > depth:
            ctx += 1
        if y0 > 0 and self._same_slice(x0, y0 - 1) \
                and int(self.depth4[(y0 - 1) >> 2, x0 >> 2]) > depth:
            ctx += 1
        return ctx

    def _coding_quadtree(self, dec, x0, y0, log2, depth) -> None:
        n = 1 << log2
        inside = x0 + n <= self.w and y0 + n <= self.h
        if log2 > self.min_cb_log2 and inside:
            split = dec.decode_bin(OFFSETS["split_cu_flag"] + self._split_ctx(x0, y0, depth))
        else:
            split = log2 > self.min_cb_log2  # forced split at picture edge
        if split:
            h = n >> 1
            for dy, dx in ((0, 0), (0, h), (h, 0), (h, h)):
                if x0 + dx < self.w and y0 + dy < self.h:
                    self._coding_quadtree(dec, x0 + dx, y0 + dy, log2 - 1, depth + 1)
            return
        self.depth4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = depth
        if self.cu_qp_delta:
            self._enter_qg(x0, y0)
        self._coding_unit(dec, x0, y0, log2)
        if self.cu_qp_delta:  # the CU's final QpY feeds the chain + maps
            self.qp_prev = self.qp
            self.qp4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = self.qp

    def _coding_unit(self, dec, x0, y0, log2) -> None:
        n = 1 << log2
        nxn = False
        if log2 == self.min_cb_log2:
            nxn = dec.decode_bin(OFFSETS["part_mode"]) == 0
        self._mark_edges(x0, y0, n)
        if (self.pcm_range is not None and not nxn
                and self.pcm_range[0] <= log2 <= self.pcm_range[1]):
            if dec.decode_terminate():  # pcm_flag (9.3.3.6)
                self._pcm_unit(dec, x0, y0, log2)
                return
        if not nxn:
            mode = self._decode_luma_mode(dec, x0, y0)
            self.mode4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = mode
            modes = [mode]
        else:
            h = n >> 1
            flags = [dec.decode_bin(OFFSETS["prev_intra_luma_pred_flag"]) for _ in range(4)]
            modes = []
            for j, (dy, dx) in enumerate(((0, 0), (0, h), (h, 0), (h, h))):
                a, b = self._cands(x0 + dx, y0 + dy)
                m = _decode_luma_mode_tail(dec, a, b, flags[j])
                modes.append(m)
                self.mode4[(y0 + dy) >> 2 : (y0 + dy + h) >> 2,
                           (x0 + dx) >> 2 : (x0 + dx + h) >> 2] = m
        cmode = _decode_chroma_mode(dec, modes[0])
        # transform tree (root at the CU; IntraSplitFlag = nxn)
        self._transform_tree(dec, x0, y0, log2, 0, nxn, modes, cmode,
                             cbf_cb_parent=True, cbf_cr_parent=True)

    # ------------------------------------------------------ transform tree
    def _transform_tree(self, dec, x0, y0, log2, depth, intra_split, modes,
                        cmode, cbf_cb_parent, cbf_cr_parent) -> None:
        # 7.3.8.8: explicit split_transform_flag vs inferred splits
        max_depth = self.max_td_intra + (1 if intra_split else 0)
        if log2 <= self.max_tb_log2 and log2 > self.min_tb_log2 \
                and depth < max_depth and not (intra_split and depth == 0):
            split = bool(dec.decode_bin(OFFSETS["split_transform_flag"] + 5 - log2))
        else:
            split = (log2 > self.max_tb_log2) or (intra_split and depth == 0)
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
                self._transform_tree(dec, x0 + dx, y0 + dy, log2 - 1, depth + 1,
                                     intra_split, modes, cmode, cbf_cb, cbf_cr)
                if log2 - 1 == 2 and j == 3:
                    # chroma of the four 4x4 luma TUs coded at the parent size
                    self._chroma_unit(dec, x0, y0, log2 - 1, cmode, cbf_cb, cbf_cr)
            return
        # leaf: cbf_luma, luma TU (+chroma at this node when size > 4x4)
        cbf_luma = bool(dec.decode_bin(OFFSETS["cbf_luma"] + (1 if depth == 0 else 0)))
        mode = modes[0]
        if intra_split and len(modes) == 4:
            j = ((y0 >> log2) & 1) * 2 + ((x0 >> log2) & 1)
            mode = modes[j]
        chroma_here = log2 > 2 and (cbf_cb or cbf_cr)
        last4 = log2 == 2 and ((y0 >> 2) & 1) and ((x0 >> 2) & 1)
        if cbf_luma or chroma_here or (last4 and (cbf_cb or cbf_cr)):
            self._maybe_qp_delta(dec)
        self._luma_unit(dec, x0, y0, log2, mode, cbf_luma)
        if log2 > 2:
            self._chroma_unit(dec, x0, y0, log2 - 1, cmode, cbf_cb, cbf_cr)

    def _resid(self, lev, qpv, log2: int, cidx: int, intra: bool, dst=False):
        """Dequant + inverse transform, honoring scaling lists when enabled.

        qpv is in the Qp' domain (incl. QpBdOffset)."""
        if self.scaling is None:
            return np.asarray(_jit_resid(jnp.asarray(lev), qpv, log2, dst=dst,
                                         bd=self.bd))
        m = jnp.asarray(self.scaling.factor(log2, cidx, intra))
        return np.asarray(_jit_resid_m(jnp.asarray(lev), qpv, m, log2, dst=dst,
                                       bd=self.bd))

    def _resid_ts(self, lev, qpv, log2: int, cidx: int, intra: bool):
        """Transform-skip residual (8.6.4.2): dequant, then bypass the
        inverse transform — r = d << tsShift (5 + log2 = 7 at 4x4), final
        shift bdShift = 20 - BitDepth."""
        from ..ops.quant import dequantize

        if self.scaling is None:
            d = np.asarray(_jit_dequant(jnp.asarray(lev), qpv, log2, bd=self.bd))
        else:
            m = jnp.asarray(self.scaling.factor(log2, cidx, intra))
            d = np.asarray(_jit_dequant_m(jnp.asarray(lev), qpv, m, log2,
                                          bd=self.bd))
        bd_shift = 20 - self.bd
        r = d.astype(np.int64) << 7
        return np.clip((r + (1 << (bd_shift - 1))) >> bd_shift,
                       -32768, 32767).astype(np.int32)

    def _pcm_unit(self, dec, x0, y0, log2) -> None:
        """pcm_sample (7.3.8.7): raw samples, engine re-init (9.3.1)."""
        n = 1 << log2
        nc = n >> 1
        luma, chroma = dec.read_pcm_samples(
            [(n * n, self.pcm_depth), (2 * nc * nc, self.pcm_depth_c)])
        sy = np.asarray(luma, np.int32).reshape(n, n) << (self.bd - self.pcm_depth)
        sc = np.asarray(chroma, np.int32).reshape(2, nc, nc) << (self.bd - self.pcm_depth_c)
        self.y[y0 : y0 + n, x0 : x0 + n] = sy
        xc, yc = x0 >> 1, y0 >> 1
        self.u[yc : yc + nc, xc : xc + nc] = sc[0]
        self.v[yc : yc + nc, xc : xc + nc] = sc[1]
        # PCM CUs are intra; IntraPredModeY is inferred DC for neighbors
        self.mode4[y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = 1

    def _luma_unit(self, dec, x0, y0, log2, mode, cbf) -> None:
        self._mark_edges(x0, y0, 1 << log2)
        pred = self._predict(self.y, x0, y0, log2, True, mode, False)
        n = 1 << log2
        if cbf:
            scan = residual_scan_idx(mode, log2, 0)
            if self.tskip and log2 == 2:
                lev, tsf = decode_residual(dec, log2, 0, scan, sdh=self.sdh,
                                           tskip=True)
            else:
                lev, tsf = decode_residual(dec, log2, 0, scan, sdh=self.sdh), False
            resid = (self._resid_ts(lev, self.qp_y, log2, 0, True) if tsf else
                     self._resid(lev, self.qp_y, log2, 0, True, dst=(log2 == 2)))
        else:
            resid = 0
        self.y[y0 : y0 + n, x0 : x0 + n] = np.clip(pred + resid, 0, self.maxv)

    def _chroma_unit(self, dec, x0, y0, log2c, cmode, cbf_cb, cbf_cr) -> None:
        xc, yc = x0 >> 1, y0 >> 1
        n = 1 << log2c
        scan = residual_scan_idx(cmode, log2c, 1)
        for canvas, cbf, cidx, qpc in ((self.u, cbf_cb, 1, self.qp_cb),
                                       (self.v, cbf_cr, 2, self.qp_cr)):
            pred = self._predict(canvas, xc, yc, log2c, False, cmode, True)
            if cbf:
                if self.tskip and log2c == 2:
                    lev, tsf = decode_residual(dec, log2c, cidx, scan,
                                               sdh=self.sdh, tskip=True)
                else:
                    lev, tsf = decode_residual(dec, log2c, cidx, scan,
                                               sdh=self.sdh), False
                resid = (self._resid_ts(lev, qpc, log2c, cidx, True) if tsf
                         else self._resid(lev, qpc, log2c, cidx, True))
            else:
                resid = 0
            canvas[yc : yc + n, xc : xc + n] = np.clip(pred + resid, 0, self.maxv)
