"""Decoder top level: Annex-B byte stream in, frames out.

Host side parses NALs/headers and CABAC-decodes slice data to coefficient
arrays; the device scans reconstruct.  Maintains a one-picture DPB for the
low-delay P chain.  Parity target: bit-exact output vs independent
conformant decoders (openHEVC in the reference; libavcodec in our test
oracle — SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.nal import NalType, is_idr, split_annexb
from ..core.params import (
    ParsedPps,
    ParsedSps,
    StreamConfig,
    parse_pps,
    parse_slice_header,
    parse_sps,
)
from ..entropy.slice_data import (
    SaoState,
    decode_slice_data_intra,
    decode_slice_data_intra_wpp,
    decode_slice_data_p,
    decode_slice_data_p_wpp,
    decode_slice_data_intra_qp,
)
from ..ops.deblock import compute_bs, deblock_frame
from ..ops.sao import sao_apply
from .frame_inter import reconstruct_frame_p
from .frame_intra import reconstruct_frame_intra


class Decoder:
    """HEVC decoder for the tool-set the encoder emits (I + low-delay P)."""

    def __init__(self) -> None:
        self.sps: ParsedSps | None = None
        self.pps: ParsedPps | None = None
        self._ref = None  # last decoded picture (low-delay fast path)
        self._dpb: dict = {}  # full POC -> picture (random-access refs)
        self._i32_refs: dict = {}  # POC -> (int32 planes, id anchor)
        self._period = 0  # IDR period counter for output ordering
        self._poc_prev = (0, 0)  # (prevPicOrderCntLsb, prevPicOrderCntMsb)

    def _derive_poc(self, sh, nal_type: int) -> int:
        """PicOrderCntVal via the MSB wrap rule (8.3.1).

        Streams longer than MaxPicOrderCntLsb frames between IDRs (x265
        default open GOP: lsb wraps every 256) would alias a raw-lsb DPB;
        full POC keys make long sequences and open GOP exact."""
        if is_idr(nal_type):
            self._poc_prev = (0, 0)
            sh.poc = 0
            return 0
        max_lsb = 1 << self.sps.log2_max_poc_lsb
        prev_lsb, prev_msb = self._poc_prev
        lsb = sh.pic_order_cnt_lsb
        if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
            msb = prev_msb + max_lsb
        elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
            msb = prev_msb - max_lsb
        else:
            msb = prev_msb
        sh.poc = msb + lsb
        # prevTid0Pic excludes RADL/RASL pictures (nal types 6..9)
        if nal_type not in (6, 7, 8, 9):
            self._poc_prev = (lsb, msb)
        return sh.poc

    def decode(self, stream: bytes):
        """Decode an Annex-B stream; returns frames in output (POC) order.

        Generic-tier pictures run frame-parallel (the openHEVC
        frame-threads analogue, openhevcfilter.cpp:36-47): slice headers
        and POCs parse sequentially, then each picture executes on a
        worker pool as soon as every reference POC it lists is decoded.
        IDR (DPB clear), long-term refs, parameter-set changes, and the
        sequential fast tiers are barriers.  KVZ_TPU_DECODE_THREADS=1
        disables it."""
        sched = _FrameScheduler(self)
        for nal in split_annexb(stream):
            if nal.nal_type == NalType.SPS:
                sched.flush()
                self.sps = parse_sps(nal.rbsp)
            elif nal.nal_type == NalType.PPS:
                sched.flush()
                self.pps = parse_pps(nal.rbsp)
            elif nal.nal_type in (NalType.VPS, NalType.AUD, NalType.PREFIX_SEI, NalType.SUFFIX_SEI):
                continue
            elif nal.nal_type <= 31:  # slice of a coded picture
                if self.sps is None or self.pps is None:
                    continue  # parameter sets not yet seen (reference behavior:
                    # openhevcfilter.cpp:116-143 discards until VPS/SPS/PPS)
                # first bit of the slice RBSP = first_slice_segment_in_pic_flag
                # (7.3.6.1): a 1 opens a new picture, a 0 continues the last
                sched.add_nal(nal)
        frames = sched.finish()
        frames.sort(key=lambda t: t[0])
        out = [f for _, f in frames]
        cw = getattr(self.sps, "conf_win", (0, 0, 0, 0)) if self.sps else (0, 0, 0, 0)
        if any(cw):
            # conformance window (7.4.3.2.1): offsets in SubWidthC/SubHeightC
            # luma-sample units (2 for 4:2:0); crop output only — the DPB
            # keeps coded-size pictures for prediction
            l, r_, t, b = cw

            def crop(p, f):
                p = np.asarray(p)
                return p[f * t : p.shape[0] - f * b or None,
                         f * l : p.shape[1] - f * r_ or None]

            out = [(crop(y, 2), crop(u, 1), crop(v, 1)) for (y, u, v) in out]
        return out

    def _alien_shape(self, sps, sh) -> bool:
        pps = self.pps
        ctb = 1 << sps.ctb_log2
        return (
            sps.ctb_log2 != 4
            # partial boundary CTUs (non-CTB-multiple pictures): inferred
            # splits at the picture edge -- generic-tier territory (the
            # fast tier assumes whole CTUs; own streams pad + crop via the
            # conformance window instead)
            or sps.width % ctb != 0 or sps.height % ctb != 0
            or getattr(sps, "max_td_intra", 0) > 0
            or (sh.slice_type != 2 and sps.min_cb_log2 == 3)
            or (sh.slice_type != 2 and getattr(sps, "max_td_inter", 0) > 0)
            # tools the fast tier assumes absent -> generic engine
            or pps.cb_qp_offset != 0 or pps.cr_qp_offset != 0
            or sh.cb_qp_offset != 0 or sh.cr_qp_offset != 0
            or sh.cabac_init_flag
            or getattr(sps, "pcm_enabled", False)
            or getattr(sps, "scaling_list_enabled", False)
            or getattr(pps, "transform_skip", False)
            or getattr(sps, "bit_depth", 8) != 8
            or bool(sh.lt_pics)
            or sh.list_entry_l0 is not None or sh.list_entry_l1 is not None
        )

    def _analyze_picture(self, nals):
        """Sequential pre-pass: parse every slice header of one picture,
        derive its POC (stateful 8.3.1), and fix entry-point offsets."""
        sps, pps = self.sps, self.pps
        headers = []
        prev_ind = None
        for x in nals:
            hh = parse_slice_header(x.rbsp, x.nal_type, sps, pps,
                                    prev_independent=prev_ind)
            if not hh.dependent:
                prev_ind = hh
            headers.append(hh)
        self._derive_poc(headers[0], nals[0].nal_type)
        for hh in headers[1:]:
            hh.poc = headers[0].poc
        for x, hh in zip(nals, headers):
            if hh.entry_points:
                from ..core.nal import rbsp_entry_offsets

                hh.entry_points = rbsp_entry_offsets(
                    x.removals, hh.data_offset_bits // 8, hh.entry_points)
        return headers

    def _is_generic_tier(self, nals, headers):
        """Mirror of the tier dispatch: True when this picture will run in
        the generic engine (the frame-parallel tier)."""
        sh0 = headers[0]
        if sh0.slice_type not in (0, 1, 2):
            return False
        if len(nals) == 1:
            return self._alien_shape(self.sps, sh0)
        return (self._alien_shape(self.sps, sh0)
                or any(h.dependent for h in headers)
                or any(h.slice_type != 2 for h in headers))

    def _ref_poc_set(self, sh):
        """POCs this picture's RPS marks used (its decode dependencies),
        or None when readiness cannot be derived locally (long-term refs
        resolve against the live DPB)."""
        if sh.slice_type == 2:
            return set()
        if sh.lt_pics:
            return None
        negs, poss, used = sh.rps
        used_neg = used[: len(negs)] if used else [True] * len(negs)
        used_pos = used[len(negs) :] if used else [True] * len(poss)
        return ({sh.poc + d for d, u in zip(negs, used_neg) if u}
                | {sh.poc + d for d, u in zip(poss, used_pos) if u})

    def _decode_picture_group(self, nals, headers):
        """Decode one picture from pre-parsed headers (tier dispatch)."""
        if len(nals) == 1:
            return self._decode_picture_one(nals[0], headers[0])
        if self._is_generic_tier(nals, headers):
            # multi-slice inter pictures decode via the generic engine (the
            # fast multislice tier is intra-only)
            if is_idr(nals[0].nal_type):
                self._period += 1
                self._dpb.clear()
            return self._decode_picture_generic(list(zip(nals, headers)))
        return self._decode_multislice_picture(nals, headers)

    def _decode_multislice_picture(self, nals, headers):
        """Row-aligned independent slices of one intra picture."""
        from dataclasses import replace as dc_replace

        import jax.numpy as jnp

        from ..entropy.slice_data import decode_slice_data_intra
        from .frame_intra import reconstruct_frame_intra

        sps, pps = self.sps, self.pps
        if is_idr(nals[0].nal_type):
            self._period += 1
            self._dpb.clear()
        cfg = StreamConfig(width=sps.width, height=sps.height, qp=26,
                           ctb_log2=sps.ctb_log2, min_cb_log2=sps.min_cb_log2)
        cw, chh = cfg.ctbs_w, cfg.ctbs_h
        n = cfg.ctb_size
        from ..entropy.slice_data import decode_slice_data_intra_open

        if any(sh.slice_type != 2 for sh in headers):
            raise NotImplementedError("multi-slice pictures are intra-only for now")
        # each slice signals its own end (end_of_slice_segment_flag), so a
        # lost neighbor NAL cannot corrupt the survivors; unfilled rows
        # stay mid-gray (the reference decoder's concealment-free behavior)
        y = np.full((sps.height, sps.width), 128, np.uint8)
        u = np.full((sps.height // 2, sps.width // 2), 128, np.uint8)
        v = np.full((sps.height // 2, sps.width // 2), 128, np.uint8)
        for sh, x in zip(headers, nals):
            a0 = sh.segment_address
            if a0 % cw:
                raise NotImplementedError("slices must be CTU-row aligned")
            r0 = a0 // cw
            payload = x.rbsp[sh.data_offset_bits // 8 :]
            modes, lev_y, lev_cb, lev_cr, cnt = decode_slice_data_intra_open(
                dc_replace(cfg, qp=sh.qp), payload, sh.qp, cw * (chh - r0)
            )
            rows = cnt // cw
            if rows == 0:
                continue
            m = rows * cw
            sy, su, sv = reconstruct_frame_intra(
                modes[:m], lev_y[:m], lev_cb[:m], lev_cr[:m], sh.qp,
                width=cfg.width, height=rows * n,
            )
            y[r0 * n : (r0 + rows) * n] = np.asarray(sy)
            u[r0 * n // 2 : (r0 + rows) * n // 2] = np.asarray(su)
            v[r0 * n // 2 : (r0 + rows) * n // 2] = np.asarray(sv)
        y, u, v = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        if not pps.deblocking_disabled:
            y, u, v = deblock_frame(y, u, v, headers[0].qp, spacing=cfg.ctb_size)
        frame = (np.asarray(y), np.asarray(u), np.asarray(v))
        self._ref = frame
        self._dpb[headers[0].poc] = frame
        return (self._period, headers[0].poc), frame

    def _ref_pic_lists(self, sh):
        """RefPicList0/1 initialization (8.3.4): StCurrBefore + StCurrAfter
        + LtCurr candidates (in list order per direction), cycled to the
        active count, or reordered by ref_pic_list_modification entries."""
        negs, poss, used = sh.rps
        cur = sh.poc
        used_neg = used[: len(negs)] if used else [True] * len(negs)
        used_pos = used[len(negs) :] if used else [True] * len(poss)
        st_before = [cur + d for d, u in zip(negs, used_neg) if u]
        st_after = [cur + d for d, u in zip(poss, used_pos) if u]
        max_lsb = 1 << self.sps.log2_max_poc_lsb
        lt = []
        for (lsb, u, msb_present, cycle) in sh.lt_pics:
            if not u:
                continue
            if msb_present:
                poc = lsb + cur - (cur & (max_lsb - 1)) - cycle * max_lsb
            else:
                cands = [p for p in self._dpb if (p & (max_lsb - 1)) == lsb]
                if not cands:
                    raise ValueError(f"missing long-term reference lsb {lsb}")
                poc = max(cands)
            lt.append(poc)
        cand0 = st_before + st_after + lt
        cand1 = st_after + st_before + lt

        # Prune int32 copies of pictures evicted from the DPB up front
        # (each is ~12 MB at 1080p) — not only on cache misses, so all-hit
        # streams don't accumulate stale entries (ADVICE r3).
        for k in [k for k in self._i32_refs if k not in self._dpb]:
            self._i32_refs.pop(k, None)

        def fetch(poc):
            pic = self._dpb.get(poc)
            if pic is None:
                raise ValueError(f"missing reference picture POC {poc}")
            # int32 view of the (uint8) DPB picture, converted once per
            # decoded picture instead of once per referencing picture —
            # at 1080p each conversion is a ~12 MB copy.  Keyed by POC
            # with an identity check so a same-POC replacement (new
            # CVS) invalidates; pruned lazily against the DPB.
            cached = self._i32_refs.get(poc)
            if cached is None or cached[1] is not pic[0]:
                conv = tuple(np.ascontiguousarray(p, np.int32) for p in pic)
                self._i32_refs[poc] = cached = (conv, pic[0])
            return (cached[0], poc)

        def mk(cand, n, entries):
            if not cand:
                raise ValueError("inter slice without reference pictures")
            idxs = entries[:n] if entries is not None else [i % len(cand) for i in range(n)]
            return [fetch(cand[i]) for i in idxs]

        l0 = mk(cand0, max(1, getattr(sh, "num_ref_idx_l0", 1)), sh.list_entry_l0)
        l1 = []
        if sh.slice_type == 0:
            l1 = mk(cand1, max(1, getattr(sh, "num_ref_idx_l1", 1)), sh.list_entry_l1)
        return l0, l1

    def _decode_slices_generic(self, gd, slices, sao_state, init_type,
                               starts, ends, sids, ctu_fn):
        """Entropy stage of the generic tier for raster-scan (non-tiled)
        pictures: native C tiers first, Python/CABAC fallback."""
        from ..entropy.cabac import CabacDecoder
        from .native_parse import try_parse_picture
        from .native_recon import try_recon_picture

        sps, pps = self.sps, self.pps
        # fastest tier: full C reconstruction into gd's own buffers
        if try_recon_picture(gd, sps, pps, slices, starts, ends, sids,
                             init_type, sao_state):
            return
        replay = try_parse_picture(gd, sps, pps, slices, starts, ends,
                                   sids, init_type, sao_state)
        carry_ctx = None
        for k, (nal_k, sh_k) in enumerate(slices):
            gd.cur_slice = sids[k]
            if k:  # per-SEGMENT QP prediction / quant-group reset (8.6.1)
                gd._set_qp(sh_k.qp)
                gd.qp_prev = sh_k.qp
                gd.slice_qp = sh_k.qp
                gd._qg_key = None
            payload = nal_k.rbsp[sh_k.data_offset_bits // 8 :]
            st, en = starts[k], ends[k]
            if replay is not None:
                cw_ = gd.cw
                wpp_ = bool(pps.entropy_sync)
                for i in range(st, en):
                    ctu_fn(replay, i)
                    end = replay.decode_terminate()
                    if end != (1 if i == en - 1 else 0):
                        raise ValueError(f"end_of_slice mismatch at CTU {i}")
                    if wpp_ and i != en - 1 and i % cw_ == cw_ - 1:
                        if replay.decode_terminate() != 1:
                            raise ValueError("missing end_of_subset_one_bit")
            elif pps.entropy_sync:
                from ..entropy.slice_data import decode_slice_data_wpp

                if sh_k.dependent:
                    raise NotImplementedError("dependent slices with WPP")
                decode_slice_data_wpp(
                    StreamConfig(width=sps.width, height=sps.height, qp=sh_k.qp,
                                 ctb_log2=sps.ctb_log2, min_cb_log2=sps.min_cb_log2),
                    payload, sh_k.entry_points, ctu_fn, init_type, sh_k.qp,
                    ctu_range=(st, en),
                )
            else:
                # dependent segments continue the parent's contexts (9.3.1)
                dec = CabacDecoder(payload, init_type=init_type, slice_qp=sh_k.qp,
                                   ctx=carry_ctx if sh_k.dependent else None)
                for i in range(st, en):
                    ctu_fn(dec, i)
                    end = dec.decode_terminate()
                    if end != (1 if i == en - 1 else 0):
                        raise ValueError(f"end_of_slice mismatch at CTU {i}")
                carry_ctx = dec.ctx

    def _decode_tiles_generic(self, gd, slices, sao_state, init_type):
        """Generic-tier tiled pictures (any CTB size — our quad64-tiles
        streams and alien uniform-column tiles): one CABAC substream per
        tile in tile-raster order; availability is tile-gated by reusing
        the engines' slice gating (slice_of_ctu = TileId)."""
        from ..entropy.cabac import CabacDecoder
        from ..entropy.slice_data import tile_of_map

        sps, pps = self.sps, self.pps
        if pps.num_tile_rows != 1 or not pps.uniform_spacing:
            raise NotImplementedError(
                "generic tiles: uniform tile columns only")
        if len(slices) != 1:
            raise NotImplementedError("generic tiles with multi-slice")
        if not getattr(pps, "loop_filter_across_tiles", True):
            raise NotImplementedError(
                "loop_filter_across_tiles_enabled_flag = 0")
        nal, sh = slices[0]
        n_cols = pps.num_tile_cols
        cw, ch = gd.cw, gd.ch
        cfg_t = StreamConfig(width=sps.width, height=sps.height,
                             ctb_log2=sps.ctb_log2)
        tile_of = tile_of_map(cfg_t, n_cols)
        gd.slice_of_ctu = tile_of
        if sao_state is not None:
            sao_state.tile_of = tile_of
        payload = nal.rbsp[sh.data_offset_bits // 8 :]
        bounds = [0]
        for off in sh.entry_points or ():
            bounds.append(bounds[-1] + off)
        bounds.append(len(payload))
        if len(bounds) != n_cols + 1:
            raise ValueError("entry point count does not match tile count")
        cols = [((t * cw) // n_cols, ((t + 1) * cw) // n_cols)
                for t in range(n_cols)]
        for t, (x0, x1) in enumerate(cols):
            gd.cur_slice = t
            gd.qp_prev = sh.qp  # 8.6.1: qPY_PREV = SliceQpY at tile start
            gd._qg_key = None
            dec = CabacDecoder(payload[bounds[t] : bounds[t + 1]],
                               init_type=init_type, slice_qp=sh.qp)
            last_tile = t == n_cols - 1
            for r in range(ch):
                for c in range(x0, x1):
                    i = r * cw + c
                    if sao_state is not None:
                        sao_state.decode(dec, i)
                    gd.decode_ctu(dec, i)
                    last = last_tile and r == ch - 1 and c == x1 - 1
                    end = dec.decode_terminate()
                    if end != (1 if last else 0):
                        raise ValueError(f"end_of_slice mismatch at CTU {i}")
                    if not last and r == ch - 1 and c == x1 - 1:
                        if dec.decode_terminate() != 1:
                            raise ValueError("missing end_of_subset")
        # availability gating was tile-scoped; clear it so the loop
        # filters don't apply slice-boundary restrictions to tile edges
        # (loop_filter_across_tiles_enabled_flag = 1 here)
        gd.slice_of_ctu = None
        gd.cur_slice = 0

    def _decode_picture_generic(self, slices):
        """Any-CTB-size pictures via the recursive reference engines:
        x265-default ctu=64 streams etc.  `slices` is a list of
        (nal, parsed_header) for the picture's slice segments; neighbor
        availability, SAO merging, and CABAC state respect slice
        boundaries (6.4.1 / 7.3.8.3)."""
        from ..entropy.cabac import CabacDecoder
        from .generic_intra import GenericIntraDecoder

        nal, sh = slices[0]
        sps, pps = self.sps, self.pps
        init_type = 0
        if sh.slice_type == 0:
            from .generic_b import GenericBDecoder

            cur_poc = sh.poc
            refs0, refs1 = self._ref_pic_lists(sh)
            col_list = refs0 if getattr(sh, "collocated_from_l0", True) else refs1
            col_poc = col_list[min(getattr(sh, "collocated_ref_idx", 0),
                                   len(col_list) - 1)][1]
            mt = getattr(self, "_motion", {}).get(col_poc)
            col = (mt[0], mt[1], mt[2], col_poc) if mt is not None else None
            gd = GenericBDecoder(sps, pps, sh, refs0, refs1, col=col, cur_poc=cur_poc)
            init_type = 1 if sh.cabac_init_flag else 2
        elif sh.slice_type == 1:
            from .generic_inter import GenericInterDecoder

            cur_poc = sh.poc
            refs, _ = self._ref_pic_lists(sh)
            col = None
            col_poc = refs[0][1]
            mt = getattr(self, "_motion", {}).get(col_poc)
            if mt is not None:
                col = (mt[0], mt[1], mt[2], col_poc)
            gd = GenericInterDecoder(sps, pps, sh, refs, col=col, cur_poc=cur_poc)
            init_type = 2 if sh.cabac_init_flag else 1
        else:
            gd = GenericIntraDecoder(sps, pps, sh.qp, sh=sh)
        sao_state = None
        if sps.sao_enabled and (sh.sao_luma or sh.sao_chroma):
            sao_state = SaoState(gd.cw, gd.ch, luma=sh.sao_luma, chroma=sh.sao_chroma)
        nctu = gd.cw * gd.ch
        starts = [s2.segment_address if k else 0 for k, (_, s2) in enumerate(slices)]
        ends = starts[1:] + [nctu]
        # slice ids: dependent SEGMENTS belong to their parent slice
        # (prediction availability is slice-scoped, 6.4.1)
        sids = []
        for k, (_, s2) in enumerate(slices):
            sids.append(sids[-1] if (k and s2.dependent) else k)
        if len(set(sids)) > 1:
            slice_of = np.zeros(nctu, np.int32)
            for k, (st, en) in enumerate(zip(starts, ends)):
                slice_of[st:en] = sids[k]
            gd.slice_of_ctu = slice_of
            if sao_state is not None:
                sao_state.slice_of = slice_of

        def ctu_fn(dec, i):
            if sao_state is not None:
                sao_state.decode(dec, i)
            gd.decode_ctu(dec, i)

        if getattr(pps, "tiles_enabled", False):
            # generic-tier tiles (any CTB size — our quad64-tiles streams
            # and alien tiled streams): per-tile CABAC substreams in
            # tile-raster order.  Availability reuses the engines'
            # slice gating — samples in another TILE are unavailable
            # exactly as samples in another slice (6.4.1), so
            # slice_of_ctu = TileId + cur_slice = current tile gives the
            # normative behavior for single-slice tiled pictures.
            self._decode_tiles_generic(gd, slices, sao_state, init_type)
        else:
            self._decode_slices_generic(gd, slices, sao_state, init_type,
                                        starts, ends, sids, ctu_fn)

        restrict = (getattr(gd, "slice_of_ctu", None) is not None
                    and not sh.loop_filter_across_slices)
        if gd.bd == 8 and not restrict:
            # native in-loop filters (deblock + SAO in C); the JAX path
            # below is the reference and covers restrict/10-bit
            from ..native import native_filters

            frame = native_filters(gd, sps, pps, sh, sao_state)
            if frame is not None:
                return self._commit_picture(gd, sps, sh, frame)
        pix = np.uint8 if gd.bd == 8 else np.uint16
        y = jnp.asarray(gd.y.astype(pix))
        u = jnp.asarray(gd.u.astype(pix))
        v = jnp.asarray(gd.v.astype(pix))
        if not pps.deblocking_disabled:
            bs_rep = 0
            if hasattr(gd, "bs_maps"):
                from ..native import native_bs_maps

                bs = native_bs_maps(gd, is_b=hasattr(gd, "pf4"))
                bs_v, bs_h = bs if bs is not None else gd.bs_maps()
                bs_rep = 4
            else:
                # all-intra: every recorded CU/TU edge is bS 2
                h8, w8 = gd.edge_v.shape
                bs_v = np.zeros((w8 - 1, h8), np.int32)
                for e in range(1, w8):
                    bs_v[e - 1, :] = 2 * gd.edge_v[:, e]
                bs_h = np.zeros((h8 - 1, w8), np.int32)
                for e in range(1, h8):
                    bs_h[e - 1, :] = 2 * gd.edge_h[e, :]
            if getattr(gd, "slice_of_ctu", None) is not None \
                    and not sh.loop_filter_across_slices:
                # slice_loop_filter_across_slices off (7.4.3.3): no
                # deblocking across slice-segment boundaries
                cl = 1 << sps.ctb_log2
                h8_, w8_ = gd.edge_v.shape
                xs8 = (np.arange(w8_) * 8) // cl
                ys8 = (np.arange(h8_) * 8) // cl
                s8 = gd.slice_of_ctu.reshape(gd.ch, gd.cw)[np.ix_(ys8, xs8)]
                bs_v = np.asarray(bs_v).copy()
                bs_h = np.asarray(bs_h).copy()
                rpv = bs_v.shape[1] // h8_
                for e in range(1, w8_):
                    diff = s8[:, e - 1] != s8[:, e]
                    if diff.any():
                        bs_v[e - 1, np.repeat(diff, rpv)] = 0
                rph = bs_h.shape[1] // w8_
                for e in range(1, h8_):
                    diff = s8[e - 1, :] != s8[e, :]
                    if diff.any():
                        bs_h[e - 1, np.repeat(diff, rph)] = 0
            qp_map8 = None
            if gd.cu_qp_delta:
                qp_map8 = jnp.asarray(gd.qp4[::2, ::2])
            y, u, v = deblock_frame(
                y, u, v, sh.qp, spacing=8,
                bs_v=jnp.asarray(bs_v), bs_h=jnp.asarray(bs_h), chroma_every=2,
                qp_map=qp_map8, bs_rep=bs_rep,
                beta_offset=sh.beta_offset_div2, tc_offset=sh.tc_offset_div2,
                cb_qp_offset=gd.cb_off, cr_qp_offset=gd.cr_off, bd=gd.bd,
            )
        if sao_state is not None:
            from ..ops.sao import sao_apply as _sao_apply

            sh2 = (gd.ch, gd.cw)
            t = sao_state.typ.reshape(3, *sh2)
            a = sao_state.aux.reshape(3, *sh2)
            o = sao_state.offs.reshape(3, *sh2, 4)
            ctb = 1 << sps.ctb_log2
            restrict = (getattr(gd, "slice_of_ctu", None) is not None
                        and not sh.loop_filter_across_slices)
            pre = (np.asarray(y), np.asarray(u), np.asarray(v)) if restrict else None
            y = _sao_apply(y, jnp.asarray(t[0]), jnp.asarray(a[0]), jnp.asarray(o[0]), ctb=ctb, bd=gd.bd)
            u = _sao_apply(u, jnp.asarray(t[1]), jnp.asarray(a[1]), jnp.asarray(o[1]), ctb=ctb // 2, bd=gd.bd)
            v = _sao_apply(v, jnp.asarray(t[2]), jnp.asarray(a[2]), jnp.asarray(o[2]), ctb=ctb // 2, bd=gd.bd)
            if restrict:
                # SAO EO across a slice boundary: the neighbor sample is
                # unavailable -> the sample is left unmodified (8.7.3)
                smap = np.repeat(np.repeat(gd.slice_of_ctu.reshape(gd.ch, gd.cw),
                                           ctb, 0), ctb, 1)[: sps.height, : sps.width]

                def fix(plane, pre_p, comp, scale):
                    pl = np.asarray(plane).copy()
                    spm = smap[::scale, ::scale]
                    H, W = pl.shape
                    cs = ctb // scale
                    tpx = np.repeat(np.repeat(t[comp], cs, 0), cs, 1)[:H, :W]
                    apx = np.repeat(np.repeat(a[comp], cs, 0), cs, 1)[:H, :W]
                    dirs = {0: ((0, -1), (0, 1)), 1: ((-1, 0), (1, 0)),
                            2: ((-1, -1), (1, 1)), 3: ((-1, 1), (1, -1))}
                    mask = np.zeros((H, W), bool)
                    for cls, dpair in dirs.items():
                        m = (tpx == 2) & (apx == cls)
                        if not m.any():
                            continue
                        for dy, dx in dpair:
                            nb = np.full((H, W), -1, np.int64)
                            src = spm[max(0, dy) : H + min(0, dy),
                                      max(0, dx) : W + min(0, dx)]
                            nb[max(0, -dy) : H + min(0, -dy),
                               max(0, -dx) : W + min(0, -dx)] = src
                            mask |= m & (nb != -1) & (nb != spm)
                    pl[mask] = pre_p[mask]
                    return jnp.asarray(pl)

                y = fix(y, pre[0], 0, 1)
                u = fix(u, pre[1], 1, 2)
                v = fix(v, pre[2], 2, 2)
        return self._commit_picture(
            gd, sps, sh, (np.asarray(y), np.asarray(u), np.asarray(v)))

    def _commit_picture(self, gd, sps, sh, frame):
        """DPB + TMVP-motion commit shared by the filter paths."""
        self._ref = frame
        self._dpb[sh.poc] = frame
        # retain the motion field for TMVP from pictures that follow
        if not hasattr(self, "_motion"):
            self._motion = {}
        if sh.slice_type in (0, 1):
            self._motion[sh.poc] = (
                gd.inter4.copy(), gd.mv4.copy(), gd.refpoc4.copy())
        else:
            self._motion[sh.poc] = (
                np.zeros((sps.height // 4, sps.width // 4), np.int32),
                np.zeros((sps.height // 4, sps.width // 4, 2), np.int32),
                np.zeros((sps.height // 4, sps.width // 4), np.int32))
        return (self._period, sh.poc), frame

    def _decode_picture_one(self, nal, sh):
        """Returns ((period, poc), frame); sh is pre-parsed."""
        sps, pps = self.sps, self.pps
        from ..core.nal import is_idr as _is_idr

        if _is_idr(nal.nal_type):
            self._period += 1
            self._dpb.clear()
        alien_shape = self._alien_shape(sps, sh)
        if alien_shape and sh.slice_type in (0, 1, 2):
            return self._decode_picture_generic([(nal, sh)])
        try:
            return self._decode_picture_fast(nal, sh)
        except (NotImplementedError, ValueError) as e:
            # fast-tier envelope miss discovered mid-parse (e.g. explicit
            # chroma modes in a plain-CU16 alien stream, or the native
            # CABAC hitting syntax it does not model): the generic tier is
            # the complete engine -- re-decode the slice there.  True
            # corruption still raises: the generic decode fails too.
            refused = isinstance(e, NotImplementedError) or \
                "native slice decode failed" in str(e)
            if refused and sh.slice_type in (0, 1, 2):
                return self._decode_picture_generic([(nal, sh)])
            raise

    def _decode_picture_fast(self, nal, sh):
        """Device fast tier: whole-CTU streams in the tooled envelope."""
        sps, pps = self.sps, self.pps
        if sps.ctb_log2 != 4 or sps.min_cb_log2 not in (3, 4):
            raise NotImplementedError(
                "inter decoding supports CTB 16 streams (intra: any CTB size)"
            )
        cfg = StreamConfig(
            width=sps.width,
            height=sps.height,
            qp=sh.qp,
            ctb_log2=sps.ctb_log2,
            min_cb_log2=sps.min_cb_log2,
            sign_data_hiding=pps.sign_data_hiding,
        )
        if sps.min_cb_log2 == 3:
            if sh.slice_type != 2:
                raise NotImplementedError("CU8 streams are intra-only for now")
            sao_state = None
            if sps.sao_enabled and (sh.sao_luma or sh.sao_chroma):
                sao_state = SaoState(
                    cfg.ctbs_w, cfg.ctbs_h, luma=sh.sao_luma, chroma=sh.sao_chroma
                )
            from ..encoder.frame_intra_cu8 import reconstruct_frame_intra_cu8
            from ..entropy.slice_data import decode_slice_data_intra_cu8x

            payload = nal.rbsp[sh.data_offset_bits // 8 :]
            if pps.entropy_sync:
                from ..entropy.slice_data import decode_slice_data_intra_cu8x_wpp

                split, part, modes4, cmode4, lev_y, lev_cb, lev_cr = (
                    decode_slice_data_intra_cu8x_wpp(
                        cfg, payload, sh.entry_points, sh.qp, sao=sao_state
                    )
                )
            else:
                split, part, modes4, cmode4, lev_y, lev_cb, lev_cr = (
                    decode_slice_data_intra_cu8x(cfg, payload, sh.qp,
                                                 return_cmode=True, sao=sao_state)
                )
            y, u, v = reconstruct_frame_intra_cu8(
                split, part, modes4, lev_y, lev_cb, lev_cr, sh.qp,
                width=sps.width, height=sps.height, cmode4=cmode4,
            )
            if not pps.deblocking_disabled:
                from ..ops.deblock import bs_maps_cu8

                bv, bh = bs_maps_cu8(split, cfg.ctbs_w, cfg.ctbs_h)
                y, u, v = deblock_frame(
                    y, u, v, sh.qp, spacing=8, bs_v=bv, bs_h=bh, chroma_every=2
                )
            if sao_state is not None:
                sh2 = (cfg.ctbs_h, cfg.ctbs_w)
                t = sao_state.typ.reshape(3, *sh2)
                a = sao_state.aux.reshape(3, *sh2)
                o = sao_state.offs.reshape(3, *sh2, 4)
                y = sao_apply(y, jnp.asarray(t[0]), jnp.asarray(a[0]), jnp.asarray(o[0]), ctb=cfg.ctb_size)
                u = sao_apply(u, jnp.asarray(t[1]), jnp.asarray(a[1]), jnp.asarray(o[1]), ctb=cfg.ctb_size // 2)
                v = sao_apply(v, jnp.asarray(t[2]), jnp.asarray(a[2]), jnp.asarray(o[2]), ctb=cfg.ctb_size // 2)
            frame = (np.asarray(y), np.asarray(u), np.asarray(v))
            self._ref = frame
            self._dpb[sh.poc] = frame
            return (self._period, sh.poc), frame
        payload = nal.rbsp[sh.data_offset_bits // 8 :]
        bs_v = bs_h = None
        qp_actual = None
        sao_state = None
        if sps.sao_enabled and (sh.sao_luma or sh.sao_chroma):
            if not pps.entropy_sync and sps.min_cb_log2 != 3 \
                    and not pps.tiles_enabled:
                raise NotImplementedError(
                    "SAO decode needs WPP, tiles or CU8 streams")
            # (the CU8 branch builds its own state before this point)
            sao_state = SaoState(
                cfg.ctbs_w, cfg.ctbs_h, luma=sh.sao_luma, chroma=sh.sao_chroma
            )
            if pps.tiles_enabled:
                from ..entropy.slice_data import tile_of_map

                sao_state.tile_of = tile_of_map(cfg, pps.num_tile_cols)
        if sh.slice_type == 2:
            if pps.tiles_enabled:
                if pps.num_tile_rows != 1 or not pps.uniform_spacing:
                    raise NotImplementedError("decoder supports uniform tile columns")
                from ..encoder.tiled import reconstruct_frame_intra_tiles
                from ..entropy.slice_data import decode_slice_data_intra_tiles

                res = decode_slice_data_intra_tiles(
                    cfg, pps.num_tile_cols, payload, sh.entry_points, sh.qp,
                    cu_qp_delta=pps.cu_qp_delta_enabled, sao=sao_state,
                )
                if pps.cu_qp_delta_enabled:
                    modes, lev_y, lev_cb, lev_cr, qp_actual = res
                else:
                    modes, lev_y, lev_cb, lev_cr = res
                dec_qp = (np.asarray(qp_actual) if qp_actual is not None
                          else sh.qp)
                y, u, v = reconstruct_frame_intra_tiles(
                    cfg, pps.num_tile_cols, modes, lev_y, lev_cb, lev_cr,
                    dec_qp
                )
            elif pps.entropy_sync:
                modes, lev_y, lev_cb, lev_cr, qp_actual = decode_slice_data_intra_wpp(
                    cfg, payload, sh.entry_points, sh.qp,
                    cu_qp_delta=pps.cu_qp_delta_enabled,
                    sao=sao_state,
                )
            elif pps.cu_qp_delta_enabled:
                modes, lev_y, lev_cb, lev_cr, qp_actual = decode_slice_data_intra_qp(
                    cfg, payload, sh.qp
                )
            else:
                modes, lev_y, lev_cb, lev_cr = decode_slice_data_intra(cfg, payload, sh.qp)
            if not pps.tiles_enabled:
                dec_qp = jnp.asarray(qp_actual) if qp_actual is not None else sh.qp
                y, u, v = reconstruct_frame_intra(
                    modes, lev_y, lev_cb, lev_cr, dec_qp, width=sps.width, height=sps.height
                )
        elif sh.slice_type in (0, 1):
            negs, poss, _used = sh.rps
            ref0_poc = sh.poc + (negs[0] if negs else -1)
            ref = self._dpb.get(ref0_poc, self._ref)
            if ref is None:
                raise ValueError("P/B slice without a reference picture")
            # TMVP: the collocated picture is ref[0]; its motion was
            # retained (by whichever tier decoded it) in self._motion at
            # 4x4 granularity.  Sample each CTU's center position on the
            # 16x16 compression grid (8.5.3.2.8: the bottom-right col PU
            # is always in the next CTB row at CTB16, so center only) and
            # scale by POC distances (8.5.3.2.9).
            col = None
            if getattr(sh, "temporal_mvp", False):
                if pps.tiles_enabled:
                    raise NotImplementedError("fast tier: TMVP with tiles")
                mt = getattr(self, "_motion", {}).get(ref0_poc)
                nctu0 = cfg.ctbs_w * cfg.ctbs_h
                if mt is None:
                    col = (np.zeros((nctu0, 2), np.int32),
                           np.zeros(nctu0, bool))
                else:
                    inter4, mv4, refpoc4 = mt
                    ys = (np.arange(cfg.ctbs_h) * 16) >> 2
                    xs = (np.arange(cfg.ctbs_w) * 16) >> 2
                    ci = inter4[np.ix_(ys, xs)].astype(bool)
                    cmv = mv4[np.ix_(ys, xs)].astype(np.int64)
                    crp = refpoc4[np.ix_(ys, xs)]
                    tb = int(np.clip(sh.poc - ref0_poc, -128, 127))
                    td = np.clip(ref0_poc - crp, -128, 127)
                    abs_td = np.abs(td)
                    tx = (16384 + (abs_td >> 1)) // np.maximum(abs_td, 1)
                    tx = np.where(td < 0, -tx, tx)
                    dsf = np.clip((tb * tx + 32) >> 6, -4096, 4095)
                    prod = dsf[..., None] * cmv
                    scaled = np.clip(np.sign(prod) * ((np.abs(prod) + 127) >> 8),
                                     -32768, 32767).astype(np.int32)
                    out_mv = np.where((td == tb)[..., None], cmv, scaled)
                    col = (out_mv.reshape(nctu0, 2).astype(np.int32),
                           ci.reshape(nctu0))
            if sh.slice_type == 1:
                if pps.tiles_enabled:
                    from ..encoder.tiled import reconstruct_frame_p_tiles
                    from ..entropy.slice_data import decode_slice_data_p_tiles

                    if pps.num_tile_rows != 1 or not pps.uniform_spacing:
                        raise NotImplementedError(
                            "decoder supports uniform tile columns")
                    res = decode_slice_data_p_tiles(
                        cfg, pps.num_tile_cols, payload, sh.entry_points,
                        sh.qp, merge_k=sh.max_num_merge_cand,
                        cu_qp_delta=pps.cu_qp_delta_enabled, sao=sao_state)
                    if pps.cu_qp_delta_enabled:
                        (ctype, intra_modes, mvs, lev_y, lev_cb, lev_cr,
                         qp_actual) = res
                    else:
                        ctype, intra_modes, mvs, lev_y, lev_cb, lev_cr = res
                    dec_qp = (np.asarray(qp_actual) if qp_actual is not None
                              else sh.qp)
                    y, u, v = reconstruct_frame_p_tiles(
                        cfg, pps.num_tile_cols, ctype, intra_modes, mvs,
                        lev_y, lev_cb, lev_cr, ref, dec_qp)
                    bs_v, bs_h = compute_bs(
                        jnp.asarray(ctype),
                        jnp.asarray(np.any(lev_y, axis=(1, 2))),
                        jnp.asarray(mvs), cfg.ctbs_w, cfg.ctbs_h)
                elif pps.entropy_sync:
                    ctype, intra_modes, mvs, lev_y, lev_cb, lev_cr, qp_actual = (
                        decode_slice_data_p_wpp(
                            cfg, payload, sh.entry_points, sh.qp,
                            cu_qp_delta=pps.cu_qp_delta_enabled,
                            sao=sao_state, merge_k=sh.max_num_merge_cand,
                            col=col,
                        )
                    )
                elif pps.cu_qp_delta_enabled:
                    (ctype, intra_modes, mvs, lev_y, lev_cb, lev_cr,
                     qp_actual) = decode_slice_data_p(
                        cfg, payload, sh.qp, merge_k=sh.max_num_merge_cand,
                        col=col, cu_qp_delta=True,
                    )
                else:
                    ctype, intra_modes, mvs, lev_y, lev_cb, lev_cr = decode_slice_data_p(
                        cfg, payload, sh.qp, merge_k=sh.max_num_merge_cand,
                        col=col,
                    )
                if not pps.tiles_enabled:
                    ry, ru, rv = ref
                    dec_qp = jnp.asarray(qp_actual) if qp_actual is not None else sh.qp
                    y, u, v = reconstruct_frame_p(
                        jnp.asarray(ctype), jnp.asarray(intra_modes), jnp.asarray(mvs),
                        lev_y, lev_cb, lev_cr,
                        jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv), dec_qp,
                        width=sps.width, height=sps.height,
                    )
                    bs_v, bs_h = compute_bs(
                        jnp.asarray(ctype),
                        jnp.asarray(np.any(lev_y, axis=(1, 2))),
                        jnp.asarray(mvs),
                        cfg.ctbs_w,
                        cfg.ctbs_h,
                    )
            else:  # B slice
                from ..entropy.slice_data import decode_slice_data_b_wpp
                from ..ops.deblock import compute_bs_b
                from .frame_b import reconstruct_frame_b

                if not pps.entropy_sync:
                    raise NotImplementedError("B decode currently requires WPP streams")
                ref1_poc = sh.poc + (poss[0] if poss else 1)
                ref1 = self._dpb.get(ref1_poc)
                if ref1 is None:
                    raise ValueError(f"missing L1 reference poc {ref1_poc}")
                poc_diffs = (sh.poc - ref0_poc, sh.poc - ref1_poc)
                ctype, intra_modes, pf, mvs, lev_y, lev_cb, lev_cr = decode_slice_data_b_wpp(
                    cfg, payload, sh.entry_points, sh.qp, poc_diffs, sao=sao_state,
                    merge_k=sh.max_num_merge_cand,
                )
                r0, r1 = ref, ref1
                y, u, v = reconstruct_frame_b(
                    jnp.asarray(ctype), jnp.asarray(intra_modes), jnp.asarray(pf),
                    jnp.asarray(mvs), lev_y, lev_cb, lev_cr,
                    jnp.asarray(r0[0]), jnp.asarray(r0[1]), jnp.asarray(r0[2]),
                    jnp.asarray(r1[0]), jnp.asarray(r1[1]), jnp.asarray(r1[2]),
                    sh.qp, width=sps.width, height=sps.height,
                )
                bs_v, bs_h = compute_bs_b(
                    jnp.asarray(ctype),
                    jnp.asarray(np.any(lev_y, axis=(1, 2))),
                    jnp.asarray(pf), jnp.asarray(mvs),
                    cfg.ctbs_w, cfg.ctbs_h,
                )
        if not sh.deblocking_disabled:
            dq_map = (
                jnp.asarray(np.asarray(qp_actual).reshape(cfg.ctbs_h, cfg.ctbs_w))
                if qp_actual is not None
                else None
            )
            y, u, v = deblock_frame(
                y, u, v, sh.qp,
                spacing=1 << sps.min_cb_log2,
                beta_offset=sh.beta_offset_div2,
                tc_offset=sh.tc_offset_div2,
                bs_v=bs_v,
                bs_h=bs_h,
                qp_map=dq_map,
            )
        if sao_state is not None:
            import jax.numpy as jnp2

            sh2 = (cfg.ctbs_h, cfg.ctbs_w)
            t = sao_state.typ.reshape(3, *sh2)
            a = sao_state.aux.reshape(3, *sh2)
            o = sao_state.offs.reshape(3, *sh2, 4)
            y = sao_apply(y, jnp2.asarray(t[0]), jnp2.asarray(a[0]), jnp2.asarray(o[0]), ctb=cfg.ctb_size)
            u = sao_apply(u, jnp2.asarray(t[1]), jnp2.asarray(a[1]), jnp2.asarray(o[1]), ctb=cfg.ctb_size // 2)
            v = sao_apply(v, jnp2.asarray(t[2]), jnp2.asarray(a[2]), jnp2.asarray(o[2]), ctb=cfg.ctb_size // 2)
        out = (np.asarray(y), np.asarray(u), np.asarray(v))
        self._ref = out
        # retain this picture's motion for TMVP from pictures that follow,
        # in the same 4x4-grid format the generic tier publishes (a
        # fallback mid-chain must not lose collocated motion).  Fast-tier
        # B pictures publish zeros: own RA streams never enable TMVP, and
        # alien B streams route to the generic tier.
        if not hasattr(self, "_motion"):
            self._motion = {}
        rep4 = lambda a: np.repeat(np.repeat(a, 4, 0), 4, 1)
        if sh.slice_type == 1:
            interg = (np.asarray(ctype, np.int32).reshape(
                cfg.ctbs_h, cfg.ctbs_w) != 0).astype(np.int32)
            mvg = np.asarray(mvs, np.int32).reshape(cfg.ctbs_h, cfg.ctbs_w, 2)
            self._motion[sh.poc] = (
                rep4(interg),
                np.repeat(np.repeat(mvg, 4, 0), 4, 1),
                rep4(interg * ref0_poc + (1 - interg) * 0))
        else:
            z = np.zeros((cfg.ctbs_h * 16 // 4, cfg.ctbs_w * 16 // 4), np.int32)
            self._motion[sh.poc] = (z, np.zeros(z.shape + (2,), np.int32), z)
        poc = sh.poc
        self._dpb[poc] = out
        if len(self._dpb) > 8:
            for k in sorted(self._dpb)[: len(self._dpb) - 8]:
                del self._dpb[k]
        return (self._period, poc), out


class _FrameScheduler:
    """Frame-parallel decode scheduler (openHEVC frame-threads analogue).

    The caller feeds slice NALs in stream order; pictures are grouped by
    first_slice_segment_in_pic_flag, their headers/POCs parsed on the
    caller thread (sequential state), and generic-tier non-IDR pictures
    execute on a thread pool once every POC in their RPS is decoded (the
    C recon releases the GIL, so pictures genuinely overlap).  Everything
    else — IDR (DPB clear), long-term refs, fast/multislice tiers, and
    parameter-set changes (via flush()) — runs inline behind a barrier,
    preserving the sequential decoder's exact behavior."""

    def __init__(self, decoder):
        import os as _os

        self.dec = decoder
        n = int(_os.environ.get("KVZ_TPU_DECODE_THREADS", "0") or 0)
        if n <= 0:
            n = min(4, _os.cpu_count() or 1)
        self.workers = n
        self.pool = None
        self.results = []
        self.waiting = []  # (deps, nals, headers)
        self.running = []  # (future, poc)
        self.done_pocs = set(decoder._dpb.keys())
        self.pending = []  # NALs of the picture being collected

    def add_nal(self, nal):
        if nal.rbsp[0] & 0x80 and self.pending:
            self._group(self.pending)
            self.pending = []
        self.pending.append(nal)

    def _group(self, nals):
        dec = self.dec
        headers = dec._analyze_picture(nals)
        sh0 = headers[0]
        deps = dec._ref_poc_set(sh0) if sh0.slice_type in (0, 1, 2) else None
        parallel = (
            self.workers > 1
            and deps is not None
            and not is_idr(nals[0].nal_type)
            and dec._is_generic_tier(nals, headers)
        )
        if not parallel:
            self.flush()
            if is_idr(nals[0].nal_type):
                # the IDR clears the DPB: earlier POC numbers no longer
                # satisfy dependencies (intra_period streams reuse POCs)
                self.done_pocs = set()
            self.results.append(dec._decode_picture_group(nals, headers))
            self.done_pocs.add(sh0.poc)
            return
        self.waiting.append((deps, nals, headers))
        self._pump()

    def _pump(self, block=False):
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
        from concurrent.futures import wait as _fwait

        if block and self.running:
            _fwait([f for f, _ in self.running], return_when=FIRST_COMPLETED)
        still = []
        for fut, poc in self.running:
            if fut.done():
                self.results.append(fut.result())
                self.done_pocs.add(poc)
            else:
                still.append((fut, poc))
        self.running = still
        still_w = []
        for deps, nals, headers in self.waiting:
            if deps <= self.done_pocs:
                if self.pool is None:
                    self.pool = ThreadPoolExecutor(self.workers)
                fut = self.pool.submit(self.dec._decode_picture_group,
                                       nals, headers)
                self.running.append((fut, headers[0].poc))
            else:
                still_w.append((deps, nals, headers))
        self.waiting = still_w

    def flush(self):
        while self.waiting or self.running:
            made_progress = bool(self.running)
            self._pump(block=True)
            if not self.running and self.waiting and not made_progress:
                # unsatisfiable dependency (missing reference): run inline
                # so the generic tier raises its precise error
                deps, nals, headers = self.waiting.pop(0)
                self.results.append(
                    self.dec._decode_picture_group(nals, headers))
                self.done_pocs.add(headers[0].poc)

    def finish(self):
        if self.pending:
            self._group(self.pending)
            self.pending = []
        self.flush()
        if self.pool is not None:
            self.pool.shutdown(wait=False)
        return self.results
