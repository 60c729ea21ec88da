"""Native CABAC parse front-end for the generic decode tier.

Bridges decoder/top._decode_picture_generic to the C parser
(native/slice_cabac.c parse_generic_slice_c): parses every slice segment
of a picture into one concatenated replay record and returns a
ReplayDecoder, or None when the native library is unavailable or the
parse fails (callers fall back to the pure-Python CABAC path — behavior
is identical either way, pinned by tests/test_native_generic_parse.py).
"""

from __future__ import annotations

import numpy as np

from .replay import ReplayDecoder

# engagement counters (tests/test_native_generic_parse.py pins that the
# native path actually runs rather than silently falling back)
PARSE_OK = 0
PARSE_FALLBACK = 0


def _fallback():
    global PARSE_FALLBACK
    PARSE_FALLBACK += 1
    return None


def try_parse_picture(gd, sps, pps, slices, starts, ends, sids, init_type,
                      sao_state):
    """Parse all slice segments of a picture natively (WPP or not)."""
    global PARSE_OK
    from ..native import GenericParseState, parse_generic_segment, get_lib

    if get_lib() is None:
        return _fallback()
    sh0 = slices[0][1]
    pcm_min, pcm_max, pcm_bd, pcm_bd_c = -1, -1, 0, 0
    if gd.pcm_range is not None:
        pcm_min, pcm_max = gd.pcm_range
        pcm_bd, pcm_bd_c = gd.pcm_depth, gd.pcm_depth_c
    slice_type = sh0.slice_type
    nref0 = getattr(gd, "nref", 0)
    nref1 = getattr(gd, "nref1", 0)
    max_merge = getattr(gd, "max_merge", 1)
    mvd_l1_zero = 1 if getattr(gd, "mvd_l1_zero", False) else 0
    sao_luma = 1 if (sao_state is not None and sao_state.luma) else 0
    sao_chroma = 1 if (sao_state is not None and sao_state.chroma) else 0
    cfg_base = [
        gd.w, gd.h, gd.ctb_log2, gd.min_cb_log2, gd.min_tb_log2,
        gd.max_tb_log2, gd.max_td_intra, getattr(sps, "max_td_inter", 0),
        1 if getattr(sps, "amp_enabled", False) else 0,
        1 if gd.sdh else 0, 1 if gd.tskip else 0,
        1 if gd.cu_qp_delta else 0, gd.qg_log2,
        pcm_min, pcm_max, pcm_bd, pcm_bd_c,
        slice_type, nref0, nref1, max_merge, mvd_l1_zero,
        sao_luma, sao_chroma,
    ]
    state = GenericParseState(gd.w, gd.h)
    cfgv = np.asarray(cfg_base, np.int32)
    ctb_pix = (1 << gd.ctb_log2) ** 2
    cw = gd.cw
    wpp = bool(getattr(pps, "entropy_sync", False))
    all_bins, all_levs, all_meta, all_pcm = [], [], [], []
    for k, (nal_k, sh_k) in enumerate(slices):
        payload = nal_k.rbsp[sh_k.data_offset_bits // 8 :]
        st, en = starts[k], ends[k]
        if not wpp:
            npix = max(1, (en - st)) * ctb_pix
            out = parse_generic_segment(
                cfgv, payload, init_type, sh_k.qp,
                bool(sh_k.dependent and k), st, en,
                gd.slice_of_ctu, sids[k], state, npix)
            if out is None:
                return _fallback()
            b, l, m, p = out
            all_bins.append(b)
            all_levs.append(l)
            all_meta.append(m)
            all_pcm.append(p)
            continue
        # WPP (entropy_coding_sync): per-row substreams with context
        # inheritance from after the 2nd CTU of the row above
        # (9.3.1/9.3.2.3; mirrors entropy.slice_data.decode_slice_data_wpp)
        if sh_k.dependent or st % cw or (en % cw and en != gd.cw * gd.ch):
            return _fallback()
        bounds = [0]
        for off in sh_k.entry_points or []:
            bounds.append(bounds[-1] + off)
        bounds.append(len(payload))
        rows = range(st // cw, -(-en // cw))
        if len(bounds) - 1 != len(rows):
            return _fallback()
        snap = np.zeros_like(state.ctx)
        for ri, row in enumerate(rows):
            data = payload[bounds[ri] : bounds[ri + 1]]
            row_st = row * cw
            row_en = min(row_st + cw, en)
            if ri > 0 and cw > 1:
                state.ctx[:] = snap
            out = parse_generic_segment(
                cfgv, data, init_type, sh_k.qp,
                bool(ri > 0 and cw > 1), row_st, row_en,
                gd.slice_of_ctu, sids[k], state,
                max(1, row_en - row_st) * ctb_pix,
                slice_last=en - 1, subset_term=True,
                snap_after=row_st + 1 if cw > 1 else -1, ctx_snap=snap)
            if out is None:
                return _fallback()
            b, l, m, p = out
            all_bins.append(b)
            all_levs.append(l)
            all_meta.append(m)
            all_pcm.append(p)
    PARSE_OK += 1
    return ReplayDecoder(
        np.concatenate(all_bins) if all_bins else np.zeros(0, np.uint8),
        np.concatenate(all_levs) if all_levs else np.zeros(0, np.int32),
        np.concatenate(all_meta) if all_meta else np.zeros(0, np.int32),
        np.concatenate(all_pcm) if all_pcm else np.zeros(0, np.int32))
