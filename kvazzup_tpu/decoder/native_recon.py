"""Native reconstruction front-end for the generic decode tier.

Drives native/slice_cabac.c recon_generic_slice_c: the C side runs the
CABAC parse AND the full reconstruction (intra prediction, dequant,
inverse transform, MC, motion derivation, PCM, SAO parameter decode)
directly into the Python decoder's numpy buffers — gd.y/u/v, the 4x4
maps, edge marks, and SaoState arrays — so decoder/top.py's downstream
stages (JAX deblock + SAO, motion publication) run unchanged.  This is
the openHEVC-replacement hot path (SURVEY §2.6); the replay path
(native_parse.py) and the pure-Python tier remain the fallbacks, all
three byte-identical (tests/test_native_generic_parse.py).

Envelope: 8-bit, flat scaling lists (explicit lists fall back).
"""

from __future__ import annotations

import os

import numpy as np

RECON_OK = 0
RECON_FALLBACK = 0


def _wpp_row_threads() -> int:
    """Worker count for the C row-parallel WPP wavefront; 1 disables it
    (sequential per-row calls).  KVZ_TPU_WPP_ROW_THREADS overrides."""
    raw = os.environ.get("KVZ_TPU_WPP_ROW_THREADS")
    if raw is not None:
        try:
            return max(1, int(raw))
        except ValueError:
            raise ValueError(
                f"KVZ_TPU_WPP_ROW_THREADS must be an int, got {raw!r}")
    return min(4, os.cpu_count() or 1)


def _fallback():
    global RECON_FALLBACK
    RECON_FALLBACK += 1
    return False


def _reset(gd, sao_state, slice_qp):
    """Restore gd/sao buffers to their constructor state after a partial
    native run, so the Python fallback starts clean (edge marks and maps
    are add-only on the Python side and must not carry stale entries)."""
    gd.y[:] = 0
    gd.u[:] = 0
    gd.v[:] = 0
    gd.mode4[:] = 1
    gd.depth4[:] = 0
    gd.qp4[:] = slice_qp
    gd.edge_v[:] = False
    gd.edge_h[:] = False
    for name in ("inter4", "mv4", "ref4", "refpoc4", "cbf4", "skip4",
                 "pf4", "mv4l", "refpoc4l"):
        a = getattr(gd, name, None)
        if a is not None:
            a[:] = 0
    if sao_state is not None:
        sao_state.typ[:] = 0
        sao_state.aux[:] = 0
        sao_state.offs[:] = 0


def _ref_arrays(refs):
    """(ptr int64 array, poc int32 array, keepalive list) for a ref list."""
    ptrs = np.zeros(max(1, 3 * len(refs)), np.int64)
    pocs = np.zeros(max(1, len(refs)), np.int32)
    keep = []
    for i, (planes, poc) in enumerate(refs):
        for p in range(3):
            pl = np.ascontiguousarray(planes[p], np.int32)
            keep.append(pl)
            ptrs[3 * i + p] = pl.ctypes.data
        pocs[i] = poc
    return ptrs, pocs, keep


def _weight_array(gd, nref0, nref1):
    """Flatten sh.weights into the C layout, or None."""
    w = gd.weights
    if w is None:
        return None
    out = [w["luma_denom"], w["chroma_denom"]]
    for key_l, key_c, n in (("luma", "chroma", nref0), ("luma1", "chroma1", nref1)):
        if n == 0:
            continue
        luma = w.get(key_l)
        chroma = w.get(key_c)
        if luma is None:
            return None  # malformed for this slice type: fall back
        for r in range(n):
            lw, lo = luma[r]
            (cbw, cbo), (crw, cro) = chroma[r]
            out.extend([lw, lo, cbw, cbo, crw, cro])
    return np.asarray(out, np.int32)


def try_recon_picture(gd, sps, pps, slices, starts, ends, sids, init_type,
                      sao_state):
    """Reconstruct all slice segments of a picture natively.

    Returns True when the picture is fully reconstructed in gd's buffers
    (callers skip the Python CTU loop); False to fall back.  On ANY
    False return the gd/sao buffers are restored to constructor state —
    the canvases are allocated uninitialized (generic_intra.__init__),
    so the Python tier must always start from a reset."""
    ok = _try_recon_picture(gd, sps, pps, slices, starts, ends, sids,
                            init_type, sao_state)
    if not ok:
        _reset(gd, sao_state, slices[0][1].qp)
    return ok


def _try_recon_picture(gd, sps, pps, slices, starts, ends, sids, init_type,
                       sao_state):
    global RECON_OK
    from ..native import (GenericParseState, get_lib, recon_generic_segment,
                          recon_generic_wpp)

    if get_lib() is None:
        return _fallback()
    if gd.bd != 8 or gd.scaling is not None:
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
    cfgv = np.asarray([
        gd.w, gd.h, gd.ctb_log2, gd.min_cb_log2, gd.min_tb_log2,
        gd.max_tb_log2, gd.max_td_intra, getattr(sps, "max_td_inter", 0),
        1 if getattr(sps, "amp_enabled", False) else 0,
        1 if gd.sdh else 0, 1 if gd.tskip else 0,
        1 if gd.cu_qp_delta else 0, gd.qg_log2,
        pcm_min, pcm_max, pcm_bd, pcm_bd_c,
        slice_type, nref0, nref1, max_merge, mvd_l1_zero,
        sao_luma, sao_chroma,
    ], np.int32)

    # recon buffers: the decoder's own arrays, written in place by C
    inter = slice_type in (0, 1)
    is_b = slice_type == 0
    bufs = {
        "y": gd.y, "u": gd.u, "v": gd.v, "qp4": gd.qp4,
        "edge_v": gd.edge_v, "edge_h": gd.edge_h,
        "inter4": gd.inter4 if inter else None,
        "mv4": gd.mv4 if inter else None,
        "ref4": gd.ref4 if inter else None,
        "refpoc4": gd.refpoc4 if inter else None,
        "cbf4": gd.cbf4 if inter else None,
        "pf4": gd.pf4 if is_b else None,
        "mv4l": gd.mv4l if is_b else None,
        "refpoc4l": gd.refpoc4l if is_b else None,
        "sao_typ": sao_state.typ if sao_state is not None else None,
        "sao_aux": sao_state.aux if sao_state is not None else None,
        "sao_offs": sao_state.offs if sao_state is not None else None,
    }
    for k, a in bufs.items():
        if a is not None and not a.flags.c_contiguous:
            return _fallback()

    keep = []
    if inter:
        r0p, r0poc, k0 = _ref_arrays(gd.refs)
        keep += k0
        if is_b:
            r1p, r1poc, k1 = _ref_arrays(gd.refs1)
            keep += k1
        else:
            r1p = r1poc = None
        wt = _weight_array(gd, nref0, nref1)
        if gd.weights is not None and wt is None:
            return _fallback()
    else:
        r0p = r0poc = r1p = r1poc = wt = None
    refs = (r0p, r0poc, r1p, r1poc)

    col_ptrs = None
    has_col, col_poc = 0, 0
    col = getattr(gd, "col", None)
    if inter and col is not None:
        c_inter4, c_mv4, c_refpoc4, col_poc = col
        c_inter4 = np.ascontiguousarray(c_inter4, np.int32)
        c_mv4 = np.ascontiguousarray(c_mv4, np.int32)
        c_refpoc4 = np.ascontiguousarray(c_refpoc4, np.int32)
        keep += [c_inter4, c_mv4, c_refpoc4]
        col_ptrs = np.asarray(
            [c_inter4.ctypes.data, c_mv4.ctypes.data, c_refpoc4.ctypes.data],
            np.int64)
        has_col = 1

    rcfg = np.asarray([
        1 if gd.strong_smoothing else 0, gd.cb_off, gd.cr_off,
        getattr(gd, "cur_poc", 0), has_col, col_poc,
        0 if wt is None else 1,
    ], np.int32)

    state = GenericParseState(gd.w, gd.h)
    cw = gd.cw
    wpp = bool(getattr(pps, "entropy_sync", False))
    row_threads = _wpp_row_threads()
    for k, (nal_k, sh_k) in enumerate(slices):
        payload = nal_k.rbsp[sh_k.data_offset_bits // 8 :]
        st, en = starts[k], ends[k]
        if not wpp:
            ok = recon_generic_segment(
                cfgv, payload, init_type, sh_k.qp,
                bool(sh_k.dependent and k), st, en,
                gd.slice_of_ctu, sids[k], state, rcfg, bufs, refs,
                col_ptrs, wt)
            if not ok:
                return _fallback()
            continue
        # WPP: per-row substreams with context inheritance (9.3.1/9.3.2.3)
        if sh_k.dependent or st % cw or (en % cw and en != gd.cw * gd.ch):
            return _fallback()
        bounds = [0]
        for off in sh_k.entry_points or []:
            bounds.append(bounds[-1] + off)
        bounds.append(len(payload))
        rows = range(st // cw, -(-en // cw))
        if len(bounds) - 1 != len(rows):
            return _fallback()
        if row_threads > 1 and len(rows) > 1:
            # Row-parallel wavefront in C (skew-2 sync + 9.3.2.3 context
            # inheritance); any native error resets the shared buffers
            # and falls back to the Python tier like the sequential path.
            ok = recon_generic_wpp(
                cfgv, payload, bounds, row_threads, init_type, sh_k.qp,
                st, en, gd.slice_of_ctu, sids[k], state, rcfg, bufs, refs,
                col_ptrs, wt)
            if ok:
                continue
            return _fallback()
        snap = np.zeros_like(state.ctx)
        for ri, row in enumerate(rows):
            data = payload[bounds[ri] : bounds[ri + 1]]
            row_st = row * cw
            row_en = min(row_st + cw, en)
            if ri > 0 and cw > 1:
                state.ctx[:] = snap
            ok = recon_generic_segment(
                cfgv, data, init_type, sh_k.qp,
                bool(ri > 0 and cw > 1), row_st, row_en,
                gd.slice_of_ctu, sids[k], state, rcfg, bufs, refs,
                col_ptrs, wt,
                slice_last=en - 1, subset_term=True,
                snap_after=row_st + 1 if cw > 1 else -1, ctx_snap=snap)
            if not ok:
                return _fallback()
    del keep
    RECON_OK += 1
    return True
