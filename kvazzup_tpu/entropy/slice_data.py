"""Slice-data coding for the intra tool-set: CU syntax + end-of-slice.

Encodes/decodes the per-CTU arrays produced/consumed by the device scans
(coding_quadtree -> coding_unit -> transform_tree of 7.3.8, specialized to
CU == CTB with one luma TU).  The residual layer lives in syntax.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.params import StreamConfig
from .cabac import CabacDecoder, CabacEncoder
from .cabac_tables import OFFSETS
from .syntax import decode_residual, encode_residual


def mpm_candidates(cand_a: int, cand_b: int) -> list[int]:
    """8.4.2 MPM list derivation."""
    if cand_a == cand_b:
        if cand_a < 2:
            return [0, 1, 26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 2 + 1) % 32)]
    third = 0 if (cand_a != 0 and cand_b != 0) else (1 if (cand_a != 1 and cand_b != 1) else 26)
    return [cand_a, cand_b, third]


def _encode_luma_mode(enc: CabacEncoder, mode: int, cand_a: int, cand_b: int) -> None:
    mpm = mpm_candidates(cand_a, cand_b)
    if mode in mpm:
        enc.encode_bin(OFFSETS["prev_intra_luma_pred_flag"], 1)
        idx = mpm.index(mode)
        enc.encode_bypass(1 if idx else 0)
        if idx:
            enc.encode_bypass(idx - 1)
    else:
        enc.encode_bin(OFFSETS["prev_intra_luma_pred_flag"], 0)
        rem = mode
        for c in sorted(mpm, reverse=True):
            if mode > c:
                rem -= 1
        enc.encode_bypass_bits(rem, 5)


def _decode_luma_mode(dec: CabacDecoder, cand_a: int, cand_b: int) -> int:
    mpm = mpm_candidates(cand_a, cand_b)
    if dec.decode_bin(OFFSETS["prev_intra_luma_pred_flag"]):
        idx = 0
        if dec.decode_bypass():
            idx = 1 + dec.decode_bypass()
        return mpm[idx]
    rem = dec.decode_bypass_bits(5)
    for c in sorted(mpm):
        if rem >= c:
            rem += 1
    return rem


def encode_slice_data_intra(
    cfg: StreamConfig,
    modes: np.ndarray,
    lev_y: np.ndarray,
    lev_cb: np.ndarray,
    lev_cr: np.ndarray,
    use_native: bool = True,
) -> bytes:
    """CTU raster scan -> CABAC slice payload (v1: CU == CTB == 16).

    Dispatches to the native C codec (kvazzup_tpu/native) when available;
    this Python path is the behavioral reference (tests assert equality).
    """
    if use_native:
        from ..native import encode_slice_data_intra_native

        out = encode_slice_data_intra_native(cfg, modes, lev_y, lev_cb, lev_cr)
        if out is not None:
            return out
    enc = CabacEncoder(init_type=0, slice_qp=cfg.qp)
    ctbs_w, ctbs_h = cfg.ctbs_w, cfg.ctbs_h
    nctu = ctbs_w * ctbs_h
    at_min_cb = cfg.ctb_log2 == cfg.min_cb_log2
    for i in range(nctu):
        c = i % ctbs_w
        mode = int(modes[i])
        # CTB == min CB: no split_cu_flag; intra -> part_mode coded
        if at_min_cb:
            enc.encode_bin(OFFSETS["part_mode"], 1)  # PART_2Nx2N
        cand_a = int(modes[i - 1]) if c > 0 else 1
        cand_b = 1  # above CU is in another CTB row
        _encode_luma_mode(enc, mode, cand_a, cand_b)
        enc.encode_bin(OFFSETS["intra_chroma_pred_mode"], 0)  # derived (DM)

        cbf_cb = 1 if np.any(lev_cb[i]) else 0
        cbf_cr = 1 if np.any(lev_cr[i]) else 0
        cbf_y = 1 if np.any(lev_y[i]) else 0
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cb)
        enc.encode_bin(OFFSETS["cbf_chroma"], cbf_cr)
        enc.encode_bin(OFFSETS["cbf_luma"] + 1, cbf_y)  # trafoDepth == 0
        if cbf_y:
            encode_residual(enc, lev_y[i], cfg.ctb_log2, 0)
        if cbf_cb:
            encode_residual(enc, lev_cb[i], cfg.ctb_log2 - 1, 1)
        if cbf_cr:
            encode_residual(enc, lev_cr[i], cfg.ctb_log2 - 1, 2)
        enc.encode_terminate(1 if i == nctu - 1 else 0)
    return enc.data()


def decode_slice_data_intra(cfg: StreamConfig, payload: bytes, slice_qp: int, use_native: bool = True):
    """Inverse of encode_slice_data_intra; returns per-CTU arrays."""
    if use_native:
        from ..native import decode_slice_data_intra_native

        out = decode_slice_data_intra_native(cfg, payload, slice_qp)
        if out is not None:
            return out
    dec = CabacDecoder(payload, init_type=0, slice_qp=slice_qp)
    ctbs_w, ctbs_h = cfg.ctbs_w, cfg.ctbs_h
    nctu = ctbs_w * ctbs_h
    n = cfg.ctb_size
    at_min_cb = cfg.ctb_log2 == cfg.min_cb_log2
    modes = np.zeros(nctu, dtype=np.int32)
    lev_y = np.zeros((nctu, n, n), dtype=np.int32)
    lev_cb = np.zeros((nctu, n // 2, n // 2), dtype=np.int32)
    lev_cr = np.zeros((nctu, n // 2, n // 2), dtype=np.int32)
    for i in range(nctu):
        c = i % ctbs_w
        if at_min_cb:
            part = dec.decode_bin(OFFSETS["part_mode"])
            if part != 1:
                raise NotImplementedError("NxN intra partition not supported yet")
        cand_a = int(modes[i - 1]) if c > 0 else 1
        modes[i] = _decode_luma_mode(dec, cand_a, 1)
        chroma_bin = dec.decode_bin(OFFSETS["intra_chroma_pred_mode"])
        if chroma_bin != 0:
            raise NotImplementedError("non-DM chroma mode not supported yet")
        cbf_cb = dec.decode_bin(OFFSETS["cbf_chroma"])
        cbf_cr = dec.decode_bin(OFFSETS["cbf_chroma"])
        cbf_y = dec.decode_bin(OFFSETS["cbf_luma"] + 1)
        if cbf_y:
            lev_y[i] = decode_residual(dec, cfg.ctb_log2, 0)
        if cbf_cb:
            lev_cb[i] = decode_residual(dec, cfg.ctb_log2 - 1, 1)
        if cbf_cr:
            lev_cr[i] = decode_residual(dec, cfg.ctb_log2 - 1, 2)
        end = dec.decode_terminate()
        expected = 1 if i == nctu - 1 else 0
        if end != expected:
            raise ValueError(f"end_of_slice mismatch at CTU {i}: {end} != {expected}")
    return modes, lev_y, lev_cb, lev_cr
