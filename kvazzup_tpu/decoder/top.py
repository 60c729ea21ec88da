"""Decoder top level: Annex-B byte stream in, frames out.

Host side parses NALs/headers and CABAC-decodes slice data to coefficient
arrays; the device scan reconstructs.  Parity target: bit-exact output vs
independent conformant decoders (openHEVC in the reference; libavcodec in
our test oracle — SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.nal import NalType, is_irap, split_annexb
from ..core.params import (
    ParsedPps,
    ParsedSps,
    StreamConfig,
    parse_pps,
    parse_slice_header,
    parse_sps,
)
from ..entropy.slice_data import decode_slice_data_intra
from .frame_intra import reconstruct_frame_intra


class Decoder:
    """HEVC decoder for the tool-set the encoder emits (v1: all-intra)."""

    def __init__(self) -> None:
        self.sps: ParsedSps | None = None
        self.pps: ParsedPps | None = None

    def decode(self, stream: bytes):
        """Decode an Annex-B stream; returns list of (y, u, v) frames."""
        frames = []
        for nal in split_annexb(stream):
            if nal.nal_type == NalType.SPS:
                self.sps = parse_sps(nal.rbsp)
            elif nal.nal_type == NalType.PPS:
                self.pps = parse_pps(nal.rbsp)
            elif nal.nal_type in (NalType.VPS, NalType.AUD, NalType.PREFIX_SEI, NalType.SUFFIX_SEI):
                continue
            elif nal.nal_type <= 31:  # slice of a coded picture
                if self.sps is None or self.pps is None:
                    continue  # parameter sets not yet seen (reference behavior:
                    # openhevcfilter.cpp:116-143 discards until VPS/SPS/PPS)
                frames.append(self._decode_picture(nal))
        return frames

    def _decode_picture(self, nal):
        sps, pps = self.sps, self.pps
        sh = parse_slice_header(nal.rbsp, nal.nal_type, sps, pps)
        if sh.slice_type != 2:
            raise NotImplementedError("inter slices land with the P-frame milestone")
        if sps.ctb_log2 != 4 or sps.min_cb_log2 != 4:
            raise NotImplementedError("decoder v1 supports CTB == min CB == 16")
        cfg = StreamConfig(
            width=sps.width,
            height=sps.height,
            qp=sh.qp,
            ctb_log2=sps.ctb_log2,
            min_cb_log2=sps.min_cb_log2,
        )
        payload = nal.rbsp[sh.data_offset_bits // 8 :]
        modes, lev_y, lev_cb, lev_cr = decode_slice_data_intra(cfg, payload, sh.qp)
        y, u, v = reconstruct_frame_intra(
            modes, lev_y, lev_cb, lev_cr, sh.qp, width=sps.width, height=sps.height
        )
        if not sh.deblocking_disabled:
            from ..ops.deblock import deblock_frame

            y, u, v = deblock_frame(
                y,
                u,
                v,
                sh.qp,
                spacing=1 << sps.min_cb_log2,
                beta_offset=sh.beta_offset_div2,
                tc_offset=sh.tc_offset_div2,
            )
        return np.asarray(y), np.asarray(u), np.asarray(v)
