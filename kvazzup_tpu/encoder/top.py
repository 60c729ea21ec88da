"""Encoder top level: frames in, Annex-B byte stream out.

The idiomatic successor of the reference's KvazaarFilter
(/root/reference/src/media/processing/kvazaarfilter.cpp:331-495: feed
pictures, drain chunked NALs): device scan encodes, host muxes the
bitstream.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.nal import NalType, NalUnit, compose_nal
from ..core.params import SliceHeader, StreamConfig, compose_pps, compose_slice_header, compose_sps, compose_vps
from ..entropy.slice_data import encode_slice_data_intra
from .frame_intra import encode_frame_intra


class Encoder:
    """All-intra HEVC encoder (v1 tool-set; see frame_intra.py)."""

    def __init__(self, cfg: StreamConfig) -> None:
        if cfg.width % cfg.ctb_size or cfg.height % cfg.ctb_size:
            raise ValueError("v1 requires CTB-aligned dimensions (pad input)")
        self.cfg = cfg
        self._frame_count = 0

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(
            compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
        )

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Returns (annexb_bytes, recon_yuv_tuple)."""
        cfg = self.cfg
        out = encode_frame_intra(
            jnp.asarray(y),
            jnp.asarray(u),
            jnp.asarray(v),
            cfg.qp,
            width=cfg.width,
            height=cfg.height,
        )
        modes = np.asarray(out["mode"])
        payload = encode_slice_data_intra(
            cfg,
            modes,
            np.asarray(out["lev_y"]),
            np.asarray(out["lev_cb"]),
            np.asarray(out["lev_cr"]),
        )
        sh = SliceHeader(slice_type=2, qp=cfg.qp, nal_type=NalType.IDR_W_RADL)
        w = compose_slice_header(cfg, sh)
        w.write_bytes(payload)
        nal = NalUnit(NalType.IDR_W_RADL, w.data())
        stream = b""
        if self._frame_count == 0:
            stream += self.headers()
        stream += compose_nal(nal)
        self._frame_count += 1
        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if cfg.deblocking_enabled:
            from ..ops.deblock import deblock_frame

            ry, ru, rv = deblock_frame(ry, ru, rv, cfg.qp, spacing=cfg.ctb_size)
        recon = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
        return stream, recon
