"""Encoder top level: frames in, Annex-B byte stream out.

The idiomatic successor of the reference's KvazaarFilter
(/root/reference/src/media/processing/kvazaarfilter.cpp:331-495: feed
pictures, drain chunked NALs): device scans encode, host muxes the
bitstream.  GOP structure: IDR every `intra_period` frames, low-delay P
chain against the previous (deblocked) picture in between — the
kvazaarfilter low-delay configuration (GOP lp-*, kvazaarfilter.cpp:233)
with one active reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.nal import NalType, NalUnit, compose_nal
from ..core.params import (
    SliceHeader,
    StreamConfig,
    compose_pps,
    compose_slice_header,
    compose_sps,
    compose_vps,
)
from ..entropy.slice_data import (
    encode_slice_data_intra,
    encode_slice_data_intra_qp,
    encode_slice_data_intra_wpp,
    encode_slice_data_p,
    encode_slice_data_p_wpp,
)
from ..ops.deblock import compute_bs, deblock_frame
from .frame_inter import encode_frame_p
from .frame_intra import encode_frame_intra


class Encoder:
    """HEVC encoder: all-intra or low-delay P (see frame_intra/frame_inter)."""

    def __init__(self, cfg: StreamConfig, intra_period: int = 1) -> None:
        if cfg.width % cfg.ctb_size or cfg.height % cfg.ctb_size:
            raise ValueError("v1 requires CTB-aligned dimensions (pad input)")
        self.cfg = cfg
        self.intra_period = max(1, intra_period)
        self._frame_count = 0
        self._poc = 0
        self._ref = None  # DPB: one (y, u, v) uint8 tuple (post-deblock)

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(
            compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
        )

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray, qp: int | None = None,
                     qp_map: np.ndarray | None = None):
        """Returns (annexb_bytes, recon_yuv_tuple).  qp overrides cfg.qp
        (rate control hook); qp_map is a per-CTU (ctbs_h, ctbs_w) QP grid
        (requires cfg.cu_qp_delta — the ROI/RoiMap hook, applied on intra
        frames)."""
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        if qp_map is not None and not cfg.cu_qp_delta:
            raise ValueError("qp_map requires cfg.cu_qp_delta")
        is_idr = self._frame_count % self.intra_period == 0 or self._ref is None

        entry_offsets = None
        qp_actual = None
        if is_idr:
            flat_map = None
            if qp_map is not None:
                flat_map = np.clip(np.asarray(qp_map, np.int32).reshape(-1), 0, 51)
            dev_qp = jnp.asarray(flat_map) if flat_map is not None else qp
            out = encode_frame_intra(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                width=cfg.width, height=cfg.height,
            )
            arrays = (
                np.asarray(out["mode"]),
                np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]),
                np.asarray(out["lev_cr"]),
            )
            if cfg.wpp and flat_map is not None:
                payload, entry_offsets, qp_actual = encode_slice_data_intra_wpp(
                    cfg, *arrays, qp_map=flat_map
                )
            elif cfg.wpp:
                payload, entry_offsets = encode_slice_data_intra_wpp(cfg, *arrays)
            elif flat_map is not None:
                payload, qp_actual = encode_slice_data_intra_qp(cfg, *arrays, qp_map=flat_map)
            else:
                payload = encode_slice_data_intra(cfg, *arrays)
            sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL)
            self._poc = 0
            bs_v = bs_h = None
        else:
            ry, ru, rv = self._ref
            out = encode_frame_p(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv), qp,
                width=cfg.width, height=cfg.height,
            )
            ctype = np.asarray(out["ctype"])
            lev_y = np.asarray(out["lev_y"])
            p_arrays = (
                ctype,
                np.asarray(out["intra_mode"]),
                np.asarray(out["mv"]),
                np.asarray(out["mvp_flag"]),
                np.asarray(out["mvd"]),
                lev_y,
                np.asarray(out["lev_cb"]),
                np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_p_wpp(cfg, *p_arrays, slice_qp=qp)
            else:
                payload = encode_slice_data_p(cfg, *p_arrays, slice_qp=qp)
            self._poc += 1
            sh = SliceHeader(
                slice_type=1,
                qp=qp,
                nal_type=NalType.TRAIL_R,
                pic_order_cnt_lsb=self._poc % (1 << cfg.log2_max_poc_lsb),
                num_negative_pics=1,
                delta_pocs=(-1,),
            )
            bs_v, bs_h = compute_bs(
                jnp.asarray(ctype),
                jnp.asarray(np.any(lev_y, axis=(1, 2))),
                jnp.asarray(out["mv"]),
                cfg.ctbs_w,
                cfg.ctbs_h,
            )

        w = compose_slice_header(cfg, sh, entry_offsets)
        w.write_bytes(payload)
        stream = b""
        if self._frame_count == 0:
            stream += self.headers()
        stream += compose_nal(NalUnit(sh.nal_type, w.data()))
        self._frame_count += 1

        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if cfg.deblocking_enabled:
            dq_map = (
                jnp.asarray(qp_actual.reshape(cfg.ctbs_h, cfg.ctbs_w))
                if qp_actual is not None
                else None
            )
            ry, ru, rv = deblock_frame(
                ry, ru, rv, qp, spacing=cfg.ctb_size, bs_v=bs_v, bs_h=bs_h, qp_map=dq_map
            )
        recon = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
        self._ref = recon
        return stream, recon
