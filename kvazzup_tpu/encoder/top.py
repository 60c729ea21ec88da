"""Encoder top level: frames in, Annex-B byte stream out.

The idiomatic successor of the reference's KvazaarFilter
(/root/reference/src/media/processing/kvazaarfilter.cpp:331-495: feed
pictures, drain chunked NALs): device scans encode, host muxes the
bitstream.  GOP structure: IDR every `intra_period` frames, low-delay P
chain against the previous (in-loop-filtered) picture in between — the
kvazaarfilter low-delay configuration (GOP lp-*, kvazaarfilter.cpp:233)
with one active reference.

Per-frame order: device encode -> deblocking -> SAO decision+apply (both
read the original frame and feed the DPB) -> host entropy (SAO params
precede each CTU's syntax) -> NAL mux.
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
    SaoState,
    derive_qp_actual,
    encode_slice_data_intra,
    encode_slice_data_intra_qp,
    encode_slice_data_intra_wpp,
    encode_slice_data_p,
    encode_slice_data_p_wpp,
)
from ..ops.deblock import compute_bs, deblock_frame
from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma
from .frame_inter import encode_frame_p
from .frame_intra import encode_frame_intra


class Encoder:
    """HEVC encoder: all-intra or low-delay P (see frame_intra/frame_inter)."""

    def __init__(self, cfg: StreamConfig, intra_period: int = 1) -> None:
        if cfg.width % cfg.ctb_size or cfg.height % cfg.ctb_size:
            raise ValueError("v1 requires CTB-aligned dimensions (pad input)")
        if cfg.sao_enabled and not cfg.wpp:
            raise NotImplementedError("SAO currently requires cfg.wpp streams")
        self.cfg = cfg
        self.intra_period = max(1, intra_period)
        self._frame_count = 0
        self._poc = 0
        self._ref = None  # DPB: one (y, u, v) uint8 tuple (post-loop-filter)

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(
            compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
        )

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray, qp: int | None = None,
                     qp_map: np.ndarray | None = None):
        """Returns (annexb_bytes, recon_yuv_tuple).  qp overrides cfg.qp
        (rate control hook); qp_map is a per-CTU (ctbs_h, ctbs_w) QP grid
        (requires cfg.cu_qp_delta — the ROI/RoiMap hook)."""
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        if qp_map is not None and not cfg.cu_qp_delta:
            raise ValueError("qp_map requires cfg.cu_qp_delta")
        flat_map = None
        if qp_map is not None:
            flat_map = np.clip(np.asarray(qp_map, np.int32).reshape(-1), 0, 51)
        dev_qp = jnp.asarray(flat_map) if flat_map is not None else qp
        is_idr = self._frame_count % self.intra_period == 0 or self._ref is None

        # ---- device encode
        if is_idr:
            out = encode_frame_intra(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                width=cfg.width, height=cfg.height,
            )
            bs_v = bs_h = None
        else:
            ry, ru, rv = self._ref
            out = encode_frame_p(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv), dev_qp,
                width=cfg.width, height=cfg.height,
            )
            bs_v, bs_h = compute_bs(
                out["ctype"],
                jnp.any(out["lev_y"] != 0, axis=(1, 2)),
                out["mv"],
                cfg.ctbs_w,
                cfg.ctbs_h,
            )

        # ---- in-loop filters (feed the DPB and the output picture)
        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        sao_state = None
        qp_pre_actual = None
        if flat_map is not None:
            any_cbf = (
                np.any(np.asarray(out["lev_y"]), axis=(1, 2))
                | np.any(np.asarray(out["lev_cb"]), axis=(1, 2))
                | np.any(np.asarray(out["lev_cr"]), axis=(1, 2))
            )
            qp_pre_actual = derive_qp_actual(
                flat_map, any_cbf, cfg.ctbs_w, cfg.ctbs_h, qp, cfg.wpp
            )
        if cfg.deblocking_enabled:
            dq_map = (
                jnp.asarray(qp_pre_actual.reshape(cfg.ctbs_h, cfg.ctbs_w))
                if qp_pre_actual is not None
                else None
            )
            ry, ru, rv = deblock_frame(
                ry, ru, rv, qp, spacing=cfg.ctb_size, bs_v=bs_v, bs_h=bs_h, qp_map=dq_map
            )
        if cfg.sao_enabled:
            lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
            t_l, aux_l, off_l, _ = sao_decide(jnp.asarray(y), ry, lam, ctb=cfg.ctb_size)
            t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                jnp.asarray(u), ru, jnp.asarray(v), rv, lam, ctb=cfg.ctb_size // 2
            )
            sao_state = SaoState(
                cfg.ctbs_w,
                cfg.ctbs_h,
                typ=np.stack([np.asarray(t_l), np.asarray(t_c), np.asarray(t_c)]),
                aux=np.stack([np.asarray(aux_l), np.asarray(aux_cb), np.asarray(aux_cr)]),
                offs=np.stack([np.asarray(off_l), np.asarray(off_cb), np.asarray(off_cr)]),
            )
            ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
            ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
            rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)

        # ---- host entropy
        entry_offsets = None
        qp_actual = None
        if is_idr:
            arrays = (
                np.asarray(out["mode"]),
                np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]),
                np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                res = encode_slice_data_intra_wpp(
                    cfg, *arrays, qp_map=flat_map, sao=sao_state
                )
                if flat_map is not None:
                    payload, entry_offsets, qp_actual = res
                else:
                    payload, entry_offsets = res
            elif flat_map is not None:
                payload, qp_actual = encode_slice_data_intra_qp(cfg, *arrays, qp_map=flat_map)
            else:
                payload = encode_slice_data_intra(cfg, *arrays)
            sh = SliceHeader(
                slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            )
            self._poc = 0
        else:
            p_arrays = (
                np.asarray(out["ctype"]),
                np.asarray(out["intra_mode"]),
                np.asarray(out["mv"]),
                np.asarray(out["mvp_flag"]),
                np.asarray(out["mvd"]),
                np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]),
                np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                res = encode_slice_data_p_wpp(
                    cfg, *p_arrays, slice_qp=qp, qp_map=flat_map, sao=sao_state
                )
                if flat_map is not None:
                    payload, entry_offsets, qp_actual = res
                else:
                    payload, entry_offsets = res
            elif flat_map is not None:
                raise NotImplementedError("P-frame qp_map currently requires cfg.wpp")
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
                sao_luma=cfg.sao_enabled,
                sao_chroma=cfg.sao_enabled,
            )

        w = compose_slice_header(cfg, sh, entry_offsets)
        w.write_bytes(payload)
        stream = b""
        if self._frame_count == 0:
            stream += self.headers()
        stream += compose_nal(NalUnit(sh.nal_type, w.data()))
        self._frame_count += 1

        recon = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
        self._ref = recon
        return stream, recon
