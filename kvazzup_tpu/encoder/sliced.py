"""Multi-slice frame encoding: independent row-aligned slice segments.

Kvazaar's `slices` option (reference wiring
/root/reference/src/media/processing/kvazaarfilter.cpp:204-215) splits a
picture into independently decodable slices — the packetization unit RTP
loss-resilience wants (one slice ≈ one NAL ≈ one recoverable loss).

TPU shape: each slice is a horizontal strip of CTU rows encoded by the
same wavefront kernel at strip height (the strip's top edge IS the
slice-boundary availability rule, 6.4.1), with its own slice header
(first_slice_segment_in_pic_flag / slice_segment_address, 7.3.6.1) and a
fresh CABAC stream (9.3.1).  Deblocking runs on the assembled picture —
pps_loop_filter_across_slices_enabled_flag is 1 in our PPS.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import jax.numpy as jnp

from ..core.nal import NalType, NalUnit, compose_nal
from ..core.params import SliceHeader, compose_slice_header
from ..entropy.slice_data import encode_slice_data_intra
from ..ops.deblock import deblock_frame
from .frame_intra import encode_frame_intra


def slice_rows(ctbs_h: int, n_slices: int):
    """Row ranges per slice (uniform split, same rule as tile columns)."""
    return [((i * ctbs_h) // n_slices, ((i + 1) * ctbs_h) // n_slices)
            for i in range(n_slices)]


def encode_frame_intra_slices_device(cfg, y, u, v, qp: int, n_slices: int, *,
                                     rdoq: bool = False):
    """Device stage: per-slice strip encodes + assembled loop-filtered recon."""
    n = cfg.ctb_size
    rows = slice_rows(cfg.ctbs_h, n_slices)
    strips = []
    for r0, r1 in rows:
        py0, py1 = r0 * n, r1 * n
        strips.append(encode_frame_intra(
            jnp.asarray(y[py0:py1]), jnp.asarray(u[py0 // 2 : py1 // 2]),
            jnp.asarray(v[py0 // 2 : py1 // 2]), qp,
            width=cfg.width, height=py1 - py0, rdoq=rdoq,
        ))
    ry = jnp.concatenate([s["recon_y"] for s in strips], axis=0)
    ru = jnp.concatenate([s["recon_u"] for s in strips], axis=0)
    rv = jnp.concatenate([s["recon_v"] for s in strips], axis=0)
    if cfg.deblocking_enabled:
        ry, ru, rv = deblock_frame(ry, ru, rv, qp, spacing=cfg.ctb_size)
    return {"strips": strips, "rows": rows, "recon": (ry, ru, rv)}


def entropy_frame_intra_slices(cfg, dev, qp: int) -> bytes:
    """Host stage: one IDR NAL per slice (first carries first_slice flag)."""
    n = cfg.ctb_size
    cw = cfg.ctbs_w
    nals = []
    for si, ((r0, r1), out) in enumerate(zip(dev["rows"], dev["strips"])):
        strip_cfg = replace(cfg, height=(r1 - r0) * n)
        payload = encode_slice_data_intra(
            strip_cfg, np.asarray(out["mode"]), np.asarray(out["lev_y"]),
            np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]), slice_qp=qp,
        )
        sh = SliceHeader(
            slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
            first_slice=si == 0, segment_address=r0 * cw,
        )
        w = compose_slice_header(cfg, sh)
        w.write_bytes(payload)
        nals.append(compose_nal(NalUnit(sh.nal_type, w.data())))
    return b"".join(nals)


def encode_frame_intra_slices(cfg, y, u, v, qp: int, n_slices: int, *,
                              rdoq: bool = False, include_headers: bytes = b""):
    """Encode one intra picture as `n_slices` independent slices.

    Returns (annexb_bytes, (recon_y, recon_u, recon_v) device arrays)."""
    dev = encode_frame_intra_slices_device(cfg, y, u, v, qp, n_slices, rdoq=rdoq)
    return include_headers + entropy_frame_intra_slices(cfg, dev, qp), dev["recon"]


def encode_frame_p_slices_device(cfg, y, u, v, ref, qp: int, n_slices: int, *,
                                 rdoq: bool = False):
    """Device stage for a multi-slice P picture.

    Each CTU-row strip is encoded by the dense P engine with the slice
    boundary as its top/bottom prediction edge (6.4.1: intra neighbors and
    merge/AMVP candidates stop at the slice), while MOTION COMPENSATION
    reads the full reference picture: the strip's reference planes are
    sliced out of the picture-level padded reference (REF_PAD rows of true
    vertical context, ref_vpad), so cross-slice MVs reconstruct bit-exactly
    (kvazaar slices behave the same — only in-picture prediction is cut).
    Deblocking runs on the assembled picture (loop filter crosses slice
    boundaries; pps flag is 1)."""
    from ..ops.deblock import compute_bs
    from .frame_inter import REF_PAD, encode_frame_p_fast

    n = cfg.ctb_size
    rows = slice_rows(cfg.ctbs_h, n_slices)
    ry0, ru0, rv0 = (jnp.asarray(p) for p in ref)
    refp_y = jnp.pad(ry0, ((REF_PAD, REF_PAD), (0, 0)), mode="edge")
    refp_u = jnp.pad(ru0, ((REF_PAD // 2, REF_PAD // 2), (0, 0)), mode="edge")
    refp_v = jnp.pad(rv0, ((REF_PAD // 2, REF_PAD // 2), (0, 0)), mode="edge")
    strips = []
    for r0, r1 in rows:
        py0, py1 = r0 * n, r1 * n
        strips.append(encode_frame_p_fast(
            jnp.asarray(y[py0:py1]), jnp.asarray(u[py0 // 2 : py1 // 2]),
            jnp.asarray(v[py0 // 2 : py1 // 2]),
            refp_y[py0 : py1 + 2 * REF_PAD],
            refp_u[py0 // 2 : py1 // 2 + REF_PAD],
            refp_v[py0 // 2 : py1 // 2 + REF_PAD],
            qp, width=cfg.width, height=py1 - py0, rdoq=rdoq,
            merge_cand=cfg.merge_cand, ref_vpad=True,
        ))
    ry = jnp.concatenate([s["recon_y"] for s in strips], axis=0)
    ru = jnp.concatenate([s["recon_u"] for s in strips], axis=0)
    rv = jnp.concatenate([s["recon_v"] for s in strips], axis=0)
    cat = lambda k: jnp.concatenate([s[k] for s in strips], axis=0)
    ctype, mv, lev_y = cat("ctype"), cat("mv"), cat("lev_y")
    if cfg.deblocking_enabled:
        bs_v, bs_h = compute_bs(ctype, jnp.any(lev_y != 0, axis=(1, 2)), mv,
                                cfg.ctbs_w, cfg.ctbs_h)
        ry, ru, rv = deblock_frame(ry, ru, rv, qp, spacing=cfg.ctb_size,
                                   bs_v=bs_v, bs_h=bs_h)
    return {"strips": strips, "rows": rows, "recon": (ry, ru, rv)}


def entropy_frame_p_slices(cfg, dev, qp: int, poc: int) -> bytes:
    """Host stage: one TRAIL_R NAL per P slice."""
    from ..entropy.slice_data import encode_slice_data_p

    n = cfg.ctb_size
    cw = cfg.ctbs_w
    nals = []
    for si, ((r0, r1), out) in enumerate(zip(dev["rows"], dev["strips"])):
        strip_cfg = replace(cfg, height=(r1 - r0) * n)
        merge_kw = {}
        if cfg.merge_cand > 1:
            merge_kw = dict(merge_idxs=np.asarray(out["merge_idx"]),
                            merge_k=cfg.merge_cand)
        payload = encode_slice_data_p(
            strip_cfg, np.asarray(out["ctype"]),
            np.asarray(out["intra_mode"]), np.asarray(out["mv"]),
            np.asarray(out["mvp_flag"]), np.asarray(out["mvd"]),
            np.asarray(out["lev_y"]), np.asarray(out["lev_cb"]),
            np.asarray(out["lev_cr"]), slice_qp=qp, **merge_kw,
        )
        sh = SliceHeader(
            slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
            pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
            num_negative_pics=1, delta_pocs=(-1,),
            max_num_merge_cand=cfg.merge_cand,
            first_slice=si == 0, segment_address=r0 * cw,
        )
        w = compose_slice_header(cfg, sh)
        w.write_bytes(payload)
        nals.append(compose_nal(NalUnit(sh.nal_type, w.data())))
    return b"".join(nals)


def encode_frame_intra_dependent_slices(cfg, y, u, v, qp: int, n_segments: int, *,
                                        rdoq: bool = False):
    """One intra slice split into dependent slice SEGMENTS (7.3.6.1).

    Unlike independent slices, the picture is coded as a single slice
    (full prediction availability, one CABAC context chain): each CTU-row
    range becomes a slice segment NAL whose contexts continue from the
    previous segment (9.3.1).  Returns (annexb_bytes, recon planes).
    """
    from ..entropy.slice_data import encode_slice_data_intra_segments

    out = encode_frame_intra(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qp,
        width=cfg.width, height=cfg.height, rdoq=rdoq,
    )
    cw = cfg.ctbs_w
    ranges = [(r0 * cw, r1 * cw) for r0, r1 in slice_rows(cfg.ctbs_h, n_segments)]
    payloads = encode_slice_data_intra_segments(
        cfg, np.asarray(out["mode"]), np.asarray(out["lev_y"]),
        np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]), qp, ranges,
    )
    nals = []
    for si, ((st, _en), payload) in enumerate(zip(ranges, payloads)):
        sh = SliceHeader(
            slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
            first_slice=si == 0, segment_address=st, dependent=si > 0,
        )
        w = compose_slice_header(cfg, sh)
        w.write_bytes(payload)
        nals.append(compose_nal(NalUnit(sh.nal_type, w.data())))
    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if cfg.deblocking_enabled:
        ry, ru, rv = deblock_frame(ry, ru, rv, qp, spacing=cfg.ctb_size)
    return b"".join(nals), (ry, ru, rv)
