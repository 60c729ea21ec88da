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

from ..core.nal import NalType, NalUnit, compose_nal, ebsp_entry_offsets
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


def pad_to_coded(cfg, y, u, v):
    """Edge-replicate a display-size frame up to the coded (CTB-aligned)
    size when cfg carries a conformance window (7.4.3.2.1); coded-size
    input passes through so pre-padded callers keep working."""
    if (cfg.out_height, cfg.out_width) == (cfg.height, cfg.width):
        return y, u, v
    y = np.asarray(y)
    if y.shape == (cfg.height, cfg.width):
        return y, u, v
    py, px = cfg.height - cfg.out_height, cfg.width - cfg.out_width
    return (np.pad(y, ((0, py), (0, px)), mode="edge"),
            np.pad(np.asarray(u), ((0, py // 2), (0, px // 2)), mode="edge"),
            np.pad(np.asarray(v), ((0, py // 2), (0, px // 2)), mode="edge"))


def quad_dq8(cfg, trees, flat_map, qp):
    """Per-8-block QP grid for the quad paths' deblock (bs maps ride the
    8-grid there): the 8.6.1 actual-QP chain expanded per CTB."""
    any_cbf = np.array([Encoder._tree_any_cbf(t) for t in trees], bool)
    qp_actual = derive_qp_actual(
        flat_map, any_cbf, cfg.ctbs_w, cfg.ctbs_h, qp, cfg.wpp)
    r = cfg.ctb_size // 8
    return jnp.asarray(np.kron(
        qp_actual.reshape(cfg.ctbs_h, cfg.ctbs_w),
        np.ones((r, r), np.int32)))


def crop_display(cfg, ry, ru, rv):
    """Crop a coded-size recon to the signalled conformance window, the
    same crop every conforming decoder applies on output."""
    dh, dw = cfg.out_height, cfg.out_width
    if (dh, dw) == (cfg.height, cfg.width):
        return ry, ru, rv
    return ry[:dh, :dw], ru[: dh // 2, : dw // 2], rv[: dh // 2, : dw // 2]


class Encoder:
    """HEVC encoder: all-intra or low-delay P (see frame_intra/frame_inter)."""

    def __init__(self, cfg: StreamConfig, intra_period: int = 1,
                 vps_period: int = 0) -> None:
        """vps_period: re-send VPS/SPS/PPS every N IDR pictures (0 = only
        once) so late joiners can resume decode — the reference's videoVPS
        setting (kvazaarfilter.cpp:221)."""
        if cfg.width % cfg.ctb_size or cfg.height % cfg.ctb_size:
            raise ValueError("v1 requires CTB-aligned dimensions (pad input)")
        if cfg.sao_enabled and not cfg.wpp and cfg.ctb_log2 not in (5, 6) \
                and cfg.tile_cols == 1:
            raise NotImplementedError(
                "SAO requires cfg.wpp at CTB16 (or the CTB32/64/tiles paths)")
        if cfg.tile_cols > 1:
            if intra_period != 1 and not cfg.fast_decision:
                raise NotImplementedError("tiled P requires cfg.fast_decision")
            if cfg.cu_qp_delta and not cfg.fast_decision:
                raise NotImplementedError("tiled cu_qp_delta needs fast_decision")
            if cfg.wpp:
                raise NotImplementedError("tiles exclude wpp for now")
            if cfg.tile_cols > cfg.ctbs_w:
                raise ValueError("more tile columns than CTB columns")
        if cfg.ctb_log2 in (5, 6):
            if cfg.min_cb_log2 != 3 or cfg.max_tb_log2 != 5:
                raise ValueError("CTB32/64 coding uses min_cb_log2=3 / max_tb_log2=5")
            if cfg.max_transform_hierarchy_depth_intra not in (0, 1):
                raise NotImplementedError("quad path supports max_td_intra 0/1")
            if intra_period != 1 and not (
                cfg.fast_decision
                and cfg.max_transform_hierarchy_depth_intra == 0
            ):
                raise NotImplementedError(
                    "CTB32/64 inter needs the device quad path: "
                    "fast_decision, td_intra 0")
            if cfg.cu_qp_delta and not (
                cfg.fast_decision
                and cfg.max_transform_hierarchy_depth_intra == 0
            ):
                raise NotImplementedError(
                    "CTB32/64 cu_qp_delta needs the device quad path: "
                    "fast_decision, td_intra 0")
            if cfg.tile_cols > 1 or cfg.slices > 1:
                quad_tiles_ok = (
                    cfg.ctb_log2 == 6 and cfg.tile_cols > 1
                    and cfg.slices == 1 and not cfg.wpp
                    and not cfg.cu_qp_delta
                    and cfg.fast_decision
                    and cfg.max_transform_hierarchy_depth_intra == 0)
                if not quad_tiles_ok:
                    raise NotImplementedError(
                        "quad tiles need CTB64 + the device path "
                        "(fast_decision, td_intra 0) without "
                        "wpp/qp_map; CTB32 tiles and quad slices "
                        "remain excluded")
        elif cfg.min_cb_log2 == 3:
            if cfg.max_transform_hierarchy_depth_intra:
                raise NotImplementedError("TU trees require the CTB32/64 path")
            if intra_period != 1:
                raise NotImplementedError("CU8 quadtree currently requires all-intra")
            if cfg.sao_enabled or cfg.cu_qp_delta or cfg.tile_cols > 1 \
                    or cfg.slices > 1:
                raise NotImplementedError("CU8 excludes sao/qp_map/tiles/slices for now")
        if cfg.bit_depth != 8:
            # Main10 encode (r5): quad64 all-intra device path (+deblock);
            # ref config surface kvazaarfilter.cpp:351-371 (bit depth is
            # part of the exposed kvazaar parameter set)
            if cfg.bit_depth != 10:
                raise ValueError("bit_depth must be 8 or 10")
            if not (cfg.ctb_log2 == 6 and intra_period == 1
                    and cfg.tile_cols == 1 and cfg.slices == 1
                    and not cfg.wpp and not cfg.cu_qp_delta
                    and not cfg.sao_enabled and cfg.fast_decision
                    and cfg.max_transform_hierarchy_depth_intra == 0):
                raise NotImplementedError(
                    "Main10 encode currently = quad64 all-intra device "
                    "path (deblock ok; no wpp/sao/qp_map/tiles/inter yet)")
        if not 1 <= cfg.merge_cand <= 5:
            raise ValueError("merge_cand must be in 1..5")
        if cfg.merge_cand > 1 and not cfg.fast_decision:
            raise NotImplementedError("merge_cand > 1 needs fast_decision")
        if cfg.temporal_mvp:
            if not cfg.fast_decision:
                raise NotImplementedError("temporal_mvp needs fast_decision")
            if cfg.slices > 1:
                raise NotImplementedError("temporal_mvp excludes slices")
            if cfg.tile_cols > 1 and cfg.ctb_log2 != 6:
                # composed on the quad64 tiles path (r5): the collocated
                # 16-grid store is sliced per tile column (TMVP cells are
                # same-position, so a strip's candidates live entirely in
                # its own column) and MCTS filters candidate SELECTION via
                # the existing xtile masks (ops/me.mv_valid_x)
                raise NotImplementedError(
                    "temporal_mvp with tiles needs the quad64 tiles path")
        if cfg.slices > 1:
            if intra_period != 1 and not cfg.fast_decision:
                raise NotImplementedError("sliced P requires cfg.fast_decision")
            if cfg.wpp or cfg.sao_enabled or cfg.cu_qp_delta or cfg.tile_cols > 1:
                raise NotImplementedError("slices exclude wpp/sao/qp_map/tiles for now")
            if cfg.slices > cfg.ctbs_h:
                raise ValueError("more slices than CTB rows")
        self.cfg = cfg
        self.intra_period = max(1, intra_period)
        self.vps_period = vps_period
        self._idr_count = 0
        self._frame_count = 0
        self._poc = 0
        self._ref = None  # DPB: one (y, u, v) uint8 tuple (post-loop-filter)
        self._col = None  # collocated motion (mv (nctu,2), inter (nctu,)) of
        # the reference picture, for TMVP (zeros after an intra picture)

    # ---- checkpoint/resume (SURVEY §5: encoder state snapshot = DPB +
    # chain counters; CABAC state is per-slice and never crosses frames)
    def snapshot(self) -> dict:
        ref = None
        if self._ref is not None:
            ref = tuple(np.asarray(p) for p in self._ref)
        col = None
        if self._col is not None:
            col = tuple(np.asarray(p) for p in self._col)
        return {"frame_count": self._frame_count, "poc": self._poc,
                "idr_count": self._idr_count, "ref": ref, "col": col}

    def restore(self, snap: dict) -> None:
        self._frame_count = snap["frame_count"]
        self._poc = snap["poc"]
        self._idr_count = snap.get("idr_count", 0)
        self._ref = snap["ref"]
        col = snap.get("col")
        self._col = None if col is None else tuple(jnp.asarray(p) for p in col)

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(
            compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
        )

    @staticmethod
    def _tree_any_cbf(node) -> bool:
        if "split" in node:
            return any(Encoder._tree_any_cbf(s) for s in node["split"])
        return bool(np.any(node["lev_y"]) or np.any(node["lev_cb"])
                    or np.any(node["lev_cr"]))

    def _quad_dq8(self, trees, flat_map, qp):
        return quad_dq8(self.cfg, trees, flat_map, qp)

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray, qp: int | None = None,
                     qp_map: np.ndarray | None = None):
        """Returns (annexb_bytes, recon_yuv_tuple).  qp overrides cfg.qp
        (rate control hook); qp_map is a per-CTU (ctbs_h, ctbs_w) QP grid
        (requires cfg.cu_qp_delta — the ROI/RoiMap hook)."""
        ctx = self.encode_frame_device(y, u, v, qp, qp_map)
        return self.encode_frame_entropy(ctx)

    def encode_frame_device(self, y, u, v, qp=None, qp_map=None):
        """Device stage: wavefront encode + in-loop filters, all JAX — no
        host sync on the fast path (qp_map forces one).  The reference
        picture chain advances here, so the next frame's device stage can
        launch while this frame's CABAC still runs on the host
        (kvazaar's owf/\"frames in flight\" overlap, SURVEY §2.7).
        Returns an opaque ctx for encode_frame_entropy."""
        cfg = self.cfg
        y, u, v = pad_to_coded(cfg, y, u, v)
        qp = cfg.qp if qp is None else qp
        if qp_map is not None and not cfg.cu_qp_delta:
            raise ValueError("qp_map requires cfg.cu_qp_delta")
        flat_map = None
        if qp_map is not None:
            flat_map = np.clip(np.asarray(qp_map, np.int32).reshape(-1), 0, 51)
        dev_qp = jnp.asarray(flat_map) if flat_map is not None else qp
        is_idr = self._frame_count % self.intra_period == 0 or self._ref is None
        if is_idr:
            self._idr_count += 1

        # ---- device encode
        if cfg.ctb_log2 in (5, 6):
            from .cu32 import encode_frame_intra_quad_ref, quad_bs_maps

            if cfg.tile_cols > 1:
                # CTB64 quadtree x tiles: the production toolset's
                # multi-chip axis (VERDICT r3 ask #4).  Per-strip quad64
                # device wavefronts with MCTS MV constraints, then
                # picture-level loop filters across tile boundaries
                # (loop_filter_across_tiles_enabled_flag = 1) — the same
                # structure parallel/tiles_p.py reproduces sharded.
                from ..entropy.slice_data import tile_of_map
                from .tiled import (encode_frame_intra64_tiles,
                                    encode_frame_p64_tiles)

                if is_idr:
                    trees, (ry, ru, rv) = encode_frame_intra64_tiles(
                        cfg, np.asarray(y), np.asarray(u), np.asarray(v),
                        qp, rdoq=cfg.rdoq)
                    if cfg.temporal_mvp:
                        self._col = None  # IDR ref: all-intra collocated
                else:
                    tmvp_kw = {}
                    if cfg.temporal_mvp:
                        n16 = (cfg.width // 16) * (cfg.height // 16)
                        col = self._col
                        if col is None or col[0].shape[0] != n16:
                            col = (jnp.zeros((n16, 2), jnp.int32),
                                   jnp.zeros((n16,), jnp.int32))
                        tmvp_kw = dict(tmvp=True, col_mv=col[0],
                                       col_inter=col[1])
                    trees, (ry, ru, rv) = encode_frame_p64_tiles(
                        cfg, np.asarray(y), np.asarray(u), np.asarray(v),
                        *(np.asarray(p) for p in self._ref), qp,
                        merge_cand=cfg.merge_cand, rdoq=cfg.rdoq, **tmvp_kw)
                    if cfg.temporal_mvp:
                        from .frame_inter32 import quad_p_cell_maps

                        mv4, inter4, _ = quad_p_cell_maps(
                            trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
                        self._col = (
                            jnp.asarray(mv4[::4, ::4].reshape(-1, 2)),
                            jnp.asarray(inter4[::4, ::4].reshape(-1)))
                if cfg.deblocking_enabled:
                    if is_idr:
                        bv, bh = quad_bs_maps(trees, cfg.width, cfg.height,
                                              cfg.ctb_log2)
                        ry, ru, rv = deblock_frame(
                            ry, ru, rv, qp, spacing=8, bs_v=jnp.asarray(bv),
                            bs_h=jnp.asarray(bh), chroma_every=2)
                    else:
                        from .frame_inter32 import (quad_p_bs_maps,
                                                    quad_p_cell_maps)

                        mv4, inter4, cbf4 = quad_p_cell_maps(
                            trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
                        bv, bh = quad_p_bs_maps(
                            trees, mv4, inter4, cbf4, cfg.width, cfg.height,
                            ctb=cfg.ctb_size)
                        ry, ru, rv = deblock_frame(
                            ry, ru, rv, qp, spacing=8, bs_v=jnp.asarray(bv),
                            bs_h=jnp.asarray(bh), chroma_every=2, bs_rep=4)
                sao_state = None
                if cfg.sao_enabled:
                    lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
                    t_l, aux_l, off_l, _ = sao_decide(
                        jnp.asarray(np.asarray(y)), ry, lam, ctb=cfg.ctb_size)
                    t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = \
                        sao_decide_chroma(
                            jnp.asarray(np.asarray(u)), ru,
                            jnp.asarray(np.asarray(v)), rv, lam,
                            ctb=cfg.ctb_size // 2)
                    sao_state = SaoState(
                        cfg.ctbs_w, cfg.ctbs_h,
                        typ=np.stack([np.asarray(t_l), np.asarray(t_c),
                                      np.asarray(t_c)]),
                        aux=np.stack([np.asarray(aux_l), np.asarray(aux_cb),
                                      np.asarray(aux_cr)]),
                        offs=np.stack([np.asarray(off_l), np.asarray(off_cb),
                                       np.asarray(off_cr)]),
                    )
                    sao_state.tile_of = tile_of_map(cfg, cfg.tile_cols)
                    ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
                    ru = sao_apply(ru, t_c, aux_cb, off_cb,
                                   ctb=cfg.ctb_size // 2)
                    rv = sao_apply(rv, t_c, aux_cr, off_cr,
                                   ctb=cfg.ctb_size // 2)
                first = self._frame_count == 0 or (
                    is_idr and self.vps_period
                    and (self._idr_count - 1) % self.vps_period == 0)
                self._frame_count += 1
                self._poc = 0 if is_idr else self._poc + 1
                self._ref = (ry, ru, rv)
                return {"kind": "quad_tiles" if is_idr else "quad_p_tiles",
                        "out": {"trees": trees}, "qp": qp, "first": first,
                        "poc": self._poc, "flat_map": None,
                        "sao_state": sao_state, "recon": (ry, ru, rv)}

            use_device = (
                cfg.ctb_log2 == 5
                and cfg.fast_decision
                and cfg.max_transform_hierarchy_depth_intra == 0
            )
            if not is_idr:
                from .frame_inter32 import (encode_frame_p32_fast,
                                            quad_p_bs_maps,
                                            quad_p_cell_maps,
                                            quad_p_trees_from_device)

                pry, pru, prv = self._ref
                tmvp_kw = {}
                if cfg.temporal_mvp:
                    n16 = (cfg.width // 16) * (cfg.height // 16)
                    col = self._col
                    if col is None or col[0].shape[0] != n16:
                        col = (jnp.zeros((n16, 2), jnp.int32),
                               jnp.zeros((n16,), jnp.int32))
                    tmvp_kw = dict(tmvp=True, col_mv=col[0], col_inter=col[1])
                if cfg.ctb_log2 == 6:
                    from .frame_inter64 import (encode_frame_p64_fast,
                                                quad_p64_trees_from_device)

                    dev = encode_frame_p64_fast(
                        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                        pry, pru, prv, dev_qp, width=cfg.width,
                        height=cfg.height, merge_cand=cfg.merge_cand,
                        rdoq=cfg.rdoq, **tmvp_kw)
                    trees = quad_p64_trees_from_device(dev, cfg.width,
                                                       cfg.height)
                else:
                    dev = encode_frame_p32_fast(
                        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                        pry, pru, prv, dev_qp, width=cfg.width,
                        height=cfg.height, merge_cand=cfg.merge_cand,
                        rdoq=cfg.rdoq, **tmvp_kw)
                    trees = quad_p_trees_from_device(dev, cfg.width,
                                                     cfg.height)
                ry = jnp.asarray(dev["recon_y"])
                ru = jnp.asarray(dev["recon_u"])
                rv = jnp.asarray(dev["recon_v"])
                if cfg.temporal_mvp:
                    # publish the 16x16-compressed motion store (spec
                    # compression reads each cell's top-left 4x4)
                    mv4, inter4, _ = quad_p_cell_maps(
                        trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
                    self._col = (jnp.asarray(mv4[::4, ::4].reshape(-1, 2)),
                                 jnp.asarray(inter4[::4, ::4].reshape(-1)))
                if cfg.deblocking_enabled:
                    mv4, inter4, cbf4 = quad_p_cell_maps(
                        trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
                    bv, bh = quad_p_bs_maps(trees, mv4, inter4, cbf4,
                                            cfg.width, cfg.height,
                                            ctb=cfg.ctb_size)
                    dq8 = (self._quad_dq8(trees, flat_map, qp)
                           if flat_map is not None else None)
                    ry, ru, rv = deblock_frame(
                        ry, ru, rv, qp, spacing=8, bs_v=jnp.asarray(bv),
                        bs_h=jnp.asarray(bh), chroma_every=2, bs_rep=4,
                        qp_map=dq8,
                    )
                sao_state = None
                if cfg.sao_enabled:
                    lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
                    t_l, aux_l, off_l, _ = sao_decide(
                        jnp.asarray(np.asarray(y)), ry, lam, ctb=cfg.ctb_size)
                    t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                        jnp.asarray(np.asarray(u)), ru,
                        jnp.asarray(np.asarray(v)), rv, lam,
                        ctb=cfg.ctb_size // 2)
                    sao_state = SaoState(
                        cfg.ctbs_w, cfg.ctbs_h,
                        typ=np.stack([np.asarray(t_l), np.asarray(t_c),
                                      np.asarray(t_c)]),
                        aux=np.stack([np.asarray(aux_l), np.asarray(aux_cb),
                                      np.asarray(aux_cr)]),
                        offs=np.stack([np.asarray(off_l), np.asarray(off_cb),
                                       np.asarray(off_cr)]),
                    )
                    ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
                    ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
                    rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)
                first = self._frame_count == 0
                self._frame_count += 1
                self._poc += 1
                self._ref = (ry, ru, rv)
                return {"kind": "quad_p", "out": {"trees": trees}, "qp": qp,
                        "first": first, "poc": self._poc, "flat_map": flat_map,
                        "sao_state": sao_state, "recon": (ry, ru, rv)}
            use_device64 = (
                cfg.ctb_log2 == 6
                and cfg.fast_decision
                and cfg.max_transform_hierarchy_depth_intra == 0
            )
            if use_device:
                from .frame_intra32 import (encode_frame_intra32_fast,
                                            quad_trees_from_device)

                dev = encode_frame_intra32_fast(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq)
                out = {
                    "trees": quad_trees_from_device(dev, cfg.width, cfg.height),
                    "recon_y": dev["recon_y"],
                    "recon_u": dev["recon_u"],
                    "recon_v": dev["recon_v"],
                }
            elif use_device64:
                from .frame_intra64 import (encode_frame_intra64_fast,
                                            quad_trees_from_device64)

                dev = encode_frame_intra64_fast(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq,
                    bit_depth=cfg.bit_depth)
                out = {
                    "trees": quad_trees_from_device64(dev, cfg.width,
                                                      cfg.height),
                    "recon_y": dev["recon_y"],
                    "recon_u": dev["recon_u"],
                    "recon_v": dev["recon_v"],
                }
            else:
                if flat_map is not None:
                    raise NotImplementedError(
                        "quad qp_map needs the device path (fast_decision, "
                        "td_intra 0)")
                out = encode_frame_intra_quad_ref(
                    np.asarray(y), np.asarray(u), np.asarray(v), qp,
                    width=cfg.width, height=cfg.height, ctb_log2=cfg.ctb_log2,
                    td_intra=cfg.max_transform_hierarchy_depth_intra,
                )
            ry = jnp.asarray(out["recon_y"])
            ru = jnp.asarray(out["recon_u"])
            rv = jnp.asarray(out["recon_v"])
            if cfg.deblocking_enabled:
                bv, bh = quad_bs_maps(out["trees"], cfg.width, cfg.height,
                                      cfg.ctb_log2)
                dq8 = (self._quad_dq8(out["trees"], flat_map, qp)
                       if flat_map is not None else None)
                ry, ru, rv = deblock_frame(
                    ry, ru, rv, qp, spacing=8, bs_v=jnp.asarray(bv),
                    bs_h=jnp.asarray(bh), chroma_every=2, qp_map=dq8,
                    bd=cfg.bit_depth,
                )
            sao_state = None
            if cfg.sao_enabled:
                lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
                t_l, aux_l, off_l, _ = sao_decide(jnp.asarray(np.asarray(y)), ry, lam,
                                                  ctb=cfg.ctb_size)
                t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                    jnp.asarray(np.asarray(u)), ru, jnp.asarray(np.asarray(v)), rv,
                    lam, ctb=cfg.ctb_size // 2
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
            first = self._frame_count == 0 or (
                self.vps_period
                and (self._idr_count - 1) % self.vps_period == 0)
            self._frame_count += 1
            self._poc = 0
            self._ref = (ry, ru, rv)
            self._col = None  # IDR: all-intra collocated motion
            return {"kind": "quad", "out": out, "qp": qp, "first": first,
                    "flat_map": flat_map, "sao_state": sao_state,
                    "recon": (ry, ru, rv)}
        if cfg.min_cb_log2 == 3:
            from .frame_intra_cu8 import encode_frame_intra_cu8

            if not is_idr:
                raise NotImplementedError("CU8 quadtree is intra-only for now")
            out = encode_frame_intra_cu8(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qp,
                width=cfg.width, height=cfg.height,
            )
            ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
            if cfg.deblocking_enabled:
                from ..ops.deblock import bs_maps_cu8

                bv, bh = bs_maps_cu8(out["split"], cfg.ctbs_w, cfg.ctbs_h)
                ry, ru, rv = deblock_frame(
                    ry, ru, rv, qp, spacing=8, bs_v=bv, bs_h=bh, chroma_every=2
                )
            first = self._frame_count == 0 or (
                self.vps_period
                and (self._idr_count - 1) % self.vps_period == 0)
            self._frame_count += 1
            self._ref = (ry, ru, rv)
            return {"kind": "cu8", "out": out, "qp": qp, "first": first,
                    "recon": (ry, ru, rv)}
        if cfg.slices > 1:
            from .sliced import (encode_frame_intra_slices_device,
                                 encode_frame_p_slices_device)

            if is_idr:
                dev = encode_frame_intra_slices_device(
                    cfg, y, u, v, qp, cfg.slices, rdoq=cfg.rdoq
                )
                kind = "slices"
                self._poc = 0
            else:
                dev = encode_frame_p_slices_device(
                    cfg, y, u, v, self._ref, qp, cfg.slices, rdoq=cfg.rdoq
                )
                kind = "slices_p"
                self._poc += 1
            first = self._frame_count == 0
            self._frame_count += 1
            self._ref = dev["recon"]
            return {"kind": kind, "dev": dev, "out": {}, "qp": qp,
                    "first": first, "poc": self._poc, "recon": dev["recon"]}
        if cfg.tile_cols > 1:
            from ..entropy.slice_data import derive_qp_actual_tiles, tile_of_map
            from .tiled import encode_frame_intra_tiles, encode_frame_p_tiles

            if is_idr:
                out = encode_frame_intra_tiles(cfg, y, u, v, qp,
                                               rdoq=cfg.rdoq, qp_map=flat_map)
                bs_v = bs_h = None
            else:
                pry, pru, prv = self._ref
                out = encode_frame_p_tiles(cfg, y, u, v, pry, pru, prv, qp,
                                           rdoq=cfg.rdoq, qp_map=flat_map)
                bs_v, bs_h = compute_bs(
                    jnp.asarray(out["ctype"]),
                    jnp.asarray(np.any(out["lev_y"] != 0, axis=(1, 2))),
                    jnp.asarray(out["mv"]), cfg.ctbs_w, cfg.ctbs_h,
                )
            ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
            qp_pre_actual = None
            if flat_map is not None:
                any_cbf = (
                    np.any(np.asarray(out["lev_y"]), axis=(1, 2))
                    | np.any(np.asarray(out["lev_cb"]), axis=(1, 2))
                    | np.any(np.asarray(out["lev_cr"]), axis=(1, 2))
                )
                qp_pre_actual = derive_qp_actual_tiles(
                    flat_map, any_cbf, cfg, cfg.tile_cols, qp)
            if cfg.deblocking_enabled:
                # picture-level deblock incl. tile-boundary edges
                # (loop_filter_across_tiles_enabled_flag = 1)
                dq_map = (
                    jnp.asarray(qp_pre_actual.reshape(cfg.ctbs_h, cfg.ctbs_w))
                    if qp_pre_actual is not None else None
                )
                ry, ru, rv = deblock_frame(ry, ru, rv, qp,
                                           spacing=cfg.ctb_size,
                                           bs_v=bs_v, bs_h=bs_h,
                                           qp_map=dq_map)
            sao_state = None
            if cfg.sao_enabled:
                # SAO estimation/application on the assembled picture
                # (loop filter crosses tile boundaries; only the MERGE
                # flags respect them — SaoState.tile_of in the writer)
                lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
                t_l, aux_l, off_l, _ = sao_decide(
                    jnp.asarray(np.asarray(y)), ry, lam, ctb=cfg.ctb_size)
                t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                    jnp.asarray(np.asarray(u)), ru,
                    jnp.asarray(np.asarray(v)), rv, lam,
                    ctb=cfg.ctb_size // 2)
                sao_state = SaoState(
                    cfg.ctbs_w, cfg.ctbs_h,
                    typ=np.stack([np.asarray(t_l), np.asarray(t_c),
                                  np.asarray(t_c)]),
                    aux=np.stack([np.asarray(aux_l), np.asarray(aux_cb),
                                  np.asarray(aux_cr)]),
                    offs=np.stack([np.asarray(off_l), np.asarray(off_cb),
                                   np.asarray(off_cr)]),
                )
                sao_state.tile_of = tile_of_map(cfg, cfg.tile_cols)
                ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
                ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
                rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)
            first = self._frame_count == 0 or (
                is_idr and self.vps_period
                and (self._idr_count - 1) % self.vps_period == 0)
            self._frame_count += 1
            self._poc = 0 if is_idr else self._poc + 1
            self._ref = (ry, ru, rv)
            return {"kind": "tiles" if is_idr else "tiles_p", "out": out,
                    "qp": qp, "first": first, "poc": self._poc,
                    "flat_map": flat_map, "sao_state": sao_state,
                    "recon": (ry, ru, rv)}
        if is_idr:
            if cfg.fast_decision:
                from .frame_intra import encode_frame_intra_fast

                out = encode_frame_intra_fast(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq,
                )
            else:
                out = encode_frame_intra(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq,
                )
            bs_v = bs_h = None
        else:
            ry, ru, rv = self._ref
            if cfg.fast_decision:
                from .frame_inter import encode_frame_p_fast

                tmvp_kw = {}
                if cfg.temporal_mvp:
                    nctu = cfg.ctbs_w * cfg.ctbs_h
                    col = self._col
                    if col is None:
                        col = (jnp.zeros((nctu, 2), jnp.int32),
                               jnp.zeros((nctu,), jnp.int32))
                    tmvp_kw = dict(tmvp=True, col_mv=col[0], col_inter=col[1])
                out = encode_frame_p_fast(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq,
                    merge_cand=cfg.merge_cand, **tmvp_kw,
                )
            else:
                out = encode_frame_p(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv), dev_qp,
                    width=cfg.width, height=cfg.height, rdoq=cfg.rdoq,
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

        first = self._frame_count == 0 or (
            is_idr and self.vps_period and (self._idr_count - 1) % self.vps_period == 0
        )
        self._frame_count += 1
        if is_idr:
            self._poc = 0
        else:
            self._poc += 1
        self._ref = (ry, ru, rv)  # JAX arrays: the P chain stays on-device
        if cfg.temporal_mvp:
            if is_idr:
                nctu = cfg.ctbs_w * cfg.ctbs_h
                self._col = (jnp.zeros((nctu, 2), jnp.int32),
                             jnp.zeros((nctu,), jnp.int32))
            else:
                from .frame_inter import CT_INTRA

                self._col = (out["mv"],
                             (out["ctype"] != CT_INTRA).astype(jnp.int32))
        return {"kind": "idr" if is_idr else "p", "out": out, "qp": qp,
                "first": first, "poc": self._poc, "flat_map": flat_map,
                "sao_state": sao_state, "recon": (ry, ru, rv)}

    def _finish(self, stream, ry, ru, rv, materialize_recon):
        """Crop the recon to the conformance window (decoder-output
        semantics) and optionally materialize to host numpy."""
        ry, ru, rv = crop_display(self.cfg, ry, ru, rv)
        if materialize_recon:
            return stream, (np.asarray(ry), np.asarray(ru), np.asarray(rv))
        return stream, (ry, ru, rv)

    def encode_frame_entropy(self, ctx, materialize_recon: bool = True):
        """Host stage: CABAC + NAL mux for a ctx from encode_frame_device.
        Safe to run in a worker thread; returns (annexb_bytes, recon).
        materialize_recon=False keeps recon as device arrays (skips the
        device->host copy — the serving path only ships the bitstream)."""
        cfg = self.cfg
        out, qp, first = ctx["out"], ctx["qp"], ctx["first"]
        ry, ru, rv = ctx["recon"]
        if ctx["kind"] == "quad":
            from ..entropy.quad import (
                encode_slice_data_intra_quad,
                encode_slice_data_intra_quad_wpp,
            )

            entry_offsets = None
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_intra_quad_wpp(
                    cfg, out["trees"], slice_qp=qp, sao=ctx["sao_state"],
                    qp_map=ctx.get("flat_map")
                )
            else:
                payload = encode_slice_data_intra_quad(cfg, out["trees"], slice_qp=qp,
                                                       sao=ctx["sao_state"],
                                                       qp_map=ctx.get("flat_map"))
            sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                             sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled)
            if entry_offsets:
                entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
            w = compose_slice_header(cfg, sh, entry_offsets)
            w.write_bytes(payload)
            stream = self.headers() if first else b""
            stream += compose_nal(NalUnit(sh.nal_type, w.data()))
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] == "quad_p":
            from ..entropy.quad import (encode_slice_data_p_quad,
                                        encode_slice_data_p_quad_wpp)

            entry_offsets = None
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_p_quad_wpp(
                    cfg, out["trees"], slice_qp=qp, sao=ctx["sao_state"],
                    merge_k=cfg.merge_cand, qp_map=ctx.get("flat_map"))
            else:
                payload = encode_slice_data_p_quad(
                    cfg, out["trees"], slice_qp=qp, sao=ctx["sao_state"],
                    merge_k=cfg.merge_cand, qp_map=ctx.get("flat_map"))
            sh = SliceHeader(
                slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
                pic_order_cnt_lsb=ctx["poc"] % (1 << cfg.log2_max_poc_lsb),
                num_negative_pics=1, delta_pocs=(-1,),
                max_num_merge_cand=cfg.merge_cand,
                sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            )
            if entry_offsets:
                entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
            w = compose_slice_header(cfg, sh, entry_offsets)
            w.write_bytes(payload)
            stream = self.headers() if first else b""
            stream += compose_nal(NalUnit(sh.nal_type, w.data()))
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] == "cu8":
            from ..entropy.slice_data import (
                encode_slice_data_intra_cu8x,
                encode_slice_data_intra_cu8x_wpp,
            )

            entry_offsets = None
            args8 = (
                np.asarray(out["split"]), np.asarray(out["part"]),
                np.asarray(out["modes4"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_intra_cu8x_wpp(
                    cfg, *args8, slice_qp=qp
                )
            else:
                payload = encode_slice_data_intra_cu8x(cfg, *args8, slice_qp=qp)
            sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL)
            if entry_offsets:
                entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
            w = compose_slice_header(cfg, sh, entry_offsets)
            w.write_bytes(payload)
            stream = self.headers() if first else b""
            stream += compose_nal(NalUnit(sh.nal_type, w.data()))
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] == "slices":
            from .sliced import entropy_frame_intra_slices

            stream = self.headers() if first else b""
            stream += entropy_frame_intra_slices(cfg, ctx["dev"], qp)
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] == "slices_p":
            from .sliced import entropy_frame_p_slices

            stream = self.headers() if first else b""
            stream += entropy_frame_p_slices(cfg, ctx["dev"], qp, ctx["poc"])
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] in ("quad_tiles", "quad_p_tiles"):
            from ..entropy.quad import encode_slice_data_quad_tiles

            st = 2 if ctx["kind"] == "quad_tiles" else 1
            payload, entry_offsets = encode_slice_data_quad_tiles(
                cfg, out["trees"], st, cfg.tile_cols, slice_qp=qp,
                sao=ctx["sao_state"], merge_k=cfg.merge_cand)
            if st == 2:
                sh = SliceHeader(slice_type=2, qp=qp,
                                 nal_type=NalType.IDR_W_RADL,
                                 sao_luma=cfg.sao_enabled,
                                 sao_chroma=cfg.sao_enabled)
            else:
                sh = SliceHeader(
                    slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
                    pic_order_cnt_lsb=ctx["poc"] % (1 << cfg.log2_max_poc_lsb),
                    num_negative_pics=1, delta_pocs=(-1,),
                    max_num_merge_cand=cfg.merge_cand,
                    sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
                )
            if entry_offsets:
                entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
            w = compose_slice_header(cfg, sh, entry_offsets)
            w.write_bytes(payload)
            stream = self.headers() if first else b""
            stream += compose_nal(NalUnit(sh.nal_type, w.data()))
            return self._finish(stream, ry, ru, rv, materialize_recon)
        if ctx["kind"] in ("tiles", "tiles_p"):
            from ..entropy.slice_data import (
                encode_slice_data_intra_tiles,
                encode_slice_data_p_tiles,
            )

            t_flat_map = ctx.get("flat_map")
            t_sao = ctx.get("sao_state")
            if ctx["kind"] == "tiles":
                res = encode_slice_data_intra_tiles(
                    cfg, cfg.tile_cols,
                    np.asarray(out["mode"]), np.asarray(out["lev_y"]),
                    np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
                    slice_qp=qp, qp_map=t_flat_map, sao=t_sao,
                )
                payload, entry_offsets = res[0], res[1]
                sh = SliceHeader(slice_type=2, qp=qp,
                                 nal_type=NalType.IDR_W_RADL,
                                 sao_luma=cfg.sao_enabled,
                                 sao_chroma=cfg.sao_enabled)
            else:
                res = encode_slice_data_p_tiles(
                    cfg, cfg.tile_cols,
                    np.asarray(out["ctype"]), np.asarray(out["intra_mode"]),
                    np.asarray(out["mv"]), np.asarray(out["mvp_flag"]),
                    np.asarray(out["mvd"]), np.asarray(out["lev_y"]),
                    np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
                    slice_qp=qp,
                    merge_idxs=(np.asarray(out["merge_idx"])
                                if cfg.merge_cand > 1 else None),
                    merge_k=cfg.merge_cand, qp_map=t_flat_map, sao=t_sao,
                )
                payload, entry_offsets = res[0], res[1]
                sh = SliceHeader(
                    slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
                    pic_order_cnt_lsb=ctx["poc"] % (1 << cfg.log2_max_poc_lsb),
                    num_negative_pics=1, delta_pocs=(-1,),
                    max_num_merge_cand=cfg.merge_cand,
                    sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
                )
            if entry_offsets:
                entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
            w = compose_slice_header(cfg, sh, entry_offsets)
            w.write_bytes(payload)
            stream = self.headers() if first else b""
            stream += compose_nal(NalUnit(sh.nal_type, w.data()))
            return self._finish(stream, ry, ru, rv, materialize_recon)
        flat_map, sao_state = ctx["flat_map"], ctx["sao_state"]
        entry_offsets = None
        qp_actual = None
        if ctx["kind"] == "idr":
            arrays = (
                np.asarray(out["mode"]),
                np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]),
                np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                res = encode_slice_data_intra_wpp(
                    cfg, *arrays, qp_map=flat_map, sao=sao_state, slice_qp=qp
                )
                if flat_map is not None:
                    payload, entry_offsets, qp_actual = res
                else:
                    payload, entry_offsets = res
            elif flat_map is not None:
                payload, qp_actual = encode_slice_data_intra_qp(
                    cfg, *arrays, qp_map=flat_map, slice_qp=qp
                )
            else:
                payload = encode_slice_data_intra(cfg, *arrays, slice_qp=qp)
            sh = SliceHeader(
                slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            )
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
            merge_kw = {}
            if cfg.merge_cand > 1:
                merge_kw = dict(merge_idxs=np.asarray(out["merge_idx"]),
                                merge_k=cfg.merge_cand)
            if cfg.wpp:
                res = encode_slice_data_p_wpp(
                    cfg, *p_arrays, slice_qp=qp, qp_map=flat_map,
                    sao=sao_state, **merge_kw
                )
                if flat_map is not None:
                    payload, entry_offsets, qp_actual = res
                else:
                    payload, entry_offsets = res
            elif flat_map is not None:
                payload, _qp_actual = encode_slice_data_p(
                    cfg, *p_arrays, slice_qp=qp, qp_map=flat_map, **merge_kw)
            else:
                payload = encode_slice_data_p(cfg, *p_arrays, slice_qp=qp,
                                              **merge_kw)
            sh = SliceHeader(
                slice_type=1,
                qp=qp,
                nal_type=NalType.TRAIL_R,
                pic_order_cnt_lsb=ctx["poc"] % (1 << cfg.log2_max_poc_lsb),
                num_negative_pics=1,
                delta_pocs=(-1,),
                max_num_merge_cand=cfg.merge_cand,
                sao_luma=cfg.sao_enabled,
                sao_chroma=cfg.sao_enabled,
            )

        if entry_offsets:
            entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
        w = compose_slice_header(cfg, sh, entry_offsets)
        w.write_bytes(payload)
        stream = b""
        if first:
            stream += self.headers()
        stream += compose_nal(NalUnit(sh.nal_type, w.data()))
        return self._finish(stream, ry, ru, rv, materialize_recon)


class RandomAccessEncoder:
    """Hierarchical mini-GOP encoder (BASELINE configs[2]).

    Coding order per 4-frame group after an anchor A0: P/I(A0+4) ->
    B(A0+2: refs A0, A0+4) -> B(A0+1: refs A0, A0+2) -> B(A0+3: refs
    A0+2, A0+4).  Two temporal B layers; anchors every `gop_size`, IDR
    every `intra_period` frames.  Frames are emitted in decode order with
    their POCs (display order) attached.
    """

    def __new__(cls, cfg: StreamConfig, gop_size: int = 4,
                intra_period: int = 32):
        # the production RA path: CTB64 quad device engines (B-pyramid,
        # gop 4/8, wpp+sao+deblock+merge-K+tmvp+rdoq) — encoder/ra.py
        if cfg.ctb_log2 == 6:
            from .ra import QuadRAEncoder

            return QuadRAEncoder(cfg, gop_size, intra_period)
        return super().__new__(cls)

    def __init__(self, cfg: StreamConfig, gop_size: int = 4, intra_period: int = 32) -> None:
        if gop_size != 4:
            raise NotImplementedError(
                "CTB16 RA uses gop_size 4 (gop 8 runs on the CTB64 quad "
                "path: ctb_log2 6)")
        if cfg.sao_enabled and not cfg.wpp:
            raise NotImplementedError("SAO requires cfg.wpp")
        if cfg.num_reorder_pics < 2 or cfg.max_dec_pic_buffering < 4:
            raise ValueError("RA needs cfg.num_reorder_pics >= 2, max_dec_pic_buffering >= 4")
        self.cfg = cfg
        self.gop_size = gop_size
        self.intra_period = intra_period
        self._pending: list = []
        self._anchor = None  # (poc, recon)
        self._frame_idx = 0
        self._sent_headers = False

    def push_frame(self, y, u, v):
        """Returns a list of (poc, annexb_bytes, recon) in decode order
        (empty until a group completes)."""
        self._pending.append(pad_to_coded(self.cfg, y, u, v))
        out = []
        if self._anchor is None:
            # first frame: IDR anchor immediately
            f = self._pending.pop(0)
            out.append(self._encode_anchor(f, idr=True))
            return self._crop_out(out)
        if len(self._pending) == self.gop_size:
            out.extend(self._encode_group())
        return self._crop_out(out)

    def flush(self):
        """Encode any buffered frames as a low-delay P tail."""
        out = []
        poc = self._anchor[0]
        for f in self._pending:
            poc += 1
            out.append(self._encode_inter(f, poc, [self._anchor], slice_type=1))
            self._anchor = (poc, out[-1][2])
        self._pending = []
        return self._crop_out(out)

    def _crop_out(self, out):
        """Conformance-window crop for caller-visible recons; internal
        references (self._anchor chains) stay coded-size."""
        cfg = self.cfg
        if (cfg.out_height, cfg.out_width) == (cfg.height, cfg.width):
            return out
        return [(p, s, crop_display(cfg, *r)) for (p, s, r) in out]

    # ----------------------------------------------------------- internals
    def _encode_group(self):
        cfg = self.cfg
        a0_poc, a0 = self._anchor
        f1, f2, f3, f4 = self._pending
        self._pending = []
        out = []
        anchor = self._encode_inter(f4, a0_poc + 4, [self._anchor], slice_type=1)
        out.append(anchor)
        a4 = (anchor[0], anchor[2])
        a0p = (a0_poc, a0)
        # temporal-layer QP cascading (kvazaar/HM RA defaults): referenced
        # mid B +1, non-referenced top-layer Bs +2
        b2 = self._encode_inter(f2, a0p[0] + 2, [a0p, a4], slice_type=0, dqp=1)
        out.append(b2)
        p2 = (b2[0], b2[2])
        out.append(self._encode_inter(f1, a0p[0] + 1, [a0p, p2], slice_type=0,
                                      dqp=2))
        out.append(self._encode_inter(f3, a0p[0] + 3, [p2, a4], slice_type=0,
                                      dqp=2))
        self._anchor = a4
        return out

    def _encode_anchor(self, f, idr: bool):
        cfg = self.cfg
        y, u, v = f
        qp = cfg.qp
        out = encode_frame_intra(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qp,
            width=cfg.width, height=cfg.height,
        )
        poc = 0 if idr else self._anchor[0] + 4
        nal_bytes, recon = self._filters_and_entropy(
            f, out, qp, slice_type=2, poc=poc, refs=None, bs=None
        )
        self._frame_idx += 1
        self._anchor = (poc, recon)
        return poc, nal_bytes, recon

    def _encode_inter(self, f, poc, refs, slice_type: int, dqp: int = 0):
        cfg = self.cfg
        y, u, v = f
        qp = cfg.qp + dqp  # hierarchical layer offset
        if slice_type == 1:
            (r_poc, r), = refs
            out = encode_frame_p(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(r[0]), jnp.asarray(r[1]), jnp.asarray(r[2]), qp,
                width=cfg.width, height=cfg.height,
            )
            bs = compute_bs(
                out["ctype"], jnp.any(out["lev_y"] != 0, axis=(1, 2)), out["mv"],
                cfg.ctbs_w, cfg.ctbs_h,
            )
        else:
            from ..ops.deblock import compute_bs_b
            from .frame_b import encode_frame_b

            (p0, r0), (p1, r1) = refs
            out = encode_frame_b(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(r0[0]), jnp.asarray(r0[1]), jnp.asarray(r0[2]),
                jnp.asarray(r1[0]), jnp.asarray(r1[1]), jnp.asarray(r1[2]),
                qp, jnp.asarray([poc - p0, poc - p1], jnp.int32),
                width=cfg.width, height=cfg.height,
            )
            bs = compute_bs_b(
                out["ctype"], jnp.any(out["lev_y"] != 0, axis=(1, 2)),
                out["pf"], out["mv"], cfg.ctbs_w, cfg.ctbs_h,
            )
        nal_bytes, recon = self._filters_and_entropy(
            f, out, qp, slice_type=slice_type, poc=poc, refs=refs, bs=bs
        )
        self._frame_idx += 1
        return poc, nal_bytes, recon

    def _filters_and_entropy(self, f, out, qp, slice_type, poc, refs, bs):
        cfg = self.cfg
        from ..entropy.slice_data import encode_slice_data_b_wpp

        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        bs_v, bs_h = bs if bs is not None else (None, None)
        sao_state = None
        if cfg.deblocking_enabled:
            ry, ru, rv = deblock_frame(
                ry, ru, rv, qp, spacing=cfg.ctb_size, bs_v=bs_v, bs_h=bs_h
            )
        if cfg.sao_enabled:
            y, u, v = f
            lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
            t_l, aux_l, off_l, _ = sao_decide(jnp.asarray(y), ry, lam, ctb=cfg.ctb_size)
            t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                jnp.asarray(u), ru, jnp.asarray(v), rv, lam, ctb=cfg.ctb_size // 2
            )
            sao_state = SaoState(
                cfg.ctbs_w, cfg.ctbs_h,
                typ=np.stack([np.asarray(t_l), np.asarray(t_c), np.asarray(t_c)]),
                aux=np.stack([np.asarray(aux_l), np.asarray(aux_cb), np.asarray(aux_cr)]),
                offs=np.stack([np.asarray(off_l), np.asarray(off_cb), np.asarray(off_cr)]),
            )
            ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
            ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
            rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)

        entry_offsets = None
        if slice_type == 2:
            arrays = (
                np.asarray(out["mode"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_intra_wpp(cfg, *arrays, sao=sao_state)
            else:
                payload = encode_slice_data_intra(cfg, *arrays)
            sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                             sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled)
        elif slice_type == 1:
            (r_poc, _), = refs
            p_arrays = (
                np.asarray(out["ctype"]), np.asarray(out["intra_mode"]),
                np.asarray(out["mv"]), np.asarray(out["mvp_flag"]),
                np.asarray(out["mvd"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_p_wpp(
                    cfg, *p_arrays, slice_qp=qp, sao=sao_state
                )
            else:
                payload = encode_slice_data_p(cfg, *p_arrays, slice_qp=qp)
            sh = SliceHeader(
                slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
                pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
                num_negative_pics=1, delta_pocs=(r_poc - poc,),
                sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            )
        else:
            (p0, _), (p1, _) = refs
            b_arrays = (
                np.asarray(out["ctype"]), np.asarray(out["intra_mode"]),
                np.asarray(out["pf"]), np.asarray(out["mv"]),
                np.asarray(out["inter_dir"]), np.asarray(out["mvp_flag"]),
                np.asarray(out["mvd"]), np.asarray(out["lev_y"]),
                np.asarray(out["lev_cb"]), np.asarray(out["lev_cr"]),
            )
            if cfg.wpp:
                payload, entry_offsets = encode_slice_data_b_wpp(
                    cfg, *b_arrays, slice_qp=qp, sao=sao_state)
            else:
                from ..entropy.slice_data import encode_slice_data_b

                payload = encode_slice_data_b(
                    cfg, *b_arrays, slice_qp=qp, sao=sao_state)
            sh = SliceHeader(
                slice_type=0, qp=qp, nal_type=NalType.TRAIL_R,
                pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
                num_negative_pics=1, delta_pocs=(p0 - poc,),
                pos_deltas=(p1 - poc,),
                sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            )
        if entry_offsets:
            entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
        w = compose_slice_header(cfg, sh, entry_offsets)
        w.write_bytes(payload)
        stream = b""
        if not self._sent_headers:
            stream += self.headers()
            self._sent_headers = True
        stream += compose_nal(NalUnit(sh.nal_type, w.data()))
        recon = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
        return stream, recon

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(
            compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
        )
