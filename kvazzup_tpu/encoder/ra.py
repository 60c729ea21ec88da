"""Random-access B-pyramid encoder on the CTB64 quad device engines.

The production RA operating point (BASELINE configs[2], kvazaar's RA GOP
surface /root/reference/src/media/processing/kvazaarfilter.cpp:233):
hierarchical mini-GOPs of 4 or 8 pictures with temporal-layer QP
cascading, coded by the device-native quad engines — intra64 anchors,
P64 anchors (TMVP against the previous anchor: equal POC distances, so
the 8.5.3.2.8 scaling is the identity), and the frame_b64 bi-prediction
wavefront for every B layer.  The full production toolset composes:
wpp + sao + deblock + merge-K + rdoq.

DPB management is explicit: every slice carries a short-term RPS whose
used_by_curr flags keep exactly the live pyramid references (higher
anchors ride along with used = 0 so L0[0]/L1[0] stay the two active
refs).  Intra refreshes inside the stream are open-GOP I anchors
(TRAIL_R I slices, not IDR) so the trailing Bs keep their past anchor;
only the stream start is an IDR.

GOP8 decode order per group (a = previous anchor POC):
  P(a+8, ref a) -> B(a+4: a, a+8) -> B(a+2: a, a+4) -> B(a+1: a, a+2)
  -> B(a+3: a+2, a+4) -> B(a+6: a+4, a+8) -> B(a+5: a+4, a+6)
  -> B(a+7: a+6, a+8); layer QPs +0/+1/+2/+3.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.nal import NalType, NalUnit, compose_nal, ebsp_entry_offsets
from ..core.params import (SliceHeader, compose_pps, compose_slice_header,
                           compose_sps, compose_vps)
from ..entropy.slice_data import SaoState
from ..ops.deblock import deblock_frame
from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma

# per-step schedule: (display offset, l0 offset, l1 offset or None, layer,
#   ((neg_delta, used), ...), ((pos_delta, used), ...))  — deltas relative
# to the step's own POC; retained-set derivation in the module docstring.
_GOP8 = (
    (8, 0, None, 0, ((-8, 1),), ()),
    (4, 0, 8, 1, ((-4, 1),), ((4, 1),)),
    (2, 0, 4, 2, ((-2, 1),), ((2, 1), (6, 0))),
    (1, 0, 2, 3, ((-1, 1),), ((1, 1), (3, 0), (7, 0))),
    (3, 2, 4, 3, ((-1, 1),), ((1, 1), (5, 0))),
    (6, 4, 8, 2, ((-2, 1),), ((2, 1),)),
    (5, 4, 6, 3, ((-1, 1),), ((1, 1), (3, 0))),
    (7, 6, 8, 3, ((-1, 1),), ((1, 1),)),
)
_GOP4 = (
    (4, 0, None, 0, ((-4, 1),), ()),
    (2, 0, 4, 1, ((-2, 1),), ((2, 1),)),
    (1, 0, 2, 2, ((-1, 1),), ((1, 1), (3, 0))),
    (3, 2, 4, 2, ((-1, 1),), ((1, 1),)),
)
_LAYER_DQP = {4: (0, 1, 2, 2), 8: (0, 1, 3, 4)}
# gop8 cascade 0,1,3,4: tools/ra_tune.py round 1 (2026-08-20, on-chip,
# 1280x704 16f qp24-39): +0.068 dB / -0.9% BD-rate over 0,1,2,3; flat
# cascades lose -0.18 dB; HM-style B lambda weights neutral here.


class QuadRAEncoder:
    """Hierarchical RA encoder (gop 4/8) on the quad64 production path."""

    def __init__(self, cfg, gop_size: int = 8, intra_period: int = 32,
                 cutree: float | None = None):
        if cfg.ctb_log2 != 6:
            raise NotImplementedError("quad RA requires ctb_log2 6 (CTB64)")
        if not cfg.fast_decision or cfg.max_transform_hierarchy_depth_intra:
            raise NotImplementedError(
                "quad RA needs the device quad path: fast_decision, "
                "td_intra 0")
        if gop_size not in (4, 8):
            raise ValueError("gop_size must be 4 or 8")
        if cfg.width % cfg.ctb_size or cfg.height % cfg.ctb_size:
            raise ValueError("CTB-aligned dimensions required (pad input)")
        if intra_period % gop_size:
            raise ValueError("intra_period must be a multiple of gop_size")
        need_reorder = 2 if gop_size == 4 else 3
        if cfg.num_reorder_pics < need_reorder or \
                cfg.max_dec_pic_buffering < gop_size // 2 + 2:
            raise ValueError(
                f"RA gop{gop_size} needs num_reorder_pics >= {need_reorder},"
                f" max_dec_pic_buffering >= {gop_size // 2 + 2}")
        if cfg.tile_cols > 1 or cfg.slices > 1:
            raise NotImplementedError("quad RA excludes tiles/slices")
        self.cfg = cfg
        self.gop_size = gop_size
        self.intra_period = intra_period
        self.sched = _GOP8 if gop_size == 8 else _GOP4
        self.dqp = _LAYER_DQP[gop_size]
        # per-temporal-layer B lambda weights (HM-style hierarchical
        # weighting knob; 1.0 = the flat I/P formula).  Override for
        # calibration experiments with KVZ_TPU_RA_BLAM="l0,l1,l2,l3".
        import os as _os

        raw = _os.environ.get("KVZ_TPU_RA_BLAM")
        if raw:
            vals = tuple(float(x) for x in raw.split(","))
            self.blam = (vals + (vals[-1],) * 4)[:4]
        else:
            self.blam = (1.0, 1.0, 1.0, 1.0)
        raw = _os.environ.get("KVZ_TPU_RA_DQP")  # cascade calibration knob
        if raw:
            vals = tuple(int(x) for x in raw.split(","))
            self.dqp = (vals + (vals[-1],) * 4)[:4]
        # cu-tree temporal lookahead (encoder/lookahead.py): strength > 0
        # lowers QP on blocks future pictures predict from, via the
        # qp_map x RA path.  Decision-layer only; streams stay oracle-exact.
        if cutree is None:
            cutree = float(_os.environ.get("KVZ_TPU_RA_CUTREE", "0") or 0)
        self.cutree = float(cutree)
        if self.cutree and not cfg.cu_qp_delta:
            raise ValueError("KVZ_TPU_RA_CUTREE needs cfg.cu_qp_delta")
        self._la_prev = None  # previous anchor's source luma (display off 0)
        self._pending: list = []
        self._anchor_poc = None
        self._dpb: dict = {}   # poc -> (ry, ru, rv) jnp planes
        self._col: dict = {}   # poc -> (mv (n16, 2), inter (n16,)) for TMVP
        self._sent_headers = False

    def headers(self) -> bytes:
        cfg = self.cfg
        return b"".join(compose_nal(n) for n in (
            compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))

    # ------------------------------------------------------------- driving
    def push_frame(self, y, u, v, qp=None, qp_map=None):
        """Returns a list of (poc, annexb_bytes, recon) in decode order
        (empty until a mini-GOP completes).  qp_map: per-CTU
        (ctbs_h, ctbs_w) QP grid (requires cfg.cu_qp_delta) — the
        ROI/RoiMap hook (kvazaarfilter.cpp:423-431); temporal-layer QP
        cascading shifts the whole map by the layer offset."""
        from .top import pad_to_coded

        if qp_map is not None and not self.cfg.cu_qp_delta:
            raise ValueError("qp_map requires cfg.cu_qp_delta")
        self._pending.append((pad_to_coded(self.cfg, y, u, v), qp_map))
        out = []
        if self._anchor_poc is None:
            f, qmap = self._pending.pop(0)
            out.append(self._code_i(f, poc=0, idr=True, qp=qp, qp_map=qmap))
            return out
        if len(self._pending) == self.gop_size:
            out.extend(self._code_group(qp))
        return out

    def flush(self, qp=None):
        """Encode buffered frames as a low-delay P tail."""
        out = []
        poc = self._anchor_poc
        for f, qmap in self._pending:
            poc += 1
            out.append(self._code_p(f, poc, ref_poc=poc - 1, layer=0,
                                    rps=(((-1, 1),), ()), qp=qp,
                                    tail=True, qp_map=qmap))
        self._pending = []
        return out

    # ------------------------------------------------------------ internals
    def _lookahead_frames(self, frames, qp):
        """cu-tree pass over one buffered mini-GOP: returns the (frame,
        qp_map) list with per-CTB lookahead offsets merged into the maps
        (user ROI maps compose additively).  No-op when disabled."""
        if not self.cutree:
            return frames
        from .lookahead import cutree_offsets

        cfg = self.cfg
        base = self._base_qp(qp)
        if self._la_prev is not None and \
                self._la_prev.shape != frames[0][0][0].shape:
            self._la_prev = None  # resolution reconfigure between groups
        offs = cutree_offsets(
            [f for f, _ in frames], self._la_prev, self.sched, base,
            width=cfg.width, height=cfg.height, strength=self.cutree,
            ctb=cfg.ctb_size)
        out = []
        for i, (f, qmap) in enumerate(frames):
            o = offs[i + 1]
            if qmap is None:
                m = np.clip(base + o, 0, 51)
            else:
                m = np.clip(np.asarray(qmap, np.int32).reshape(o.shape) + o,
                            0, 51)
            out.append((f, m))
        self._la_prev = frames[-1][0][0]  # next group's display offset 0
        return out

    def _code_group(self, qp):
        a0 = self._anchor_poc
        frames = self._lookahead_frames(self._pending, qp)
        self._pending = []
        out = []
        for (off, l0, l1, layer, neg, pos) in self.sched:
            f, qmap = frames[off - 1]
            poc = a0 + off
            if l1 is None:
                if poc % self.intra_period == 0:
                    # open-GOP I anchor: retains the previous anchor for
                    # this group's trailing Bs (used = 0: no ref lists)
                    out.append(self._code_i(
                        f, poc, idr=False, qp=qp,
                        rps=(((-self.gop_size, 0),), ()), qp_map=qmap))
                else:
                    out.append(self._code_p(f, poc, ref_poc=a0, layer=layer,
                                            rps=(neg, pos), qp=qp,
                                            qp_map=qmap))
            else:
                out.append(self._code_b(f, poc, a0 + l0, a0 + l1, layer,
                                        (neg, pos), qp, qp_map=qmap))
            self._prune_dpb(poc, (neg, pos))
        self._anchor_poc = a0 + self.gop_size
        return out

    def _qp_eff(self, qp, qp_map, layer):
        """(slice_qp, device_qp, flat_map) for a temporal layer: the layer
        offset shifts both the slice QP and, when a ROI map is present,
        every per-CTU entry (clipped to 0..51)."""
        base = self._base_qp(qp) + self.dqp[layer]
        if qp_map is None:
            if self.cfg.cu_qp_delta:
                # an enabled-PPS slice must code the delta syntax even
                # when no map is supplied (zero deltas): the entropy
                # writers emit cu_qp_delta only when a map is present
                n = self.cfg.ctbs_w * self.cfg.ctbs_h
                flat = np.full(n, np.clip(base, 0, 51), np.int32)
                return base, jnp.asarray(flat), flat
            return base, base, None
        flat = np.clip(np.asarray(qp_map, np.int32).reshape(-1)
                       + self.dqp[layer], 0, 51)
        return base, jnp.asarray(flat), flat

    def _prune_dpb(self, poc, rps):
        keep = {poc}
        neg, pos = rps
        for d, _u in neg:
            keep.add(poc + d)
        for d, _u in pos:
            keep.add(poc + d)
        for p in [p for p in self._dpb if p not in keep]:
            del self._dpb[p]
            self._col.pop(p, None)

    def _base_qp(self, qp):
        return self.cfg.qp if qp is None else qp

    def _loopfilters(self, f, ry, ru, rv, qp, bs, bs_rep=4, dq8=None):
        """Deblock + SAO decide/apply; returns (ry, ru, rv, sao_state).

        bs_rep: granularity of the bS maps along the edge — the P/B
        maps are 4-px spec segments (rep 4), the intra quad_bs_maps are
        8-px (rep 0 -> spacing).  dq8: per-8-block actual-QP grid when a
        ROI map is active (deblock edge QPs follow the 8.6.1 chain)."""
        cfg = self.cfg
        y, u, v = f
        if cfg.deblocking_enabled:
            bv, bh = bs
            ry, ru, rv = deblock_frame(
                ry, ru, rv, qp, spacing=8, bs_v=jnp.asarray(bv),
                bs_h=jnp.asarray(bh), chroma_every=2, bs_rep=bs_rep,
                qp_map=dq8)
        sao_state = None
        if cfg.sao_enabled:
            lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
            t_l, aux_l, off_l, _ = sao_decide(
                jnp.asarray(y), ry, lam, ctb=cfg.ctb_size)
            t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                jnp.asarray(u), ru, jnp.asarray(v), rv, lam,
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
        return ry, ru, rv, sao_state

    def _emit(self, payload_pair, sh, ry, ru, rv):
        payload, entry_offsets = payload_pair
        if entry_offsets:
            entry_offsets = ebsp_entry_offsets(payload, entry_offsets)
        w = compose_slice_header(self.cfg, sh, entry_offsets)
        w.write_bytes(payload)
        stream = b""
        if not self._sent_headers:
            stream += self.headers()
            self._sent_headers = True
        stream += compose_nal(NalUnit(sh.nal_type, w.data()))
        from .top import crop_display

        cry, cru, crv = crop_display(self.cfg, ry, ru, rv)
        recon = (np.asarray(cry), np.asarray(cru), np.asarray(crv))
        return stream, recon

    def _rps_fields(self, rps):
        if rps is None:
            return {}
        neg, pos = rps
        return dict(
            num_negative_pics=len(neg),
            delta_pocs=tuple(d for d, _ in neg),
            neg_used=tuple(u for _, u in neg),
            pos_deltas=tuple(d for d, _ in pos),
            pos_used=tuple(u for _, u in pos),
        )

    def _code_i(self, f, poc, idr: bool, qp=None, rps=None, qp_map=None):
        cfg = self.cfg
        from ..entropy.quad import (encode_slice_data_intra_quad,
                                    encode_slice_data_intra_quad_wpp)
        from .cu32 import quad_bs_maps
        from .frame_intra64 import (encode_frame_intra64_fast,
                                    quad_trees_from_device64)
        from .top import quad_dq8

        y, u, v = f
        qp, dev_qp, flat_map = self._qp_eff(qp, qp_map, 0)
        dev = encode_frame_intra64_fast(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), dev_qp,
            width=cfg.width, height=cfg.height, rdoq=cfg.rdoq)
        trees = quad_trees_from_device64(dev, cfg.width, cfg.height)
        ry = jnp.asarray(dev["recon_y"])
        ru = jnp.asarray(dev["recon_u"])
        rv = jnp.asarray(dev["recon_v"])
        bs = None
        if cfg.deblocking_enabled:
            bv, bh = quad_bs_maps(trees, cfg.width, cfg.height, cfg.ctb_log2)
            bs = (bv, bh)
        dq8 = (quad_dq8(cfg, trees, flat_map, qp)
               if flat_map is not None else None)
        ry, ru, rv, sao_state = self._loopfilters(f, ry, ru, rv, qp, bs,
                                                  bs_rep=0, dq8=dq8)
        if cfg.wpp:
            pair = encode_slice_data_intra_quad_wpp(cfg, trees, slice_qp=qp,
                                                    sao=sao_state,
                                                    qp_map=flat_map)
        else:
            pair = (encode_slice_data_intra_quad(cfg, trees, slice_qp=qp,
                                                 sao=sao_state,
                                                 qp_map=flat_map), None)
        sh = SliceHeader(
            slice_type=2, qp=qp,
            nal_type=NalType.IDR_W_RADL if idr else NalType.TRAIL_R,
            pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
            sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            tmvp=False, **self._rps_fields(rps))
        stream, recon = self._emit(pair, sh, ry, ru, rv)
        self._dpb[poc] = (ry, ru, rv)
        if cfg.temporal_mvp:
            n16 = (cfg.width // 16) * (cfg.height // 16)
            self._col[poc] = (jnp.zeros((n16, 2), jnp.int32),
                              jnp.zeros((n16,), jnp.int32))
        self._anchor_poc = poc
        self._la_prev = y  # lookahead's display-offset-0 source
        return poc, stream, recon

    def _code_p(self, f, poc, ref_poc, layer, rps, qp=None, tail=False,
                qp_map=None):
        cfg = self.cfg
        from ..entropy.quad import (encode_slice_data_p_quad,
                                    encode_slice_data_p_quad_wpp)
        from .frame_inter32 import (quad_p_bs_maps, quad_p_cell_maps)
        from .frame_inter64 import (encode_frame_p64_fast,
                                    quad_p64_trees_from_device)
        from .top import quad_dq8

        y, u, v = f
        qp, dev_qp, flat_map = self._qp_eff(qp, qp_map, layer)
        pry, pru, prv = self._dpb[ref_poc]
        tmvp_kw = {}
        if cfg.temporal_mvp:
            n16 = (cfg.width // 16) * (cfg.height // 16)
            col = self._col.get(ref_poc)
            if col is None or col[0].shape[0] != n16:
                col = (jnp.zeros((n16, 2), jnp.int32),
                       jnp.zeros((n16,), jnp.int32))
            tmvp_kw = dict(tmvp=True, col_mv=col[0], col_inter=col[1])
        dev = encode_frame_p64_fast(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), pry, pru, prv,
            dev_qp, width=cfg.width, height=cfg.height,
            merge_cand=cfg.merge_cand, rdoq=cfg.rdoq, **tmvp_kw)
        trees = quad_p64_trees_from_device(dev, cfg.width, cfg.height)
        ry = jnp.asarray(dev["recon_y"])
        ru = jnp.asarray(dev["recon_u"])
        rv = jnp.asarray(dev["recon_v"])
        mv4, inter4, cbf4 = quad_p_cell_maps(trees, cfg.width, cfg.height,
                                             ctb=cfg.ctb_size)
        bs = None
        if cfg.deblocking_enabled:
            bs = quad_p_bs_maps(trees, mv4, inter4, cbf4, cfg.width,
                                cfg.height, ctb=cfg.ctb_size)
        dq8 = (quad_dq8(cfg, trees, flat_map, qp)
               if flat_map is not None else None)
        ry, ru, rv, sao_state = self._loopfilters(f, ry, ru, rv, qp, bs,
                                                  dq8=dq8)
        if cfg.wpp:
            pair = encode_slice_data_p_quad_wpp(
                cfg, trees, slice_qp=qp, sao=sao_state,
                merge_k=cfg.merge_cand, qp_map=flat_map)
        else:
            pair = (encode_slice_data_p_quad(
                cfg, trees, slice_qp=qp, sao=sao_state,
                merge_k=cfg.merge_cand, qp_map=flat_map), None)
        sh = SliceHeader(
            slice_type=1, qp=qp, nal_type=NalType.TRAIL_R,
            pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
            max_num_merge_cand=cfg.merge_cand,
            sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            **self._rps_fields(rps))
        stream, recon = self._emit(pair, sh, ry, ru, rv)
        self._dpb[poc] = (ry, ru, rv)
        if cfg.temporal_mvp:
            self._col[poc] = (
                jnp.asarray(mv4[::4, ::4].reshape(-1, 2)),
                jnp.asarray(inter4[::4, ::4].reshape(-1)))
        if tail:
            self._prune_dpb(poc, rps)
            self._anchor_poc = poc
        return poc, stream, recon

    def _code_b(self, f, poc, p0, p1, layer, rps, qp=None, qp_map=None):
        cfg = self.cfg
        from .frame_b64 import encode_frame_b64_fast

        y, u, v = f
        qp, dev_qp, flat_map = self._qp_eff(qp, qp_map, layer)
        r0 = self._dpb[p0]
        r1 = self._dpb[p1]
        dev = encode_frame_b64_fast(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            r0[0], r0[1], r0[2], r1[0], r1[1], r1[2], dev_qp,
            jnp.asarray([poc - p0, poc - p1], jnp.int32),
            width=cfg.width, height=cfg.height, merge_cand=cfg.merge_cand,
            rdoq=cfg.rdoq, lam_scale=self.blam[layer])
        return self._finish_b(f, dev, poc, qp, flat_map, rps)

    def _finish_b(self, f, dev, poc, qp, flat_map, rps):
        """Trees + loop filters + entropy + emit for one B picture; `dev`
        is the (per-frame) device output dict of encode_frame_b64_fast —
        shared by the sequential path and the level-batched encoder
        (ra_batch.QuadRABatchEncoder slices its vmapped outputs here)."""
        cfg = self.cfg
        from ..entropy.quad import (encode_slice_data_b_quad,
                                    encode_slice_data_b_quad_wpp)
        from .frame_b64 import (quad_b_bs_maps, quad_b_cell_maps,
                                quad_b64_trees_from_device)
        from .top import quad_dq8

        trees = quad_b64_trees_from_device(dev, cfg.width, cfg.height)
        ry = jnp.asarray(dev["recon_y"])
        ru = jnp.asarray(dev["recon_u"])
        rv = jnp.asarray(dev["recon_v"])
        bs = None
        if cfg.deblocking_enabled:
            mv4, pf4, cbf4 = quad_b_cell_maps(trees, cfg.width, cfg.height,
                                              ctb=cfg.ctb_size)
            bs = quad_b_bs_maps(trees, mv4, pf4, cbf4, cfg.width, cfg.height,
                                ctb=cfg.ctb_size)
        dq8 = (quad_dq8(cfg, trees, flat_map, qp)
               if flat_map is not None else None)
        ry, ru, rv, sao_state = self._loopfilters(f, ry, ru, rv, qp, bs,
                                                  dq8=dq8)
        if cfg.wpp:
            pair = encode_slice_data_b_quad_wpp(
                cfg, trees, slice_qp=qp, sao=sao_state,
                merge_k=cfg.merge_cand, qp_map=flat_map)
        else:
            pair = (encode_slice_data_b_quad(
                cfg, trees, slice_qp=qp, sao=sao_state,
                merge_k=cfg.merge_cand, qp_map=flat_map), None)
        sh = SliceHeader(
            slice_type=0, qp=qp, nal_type=NalType.TRAIL_R,
            pic_order_cnt_lsb=poc % (1 << cfg.log2_max_poc_lsb),
            max_num_merge_cand=cfg.merge_cand,
            sao_luma=cfg.sao_enabled, sao_chroma=cfg.sao_enabled,
            tmvp=False, **self._rps_fields(rps))
        stream, recon = self._emit(pair, sh, ry, ru, rv)
        self._dpb[poc] = (ry, ru, rv)
        return poc, stream, recon
