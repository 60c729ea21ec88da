"""Device-batched GOP-parallel encoding: B closed GOPs per chip at once.

The single-stream wavefront leaves MXU rows idle (a 1080p wave is <= 68
lanes); batching B independent IDR-led segments multiplies every device
op's batch dimension by B and recovers the lost utilization — measured
1.6x P-frame throughput at B = 4 on one v5e chip (33 fps @1080p).  This
is the on-chip form of the reference's OWF/session parallelism
(kvazaarfilter.cpp:193,299: frames in flight; filtergraph.h:94-108:
per-session graphs), with `jax.vmap` playing the thread pool.

Segments are closed GOPs exactly as in gop_parallel.py: the IDR resets
DPB/POC and parameter sets are re-sent per segment, so the concatenated
stream is BYTE-IDENTICAL to a sequential Encoder with vps_period=1 (the
vmapped kernels run the same ops, just batched).  Host entropy coding
runs on a thread pool overlapped with the next device step.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from ..core.params import StreamConfig
from ..encoder.top import Encoder


class GopBatchDeviceEncoder:
    """Encode a frame list as `gop_size` closed GOPs, `batch` segments per
    device dispatch.  Supports the fast-decision CTB16 toolset and the
    CTB64 quad production combo (wpp+sao+deblock+merge+tmvp+rdoq);
    tiles/slices/qp-maps use the other schedulers.
    """

    def __init__(self, cfg: StreamConfig, gop_size: int = 8, batch: int = 4,
                 cabac_workers: int = 4) -> None:
        if cfg.tile_cols > 1 or cfg.slices > 1 or cfg.cu_qp_delta:
            raise NotImplementedError(
                "gop-batch covers the CTB16 and quad64 toolsets")
        self.quad64 = cfg.ctb_log2 == 6
        if self.quad64:
            # the production operating point: CTB64 quadtrees with
            # wpp+sao+deblock+merge+tmvp+rdoq all supported
            if not cfg.fast_decision or cfg.max_transform_hierarchy_depth_intra:
                raise NotImplementedError(
                    "quad64 gop-batch needs the device quad path "
                    "(fast_decision, td_intra 0)")
        elif cfg.ctb_log2 != 4 or cfg.min_cb_log2 != 4:
            raise NotImplementedError("gop-batch requires CTB16/CU16 or CTB64")
        if cfg.sao_enabled and not cfg.wpp:
            raise NotImplementedError("SAO requires cfg.wpp (entropy layout)")
        self.cfg = cfg
        self.gop_size = gop_size
        self.batch = batch
        self.workers = cabac_workers
        self._jits: dict = {}

    # ---- batched device stages (built once per batch size)
    def _fns(self, b: int):
        if b in self._jits:
            return self._jits[b]
        cfg = self.cfg
        from ..encoder.frame_inter import encode_frame_p_fast
        from ..encoder.frame_intra import encode_frame_intra_fast
        from ..ops.deblock import compute_bs, deblock_frame
        from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma

        w, h = cfg.width, cfg.height
        qp = cfg.qp
        lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))

        def loop_filters(y, u, v, out, bs_v, bs_h):
            ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
            if cfg.deblocking_enabled:
                ry, ru, rv = deblock_frame(ry, ru, rv, qp, spacing=cfg.ctb_size,
                                           bs_v=bs_v, bs_h=bs_h)
            sao = None
            if cfg.sao_enabled:
                t_l, aux_l, off_l, _ = sao_decide(y, ry, lam, ctb=cfg.ctb_size)
                t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                    u, ru, v, rv, lam, ctb=cfg.ctb_size // 2)
                sao = (t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr)
                ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
                ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
                rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)
            return (ry, ru, rv), sao

        def step_i(y, u, v):
            out = encode_frame_intra_fast(y, u, v, qp, width=w, height=h,
                                          rdoq=cfg.rdoq)
            recon, sao = loop_filters(y, u, v, out, None, None)
            return out, recon, sao

        def step_p(y, u, v, ry, ru, rv):
            out = encode_frame_p_fast(y, u, v, ry, ru, rv, qp, width=w,
                                      height=h, rdoq=cfg.rdoq,
                                      merge_cand=cfg.merge_cand)
            bs_v, bs_h = compute_bs(out["ctype"],
                                    jnp.any(out["lev_y"] != 0, axis=(1, 2)),
                                    out["mv"], cfg.ctbs_w, cfg.ctbs_h)
            recon, sao = loop_filters(y, u, v, out, bs_v, bs_h)
            return out, recon, sao

        fns = (jax.jit(jax.vmap(step_i)), jax.jit(jax.vmap(step_p)))
        self._jits[b] = fns
        return fns

    # ---- quad64 batched stages: the device wave scan and the in-loop
    # filters are separate jits because deblock boundary strengths come
    # from the host-extracted CU trees (exactly as in Encoder's quad64
    # path) — stage1 (vmapped scan) -> host trees/bs maps per segment ->
    # stage2 (vmapped deblock+SAO).
    def _fns64(self, b: int):
        key = ("q64", b)
        if key in self._jits:
            return self._jits[key]
        cfg = self.cfg
        from ..encoder.frame_intra64 import encode_frame_intra64_fast
        from ..encoder.frame_inter64 import encode_frame_p64_fast
        from ..ops.deblock import deblock_frame
        from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma

        w, h = cfg.width, cfg.height
        qp = cfg.qp
        lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))

        def dev_i(y, u, v):
            return encode_frame_intra64_fast(y, u, v, qp, width=w, height=h,
                                             rdoq=cfg.rdoq)

        def dev_p(y, u, v, ry, ru, rv, col_mv, col_inter):
            kw = {}
            if cfg.temporal_mvp:
                kw = dict(tmvp=True, col_mv=col_mv, col_inter=col_inter)
            return encode_frame_p64_fast(y, u, v, ry, ru, rv, qp, width=w,
                                         height=h, merge_cand=cfg.merge_cand,
                                         rdoq=cfg.rdoq, **kw)

        def filters(y, u, v, ry, ru, rv, bs_v, bs_h, bs_rep):
            if cfg.deblocking_enabled:
                ry, ru, rv = deblock_frame(ry, ru, rv, qp, spacing=8,
                                           bs_v=bs_v, bs_h=bs_h,
                                           chroma_every=2, bs_rep=bs_rep)
            sao = None
            if cfg.sao_enabled:
                t_l, aux_l, off_l, _ = sao_decide(y, ry, lam, ctb=cfg.ctb_size)
                t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                    u, ru, v, rv, lam, ctb=cfg.ctb_size // 2)
                sao = (t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr)
                ry = sao_apply(ry, t_l, aux_l, off_l, ctb=cfg.ctb_size)
                ru = sao_apply(ru, t_c, aux_cb, off_cb, ctb=cfg.ctb_size // 2)
                rv = sao_apply(rv, t_c, aux_cr, off_cr, ctb=cfg.ctb_size // 2)
            return (ry, ru, rv), sao

        # bs_rep mirrors Encoder's quad64 calls: intra bs maps are on the
        # 8-grid (deblock_frame default rep), P maps are 4-px segments
        fns = (jax.jit(jax.vmap(dev_i)), jax.jit(jax.vmap(dev_p)),
               jax.jit(jax.vmap(functools.partial(filters, bs_rep=0))),
               jax.jit(jax.vmap(functools.partial(filters, bs_rep=4))))
        self._jits[key] = fns
        return fns

    def _trees_bs_i(self, dev_np, k: int):
        """Host stage per segment (intra): trees + deblock bs maps.
        dev_np: the batched device outputs already materialized to numpy."""
        from ..encoder.cu32 import quad_bs_maps
        from ..encoder.frame_intra64 import quad_trees_from_device64

        cfg = self.cfg
        dev = {key: val[k] for key, val in dev_np.items()}
        trees = quad_trees_from_device64(dev, cfg.width, cfg.height)
        bv = bh = None
        if cfg.deblocking_enabled:
            bv, bh = quad_bs_maps(trees, cfg.width, cfg.height, cfg.ctb_log2)
        return trees, bv, bh, None

    def _trees_bs_p(self, dev_np, k: int):
        """Host stage per segment (P): trees, bs maps, TMVP col publish.
        dev_np: the batched device outputs already materialized to numpy."""
        from ..encoder.frame_inter32 import (quad_p_bs_maps,
                                             quad_p_cell_maps)
        from ..encoder.frame_inter64 import quad_p64_trees_from_device

        cfg = self.cfg
        dev = {key: val[k] for key, val in dev_np.items()}
        trees = quad_p64_trees_from_device(dev, cfg.width, cfg.height)
        bv = bh = col = None
        if cfg.deblocking_enabled or cfg.temporal_mvp:
            mv4, inter4, cbf4 = quad_p_cell_maps(trees, cfg.width, cfg.height,
                                                 ctb=cfg.ctb_size)
            if cfg.deblocking_enabled:
                bv, bh = quad_p_bs_maps(trees, mv4, inter4, cbf4, cfg.width,
                                        cfg.height, ctb=cfg.ctb_size)
            if cfg.temporal_mvp:
                col = (np.ascontiguousarray(mv4[::4, ::4].reshape(-1, 2)),
                       np.ascontiguousarray(inter4[::4, ::4].reshape(-1)))
        return trees, bv, bh, col

    def _entropy64(self, enc: Encoder, kind: str, trees, sao_b, recon_b,
                   k: int, poc: int, first: bool):
        from ..entropy.slice_data import SaoState

        cfg = self.cfg
        sao_state = None
        if sao_b is not None:
            t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr = (
                np.asarray(x[k]) for x in sao_b)
            sao_state = SaoState(
                cfg.ctbs_w, cfg.ctbs_h,
                typ=np.stack([t_l, t_c, t_c]),
                aux=np.stack([aux_l, aux_cb, aux_cr]),
                offs=np.stack([off_l, off_cb, off_cr]),
            )
        ctx = {"kind": kind, "out": {"trees": trees}, "qp": cfg.qp,
               "first": first, "poc": poc, "flat_map": None,
               "sao_state": sao_state, "recon": tuple(r[k] for r in recon_b)}
        return enc.encode_frame_entropy(ctx, materialize_recon=False)[0]

    def _encode_quad64(self, frames) -> bytes:
        """The quad64 production combo, B closed GOPs per device dispatch;
        byte-identical to a sequential Encoder(vps_period=1) run."""
        cfg = self.cfg
        g = self.gop_size
        n16 = (cfg.width // 16) * (cfg.height // 16)
        segs = [frames[i:i + g] for i in range(0, len(frames), g)]
        streams: list[bytes] = [b""] * len(segs)
        enc = Encoder(cfg, intra_period=g, vps_period=1)
        pool = ThreadPoolExecutor(max_workers=self.workers)

        def stack_t(chunk, t):
            pick = lambda k, p: jnp.asarray(
                chunk[k][t][p] if t < len(chunk[k]) else chunk[k][-1][p])
            return (jnp.stack([pick(k, 0) for k in range(len(chunk))]),
                    jnp.stack([pick(k, 1) for k in range(len(chunk))]),
                    jnp.stack([pick(k, 2) for k in range(len(chunk))]))

        try:
            for s0 in range(0, len(segs), self.batch):
                chunk = segs[s0:s0 + self.batch]
                b = len(chunk)
                dev_i, dev_p, filt_i, filt_p = self._fns64(b)
                depth = max(len(seg) for seg in chunk)
                ys, us, vs = stack_t(chunk, 0)
                dev = dev_i(ys, us, vs)
                recon_pre = (dev["recon_y"], dev["recon_u"], dev["recon_v"])
                dev_np = jax.device_get(dev)
                tb = list(pool.map(
                    lambda k: self._trees_bs_i(dev_np, k), range(b)))
                bs_args = ()
                if cfg.deblocking_enabled:
                    bs_args = (jnp.stack([jnp.asarray(t[1]) for t in tb]),
                               jnp.stack([jnp.asarray(t[2]) for t in tb]))
                else:
                    z = jnp.zeros((b, 1, 1), jnp.int32)
                    bs_args = (z, z)
                recon, sao = filt_i(ys, us, vs, *recon_pre, *bs_args)
                futs = {}
                for k in range(b):
                    futs[(0, k)] = pool.submit(
                        self._entropy64, enc, "quad", tb[k][0], sao, recon,
                        k, 0, True)
                col_mv = jnp.zeros((b, n16, 2), jnp.int32)
                col_if = jnp.zeros((b, n16), jnp.int32)
                for t in range(1, depth):
                    idx = [k for k in range(b) if t < len(chunk[k])]
                    ys, us, vs = stack_t(chunk, t)
                    dev = dev_p(ys, us, vs, *recon, col_mv, col_if)
                    recon_pre = (dev["recon_y"], dev["recon_u"],
                                 dev["recon_v"])
                    dev_np = jax.device_get(dev)
                    tb = list(pool.map(
                        lambda k: self._trees_bs_p(dev_np, k), range(b)))
                    if cfg.deblocking_enabled:
                        bs_args = (jnp.stack([jnp.asarray(t_[1]) for t_ in tb]),
                                   jnp.stack([jnp.asarray(t_[2]) for t_ in tb]))
                    else:
                        z = jnp.zeros((b, 1, 1), jnp.int32)
                        bs_args = (z, z)
                    recon, sao = filt_p(ys, us, vs, *recon_pre, *bs_args)
                    if cfg.temporal_mvp:
                        col_mv = jnp.stack(
                            [jnp.asarray(t_[3][0]) for t_ in tb])
                        col_if = jnp.stack(
                            [jnp.asarray(t_[3][1]) for t_ in tb])
                    for k in idx:
                        futs[(t, k)] = pool.submit(
                            self._entropy64, enc, "quad_p", tb[k][0], sao,
                            recon, k, t, False)
                for k in range(b):
                    parts = [futs[(t, k)].result()
                             for t in range(len(chunk[k]))]
                    streams[s0 + k] = b"".join(parts)
        finally:
            pool.shutdown(wait=True)
        return b"".join(streams)

    def _entropy(self, enc: Encoder, kind: str, out_b, sao_b, recon_b, k: int,
                 poc: int, first: bool):
        """Build the per-segment ctx Encoder.encode_frame_entropy expects."""
        from ..entropy.slice_data import SaoState

        cfg = self.cfg
        take = lambda a: np.asarray(a[k])
        out = {key: take(val) for key, val in out_b.items()}
        sao_state = None
        if sao_b is not None:
            t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr = (
                np.asarray(x[k]) for x in sao_b)
            sao_state = SaoState(
                cfg.ctbs_w, cfg.ctbs_h,
                typ=np.stack([t_l, t_c, t_c]),
                aux=np.stack([aux_l, aux_cb, aux_cr]),
                offs=np.stack([off_l, off_cb, off_cr]),
            )
        ctx = {"kind": kind, "out": out, "qp": cfg.qp, "first": first,
               "poc": poc, "flat_map": None, "sao_state": sao_state,
               "recon": tuple(r[k] for r in recon_b)}
        return enc.encode_frame_entropy(ctx, materialize_recon=False)[0]

    def encode(self, frames) -> bytes:
        """frames: list of (y, u, v) numpy arrays.  Returns Annex-B bytes
        byte-identical to a sequential Encoder(vps_period=1) run."""
        if self.quad64:
            return self._encode_quad64(frames)
        g = self.gop_size
        segs = [frames[i:i + g] for i in range(0, len(frames), g)]
        streams: list[bytes] = [b""] * len(segs)
        enc = Encoder(self.cfg, intra_period=g, vps_period=1)
        pool = ThreadPoolExecutor(max_workers=self.workers)
        try:
            for s0 in range(0, len(segs), self.batch):
                chunk = segs[s0:s0 + self.batch]
                b = len(chunk)
                step_i, step_p = self._fns(b)
                depth = max(len(seg) for seg in chunk)
                # IDR step (every segment starts with one)
                ys = jnp.stack([jnp.asarray(seg[0][0]) for seg in chunk])
                us = jnp.stack([jnp.asarray(seg[0][1]) for seg in chunk])
                vs = jnp.stack([jnp.asarray(seg[0][2]) for seg in chunk])
                out, recon, sao = step_i(ys, us, vs)
                futs = {}
                for k in range(b):
                    futs[(0, k)] = pool.submit(
                        self._entropy, enc, "idr", out, sao, recon, k, 0, True)
                for t in range(1, depth):
                    idx = [k for k in range(b) if t < len(chunk[k])]
                    ys = jnp.stack([
                        jnp.asarray(chunk[k][t][0]) if t < len(chunk[k])
                        else jnp.asarray(chunk[k][-1][0]) for k in range(b)])
                    us = jnp.stack([
                        jnp.asarray(chunk[k][t][1]) if t < len(chunk[k])
                        else jnp.asarray(chunk[k][-1][1]) for k in range(b)])
                    vs = jnp.stack([
                        jnp.asarray(chunk[k][t][2]) if t < len(chunk[k])
                        else jnp.asarray(chunk[k][-1][2]) for k in range(b)])
                    out, recon, sao = step_p(ys, us, vs, *recon)
                    for k in idx:
                        futs[(t, k)] = pool.submit(
                            self._entropy, enc, "p", out, sao, recon, k, t,
                            False)
                for k in range(b):
                    parts = [futs[(t, k)].result()
                             for t in range(len(chunk[k]))]
                    streams[s0 + k] = b"".join(parts)
        finally:
            pool.shutdown(wait=True)
        return b"".join(streams)
