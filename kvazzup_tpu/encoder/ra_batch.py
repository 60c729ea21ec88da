"""Level-batched RA B-pyramid: the "halve steps, double lanes" wavefront
restructure for the production RA operating point (VERDICT r3 asks #3/#6).

The hierarchical mini-GOP is a dependency DAG, not a chain: within a gop8
(decode order P8, B4, B2, B1, B3, B6, B5, B7 — encoder/ra.py _GOP8), B2
and B6 depend only on anchors {0,4,8}, and all four layer-3 pictures
{B1,B3,B5,B7} depend only on {0,2,4,6,8}.  Each such level shares one
temporal layer (equal QP offset) and equal POC deltas, so the whole level
runs as ONE vmapped wavefront dispatch: the 62-wave 1080p scan executes
with 2x/4x the lanes instead of 2x/4x the sequential steps.  A gop8's
device critical path drops from 8 frame scans to 4 (P8, B4, {B2,B6},
{B1,B3,B5,B7}).

Output is BYTE-IDENTICAL to QuadRAEncoder: vmap batches the same integer
ops (and the same HIGHEST-precision matmuls) per lane, the per-frame
trees/loop-filter/entropy tail is literally shared (_finish_b), and NAL
emission stays in decode order.  Pinned by tests/test_ra_batch.py.

The reference analogue is kvazaar's OWF "frames in flight"
(/root/reference/src/media/processing/kvazaarfilter.cpp:193,299) — here
the in-flight frames ride the same SIMD dispatch instead of a thread
pool.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ra import QuadRAEncoder


class QuadRABatchEncoder(QuadRAEncoder):
    """QuadRAEncoder with same-level B pictures batched through one
    vmapped device dispatch.  Same API, byte-identical streams."""

    # schedule indices (into _GOP8/_GOP4) forming batchable levels: equal
    # temporal layer, equal (poc-l0, poc-l1), references all coded by the
    # time the level's first entry appears in decode order.
    _LEVELS = {8: ((2, 5), (3, 4, 6, 7)), 4: ((2, 3),)}

    def __init__(self, cfg, gop_size: int = 8, intra_period: int = 32,
                 cutree: float | None = None):
        super().__init__(cfg, gop_size, intra_period, cutree=cutree)
        self._bjits: dict = {}

    # ------------------------------------------------------------ batching
    def _bfns(self, b: int, with_map: bool, lam_scale: float = 1.0):
        key = (b, with_map, lam_scale)
        if key in self._bjits:
            return self._bjits[key]
        cfg = self.cfg
        from .frame_b64 import encode_frame_b64_fast

        def run(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, qp, deltas):
            return encode_frame_b64_fast(
                y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, qp, deltas,
                width=cfg.width, height=cfg.height,
                merge_cand=cfg.merge_cand, rdoq=cfg.rdoq,
                lam_scale=lam_scale)

        in_axes = (0,) * 9 + (0 if with_map else None, None)
        fn = jax.jit(jax.vmap(run, in_axes=in_axes))
        self._bjits[key] = fn
        return fn

    def _code_b_level(self, items, qp):
        """items: [(frame, poc, p0, p1, layer, rps, qp_map)] with equal
        layer and POC deltas.  One vmapped scan, then the shared
        per-frame finish tail in list order."""
        layer = items[0][4]
        eff = [self._qp_eff(qp, it[6], layer) for it in items]
        with_map = any(fl is not None for (_, _, fl) in eff)
        st = lambda xs: jnp.stack([jnp.asarray(x) for x in xs])
        ys = st([it[0][0] for it in items])
        us = st([it[0][1] for it in items])
        vs = st([it[0][2] for it in items])
        r0 = [self._dpb[it[2]] for it in items]
        r1 = [self._dpb[it[3]] for it in items]
        if with_map:
            nctb = self.cfg.ctbs_w * self.cfg.ctbs_h
            qarg = st([fl if fl is not None else np.full(nctb, q, np.int32)
                       for (q, _, fl) in eff])
        else:
            qarg = jnp.asarray(eff[0][0], jnp.int32)
        deltas = jnp.asarray([items[0][1] - items[0][2],
                              items[0][1] - items[0][3]], jnp.int32)
        dev = self._bfns(len(items), with_map, self.blam[layer])(
            ys, us, vs,
            st([r[0] for r in r0]), st([r[1] for r in r0]),
            st([r[2] for r in r0]),
            st([r[0] for r in r1]), st([r[1] for r in r1]),
            st([r[2] for r in r1]), qarg, deltas)
        dev_np = jax.device_get(dev)
        outs = []
        for k, (f, poc, p0, p1, lay, rps, qmap) in enumerate(items):
            devk = {key: val[k] for key, val in dev_np.items()}
            outs.append(self._finish_b(f, devk, poc, eff[k][0], eff[k][2],
                                       rps))
        return outs

    # ------------------------------------------------------- group driver
    def _code_group(self, qp):
        a0 = self._anchor_poc
        frames = self._lookahead_frames(self._pending, qp)
        self._pending = []
        sched = self.sched
        level_of = {i: lvl for lvl in self._LEVELS[self.gop_size]
                    for i in lvl}
        results: dict = {}
        done: set = set()
        for i, (off, l0, l1, layer, neg, pos) in enumerate(sched):
            if i in done:
                continue
            f, qmap = frames[off - 1]
            poc = a0 + off
            if l1 is None:
                if poc % self.intra_period == 0:
                    results[i] = self._code_i(
                        f, poc, idr=False, qp=qp,
                        rps=(((-self.gop_size, 0),), ()), qp_map=qmap)
                else:
                    results[i] = self._code_p(f, poc, ref_poc=a0, layer=layer,
                                              rps=(neg, pos), qp=qp,
                                              qp_map=qmap)
                done.add(i)
            elif i in level_of:
                lvl = level_of[i]
                items = []
                for j in lvl:
                    off_j, l0j, l1j, layer_j, neg_j, pos_j = sched[j]
                    items.append((frames[off_j - 1][0], a0 + off_j,
                                  a0 + l0j, a0 + l1j, layer_j,
                                  (neg_j, pos_j), frames[off_j - 1][1]))
                for j, r in zip(lvl, self._code_b_level(items, qp)):
                    results[j] = r
                done.update(lvl)
            else:
                results[i] = self._code_b(f, poc, a0 + l0, a0 + l1, layer,
                                          (neg, pos), qp, qp_map=qmap)
                done.add(i)
        # emission stays in decode order; pruning replays the sequential
        # order (deletions only — byte stream unaffected)
        out = [results[i] for i in range(len(sched))]
        for (off, l0, l1, layer, neg, pos) in sched:
            self._prune_dpb(a0 + off, (neg, pos))
        self._anchor_poc = a0 + self.gop_size
        return out
