"""CU-tree temporal lookahead for the RA B-pyramid (per-CTB adaptive QP).

The standing BD gap vs x265 medium (BENCH_NOTES) is partly x265's
lookahead cu-tree: blocks that future pictures predict FROM get their QP
lowered, concentrating rate where it propagates through the pyramid.
The reference stack has the same per-CTU QP surface (RoiMap ->
kvazaarfilter.cpp:423-431); here the tree is computed from the mini-GOP
the RA encoder already buffers (encoder/ra.py) and delivered through the
existing qp_map x RA path — a pure DECISION-layer feature: streams stay
spec-valid and oracle-exact by construction.

Per buffered mini-GOP (display order 1..G, plus the previous anchor's
source at display offset 0):
  1. dense per-16x16 costs on device: orig-boundary intra SATD
     (_cost_prepass_grid) and per-reference motion SAD (ops/me.py
     motion_search) — MXU-batched, two compiles per stream shape;
  2. reverse-decode-order propagation on host (numpy over ~8k blocks):
     amount = (intra + prop_in) * clip(1 - inter/intra, 0, 1), split
     over the picture's in-group references and splatted bilinearly at
     the motion vector (the x264/x265 cu-tree recurrence);
  3. per-CTB QP offsets: -strength * log2((intra + prop)/intra),
     averaged over the CTB's 16-blocks, clipped to [-max_cut, 0].

Outgoing propagation to the previous anchor (display offset 0, already
emitted) is dropped; the new anchor P_G — the most-referenced picture of
the group and of the NEXT group's Bs — receives the deepest cuts.
Enabled with KVZ_TPU_RA_CUTREE=<strength> (needs cfg.cu_qp_delta);
calibrated by tools/ra_tune.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# inter SAD -> SATD-domain correction: the intra costs are Hadamard-SATD
# while motion_search reports SAD at the chosen MV; the Hadamard transform
# of typical residual inflates the L1 norm by ~1.5x.  The cu-tree strength
# knob absorbs the residual mismatch (tools/ra_tune.py).
SAD_TO_SATD = 1.5


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _la_intra_cost(y, qp, *, width: int, height: int):
    """Per-16x16 orig-boundary intra SATD+bits cost grid (float32)."""
    from .frame_intra import to_blocks
    from .frame_inter32 import _cost_prepass_grid

    yi = y.astype(jnp.int32)
    oy16 = to_blocks(yi, 16)
    qpf = jnp.asarray(qp, jnp.float32)
    lam = jnp.sqrt(0.57 * 2.0 ** ((qpf - 12.0) / 3.0))
    _, icost = _cost_prepass_grid(yi, oy16, jnp.asarray(qp, jnp.int32), lam,
                                  log2=4, cw=width // 16, ch=height // 16)
    return icost


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _la_me(y, ref, lam_x1k, *, width: int, height: int):
    from ..ops.me import motion_search

    return motion_search(y, ref, lam_x1k, block=16, search_range=16,
                         width=width, height=height)


def _splat(dst, mv_qpel, amount, cw16: int, ch16: int):
    """Bilinear-splat `amount` into dst (flat (nb,)) at the motion-shifted
    block positions (the cu-tree propagate step)."""
    nb = cw16 * ch16
    bx = np.arange(nb, dtype=np.float64) % cw16
    by = np.arange(nb, dtype=np.float64) // cw16
    px = bx + mv_qpel[:, 0].astype(np.float64) / 64.0   # qpel/4 / 16px
    py = by + mv_qpel[:, 1].astype(np.float64) / 64.0
    x0 = np.floor(px).astype(np.int64)
    y0 = np.floor(py).astype(np.int64)
    fx = px - x0
    fy = py - y0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
        xi = np.clip(x0 + dx, 0, cw16 - 1)
        yi = np.clip(y0 + dy, 0, ch16 - 1)
        np.add.at(dst, yi * cw16 + xi, amount * w)


def cutree_offsets(frames, prev_anchor_y, sched, base_qp: int, *,
                   width: int, height: int, strength: float,
                   ctb: int = 64, max_cut: int = 6):
    """Per-picture CTB QP-offset grids for one buffered mini-GOP.

    frames: display-order [(y, u, v)] (offsets 1..G, coded-size planes);
    prev_anchor_y: display-offset-0 source luma or None; sched: the
    encoder's _GOP4/_GOP8 schedule (decode order).  Returns
    {display_offset: (ctbs_h, ctbs_w) int32 offsets <= 0}."""
    cw16, ch16 = width // 16, height // 16
    nb = cw16 * ch16
    lam_x1k = jnp.asarray(
        int(np.sqrt(0.57 * 2.0 ** ((base_qp - 12) / 3.0)) * 1024), jnp.int32)

    def yplane(off):
        if off == 0:
            return prev_anchor_y
        return frames[off - 1][0]

    icost = {}
    me = {}
    for (off, l0, l1, _layer, _neg, _pos) in sched:
        yj = jnp.asarray(yplane(off))
        icost[off] = np.maximum(np.asarray(
            _la_intra_cost(yj, base_qp, width=width, height=height),
            np.float64), 1.0)
        for r in (l0, l1):
            if r is None or (r == 0 and prev_anchor_y is None):
                continue
            mv, sad = _la_me(yj, jnp.asarray(yplane(r)), lam_x1k,
                             width=width, height=height)
            me[(off, r)] = (np.asarray(mv), np.asarray(sad, np.float64))

    prop = {off: np.zeros(nb) for (off, *_rest) in sched}
    for (off, l0, l1, _layer, _neg, _pos) in reversed(sched):
        refs = [r for r in (l0, l1) if r is not None]
        costs = [me[(off, r)][1] for r in refs if (off, r) in me]
        if not costs:
            continue
        inter = np.minimum.reduce(costs) * SAD_TO_SATD
        frac = np.clip(1.0 - inter / icost[off], 0.0, 1.0)
        amount = (icost[off] + prop[off]) * frac
        w = 1.0 / len(refs)
        for r in refs:
            if r == 0 or (off, r) not in me:
                continue  # previous anchor is already emitted
            _splat(prop[r], me[(off, r)][0], amount * w, cw16, ch16)

    bpc = ctb // 16  # 16-blocks per CTB side
    cwc, chc = width // ctb, height // ctb
    out = {}
    for off in prop:
        off16 = -strength * np.log2(1.0 + prop[off] / icost[off])
        g = off16.reshape(ch16, cw16)
        g = g.reshape(chc, bpc, cwc, bpc).mean(axis=(1, 3))
        out[off] = np.clip(np.rint(g), -max_cut, 0).astype(np.int32)
    return out
