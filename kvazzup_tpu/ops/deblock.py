"""In-loop deblocking filter (H.265 8.7.2), full-frame vectorized.

Intra prediction reads reconstructed samples *before* in-loop filtering, so
deblocking is a pure post-pass over the picture: all vertical edges filtered
first, then all horizontal edges on the result — each as one batched VPU
expression over (edges x lines).  This replaces kvazaar's per-CTU `filter.c`
job with two dense passes (Reconstruction group,
dependencies/kvazaar_CMakeLists.txt:207-218).

Boundary strength: with the current CU == TU == PU == spacing tool-set, bS
is uniform along each block edge — bS maps are (edge, block) arrays
(2 on intra edges, 1 on cbf/MV-discontinuity inter edges, else 0; 8.7.2.4).
All-intra callers pass None (every edge bS = 2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Table 8-12 (beta') and tc' — spec constants
BETA_TABLE = np.array(
    [0] * 16
    + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28,
       30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64],
    dtype=np.int32,
)
TC_TABLE = np.array(
    [0] * 18
    + [1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5,
       6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24],
    dtype=np.int32,
)


def compute_bs(ctype, cbf_y, mvs, cw: int, ch: int):
    """Per-edge boundary strengths for the uniform-CU tool-set (8.7.2.4).

    ctype: (nctu,) with 0 == intra; cbf_y: (nctu,) bool; mvs: (nctu, 2).
    Returns (bs_v (cw-1, ch), bs_h (ch-1, cw)) int32 in {0, 1, 2}.
    """
    is_intra = (ctype == 0).reshape(ch, cw)
    cbf = cbf_y.reshape(ch, cw)
    mv = mvs.reshape(ch, cw, 2)

    def pair_bs(ia, ib, ca, cb, ma, mb):
        intra_edge = ia | ib
        cbf_edge = ca | cb
        mv_edge = jnp.any(jnp.abs(ma - mb) >= 4, axis=-1)
        return jnp.where(intra_edge, 2, jnp.where(cbf_edge | mv_edge, 1, 0)).astype(jnp.int32)

    bs_v = pair_bs(
        is_intra[:, :-1], is_intra[:, 1:], cbf[:, :-1], cbf[:, 1:], mv[:, :-1], mv[:, 1:]
    ).T  # (cw-1, ch)
    bs_h = pair_bs(
        is_intra[:-1, :], is_intra[1:, :], cbf[:-1, :], cbf[1:, :], mv[:-1], mv[1:]
    )  # (ch-1, cw)
    return bs_v, bs_h


def compute_bs_b(ctype, cbf_y, pf, mvs, cw: int, ch: int):
    """Boundary strengths for B pictures (8.7.2.4 with two lists).

    pf: (nctu, 2) bool; mvs: (nctu, 2, 2).  With distinct L0/L1 reference
    pictures the MV pairing is fixed; differing prediction-flag patterns
    (different refs / MV counts) give bS = 1."""
    is_intra = (ctype == 0).reshape(ch, cw)
    cbf = cbf_y.reshape(ch, cw)
    pfm = pf.reshape(ch, cw, 2)
    mv = mvs.reshape(ch, cw, 2, 2)

    def pair_bs(sl_a, sl_b):
        ia, ib = is_intra[sl_a], is_intra[sl_b]
        ca, cb = cbf[sl_a], cbf[sl_b]
        pa, pb = pfm[sl_a], pfm[sl_b]
        ma, mb = mv[sl_a], mv[sl_b]
        diff_refs = jnp.any(pa != pb, axis=-1)
        used = pa[..., None]  # (..., 2, 1) gate per list
        mv_edge = jnp.any((jnp.abs(ma - mb) >= 4) & used, axis=(-2, -1))
        one = diff_refs | ca | cb | mv_edge
        return jnp.where(ia | ib, 2, jnp.where(one, 1, 0)).astype(jnp.int32)

    bs_v = pair_bs((slice(None), slice(None, -1)), (slice(None), slice(1, None))).T
    bs_h = pair_bs((slice(None, -1), slice(None)), (slice(1, None), slice(None)))
    return bs_v, bs_h


def _luma_edge_filter(s, beta, tc, gate, mx: int = 255):
    """Filter one batch of luma edge slabs.

    s: (E, L, 8) int32 — L filtering lines (multiple of 4), 8 samples
    across the edge [p3 p2 p1 p0 q0 q1 q2 q3].  tc: (E, L) per-line tc;
    gate: (E, L) bool (bS > 0).  Returns filtered slabs.
    """
    p3, p2, p1, p0 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    q0, q1, q2, q3 = s[..., 4], s[..., 5], s[..., 6], s[..., 7]

    shape4 = s.shape[:-2] + (s.shape[-2] // 4, 4)
    g = lambda x: x.reshape(shape4)  # group lines by 4
    gp2, gp1, gp0 = g(p2), g(p1), g(p0)
    gq0, gq1, gq2 = g(q0), g(q1), g(q2)
    gp3, gq3 = g(p3), g(q3)
    tc = jnp.broadcast_to(tc, s.shape[:-1])
    beta = g(jnp.broadcast_to(beta, s.shape[:-1]))[..., 0]  # per 4-line group
    tc_g = g(tc)[..., 0]
    gate_g = g(gate)[..., 0]

    dp = jnp.abs(gp2 - 2 * gp1 + gp0)  # (..., G, 4)
    dq = jnp.abs(gq2 - 2 * gq1 + gq0)
    dp0, dp3 = dp[..., 0], dp[..., 3]
    dq0, dq3 = dq[..., 0], dq[..., 3]
    d0 = dp0 + dq0
    d3 = dp3 + dq3
    d = d0 + d3
    filter_on = (d < beta) & gate_g  # (..., G)

    def strong_cond(i):
        ddp = dp[..., i]
        ddq = dq[..., i]
        c1 = 2 * (ddp + ddq) < (beta >> 2)
        c2 = jnp.abs(gp3[..., i] - gp0[..., i]) + jnp.abs(gq0[..., i] - gq3[..., i]) < (beta >> 3)
        c3 = jnp.abs(gp0[..., i] - gq0[..., i]) < ((5 * tc_g + 1) >> 1)
        return c1 & c2 & c3

    strong = strong_cond(0) & strong_cond(3)  # (..., G)
    up = lambda m: jnp.repeat(m, 4, axis=-1)  # (..., L)
    filter_on_l = up(filter_on)
    strong_l = up(strong)

    clip = lambda x, c: jnp.clip(x, -c, c)
    cl1 = lambda x: jnp.clip(x, 0, mx)

    # strong filter
    sp0 = p0 + clip(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0, 2 * tc)
    sp1 = p1 + clip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, 2 * tc)
    sp2 = p2 + clip(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2, 2 * tc)
    sq0 = q0 + clip(((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3) - q0, 2 * tc)
    sq1 = q1 + clip(((q2 + q1 + q0 + p0 + 2) >> 2) - q1, 2 * tc)
    sq2 = q2 + clip(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2, 2 * tc)

    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = jnp.abs(delta) < 10 * tc
    dlt = clip(delta, tc)
    wp0 = cl1(p0 + dlt)
    wq0 = cl1(q0 - dlt)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp = up((dp0 + dp3) < side_thresh)
    dEq = up((dq0 + dq3) < side_thresh)
    tc2 = tc >> 1
    dp1v = clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, tc2)
    dq1v = clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, tc2)
    wp1 = cl1(p1 + dp1v)
    wq1 = cl1(q1 + dq1v)

    weak_act = filter_on_l & ~strong_l & weak_on
    strong_act = filter_on_l & strong_l
    np0 = jnp.where(strong_act, cl1(sp0), jnp.where(weak_act, wp0, p0))
    nq0 = jnp.where(strong_act, cl1(sq0), jnp.where(weak_act, wq0, q0))
    np1 = jnp.where(strong_act, cl1(sp1), jnp.where(weak_act & dEp, wp1, p1))
    nq1 = jnp.where(strong_act, cl1(sq1), jnp.where(weak_act & dEq, wq1, q1))
    np2 = jnp.where(strong_act, cl1(sp2), p2)
    nq2 = jnp.where(strong_act, cl1(sq2), q2)

    return jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)


def _chroma_edge_filter(s, tc, gate, mx: int = 255):
    """Chroma filter (bS == 2 only): s: (E, L, 4) = [p1 p0 q0 q1]."""
    p1, p0, q0, q1 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    cl1 = lambda x: jnp.clip(x, 0, mx)
    np0 = jnp.where(gate, cl1(p0 + delta), p0)
    nq0 = jnp.where(gate, cl1(q0 - delta), q0)
    return jnp.stack([p1, np0, nq0, q1], axis=-1)


def _edge_positions(size: int, spacing: int) -> np.ndarray:
    return np.arange(spacing, size, spacing, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=(
    "spacing", "beta_offset", "tc_offset", "chroma_every", "bs_rep",
    "cb_qp_offset", "cr_qp_offset", "bd"))
def deblock_frame(
    y, u, v, qp, *, spacing: int = 16, beta_offset: int = 0, tc_offset: int = 0,
    bs_v=None, bs_h=None, qp_map=None, chroma_every: int = 1, bs_rep: int = 0,
    cb_qp_offset: int = 0, cr_qp_offset: int = 0, bd: int = 8,
):
    """Deblock one picture (per-edge bS maps, default all-2).

    y: (H, W) uint8/int32; u, v: (H/2, W/2).  bs_v: (n_v_edges, H/spacing),
    bs_h: (n_h_edges, W/spacing).  qp_map: optional (H/spacing, W/spacing)
    per-block QP (cu_qp_delta); beta/tc then use the edge-pair average
    (8.7.2.5 qP = (QpQ + QpP + 1) >> 1).  Returns filtered planes (uint8).
    """
    from ..core.tables import CHROMA_QP_TABLE

    qp = jnp.asarray(qp, jnp.int32)
    beta_tab = jnp.asarray(BETA_TABLE)
    tc_tab = jnp.asarray(TC_TABLE)
    chroma_tab = jnp.asarray(CHROMA_QP_TABLE)

    y32 = y.astype(jnp.int32)
    h, w = y32.shape

    def edge_qp(vertical: bool):
        """Per-(edge, block) average QP for luma edges; None -> scalar."""
        if qp_map is None:
            return None
        qm = jnp.asarray(qp_map, jnp.int32)
        if vertical:  # edges between columns: (cw-1, ch)
            return ((qm[:, :-1] + qm[:, 1:] + 1) >> 1).T
        return (qm[:-1, :] + qm[1:, :] + 1) >> 1  # (ch-1, cw)

    rep = bs_rep or spacing  # bS granularity along the edge (4 = spec segments)

    def luma_tc_gate(bs, eqp):
        """bs: (E, L/rep) -> per-line (E, L) beta, tc and gate."""
        bs_l = jnp.repeat(bs, rep, axis=1)
        q = qp if eqp is None else jnp.repeat(eqp, spacing, axis=1)
        beta_l = beta_tab[jnp.clip(q + (beta_offset << 1), 0, 51)] << (bd - 8)
        tc = tc_tab[jnp.clip(q + 2 * (jnp.maximum(bs_l, 1) - 1) + (tc_offset << 1), 0, 53)] << (bd - 8)
        return beta_l, tc, bs_l > 0

    # ---- vertical edges (filter across columns), whole picture at once
    xe = _edge_positions(w, spacing)
    if len(xe):
        bs = bs_v if bs_v is not None else jnp.full((len(xe), h // spacing), 2, jnp.int32)
        beta, tc, gate = luma_tc_gate(bs, edge_qp(True))
        cols = (xe[:, None] + np.arange(-4, 4)[None, :]).reshape(-1)  # (E*8,)
        slabs = y32[:, cols].reshape(h, len(xe), 8).transpose(1, 0, 2)  # (E, H, 8)
        out = _luma_edge_filter(slabs, beta, tc, gate, mx=(1 << bd) - 1)
        wcols = (xe[:, None] + np.arange(-3, 3)[None, :]).reshape(-1)
        y32 = y32.at[:, wcols].set(
            out[..., 1:7].transpose(1, 0, 2).reshape(h, len(xe) * 6)
        )

    # ---- horizontal edges on the vertically-filtered picture
    ye = _edge_positions(h, spacing)
    if len(ye):
        bs = bs_h if bs_h is not None else jnp.full((len(ye), w // spacing), 2, jnp.int32)
        beta, tc, gate = luma_tc_gate(bs, edge_qp(False))
        rows = (ye[:, None] + np.arange(-4, 4)[None, :]).reshape(-1)
        slabs = y32[rows, :].reshape(len(ye), 8, w).transpose(0, 2, 1)  # (E, W, 8)
        out = _luma_edge_filter(slabs, beta, tc, gate, mx=(1 << bd) - 1)
        wrows = (ye[:, None] + np.arange(-3, 3)[None, :]).reshape(-1)
        y32 = y32.at[wrows, :].set(
            out[..., 1:7].transpose(0, 2, 1).reshape(len(ye) * 6, w)
        )

    # ---- chroma (half resolution, edge spacing/2, [p1 p0 q0 q1]); bS==2 only
    # 8.7.2.5.5: QpC = ChromaQpTable[qP + cQpOffset], per component
    def chroma_tc(eqp, sp, c_off):
        if eqp is None:
            qpc = chroma_tab[jnp.clip(qp + c_off, 0, 57)]
            return tc_tab[jnp.clip(qpc + 2 + (tc_offset << 1), 0, 53)] << (bd - 8)
        qpc_e = chroma_tab[jnp.clip(eqp + c_off, 0, 57)]
        return jnp.repeat(
            tc_tab[jnp.clip(qpc_e + 2 + (tc_offset << 1), 0, 53)], sp, axis=1) << (bd - 8)

    def chroma_plane(c, c_off):
        c32 = c.astype(jnp.int32)
        ch_, cw_ = c32.shape
        sp = spacing // 2
        # chroma filters only edges on the chroma 8-sample grid (8.7.2.5.5):
        # with spacing 8 (CU8 frames) that is every SECOND luma-8 edge
        def on_grid(n_edges):
            return jnp.asarray((np.arange(n_edges) + 1) % chroma_every == 0)[:, None]
        xe = _edge_positions(cw_, sp)
        if len(xe):
            bs = bs_v if bs_v is not None else jnp.full((len(xe), ch_ // sp), 2, jnp.int32)
            if rep != spacing:  # 4-granular bS: max over the luma pair per sp
                bs = jnp.maximum(bs[:, 0::2], bs[:, 1::2])
            gate = jnp.repeat((bs == 2) & on_grid(len(xe)), sp, axis=1)
            cols = (xe[:, None] + np.arange(-2, 2)[None, :]).reshape(-1)
            slabs = c32[:, cols].reshape(ch_, len(xe), 4).transpose(1, 0, 2)
            out = _chroma_edge_filter(slabs, chroma_tc(edge_qp(True), sp, c_off), gate, mx=(1 << bd) - 1)
            wcols = (xe[:, None] + np.arange(-1, 1)[None, :]).reshape(-1)
            c32 = c32.at[:, wcols].set(out[..., 1:3].transpose(1, 0, 2).reshape(ch_, len(xe) * 2))
        ye = _edge_positions(ch_, sp)
        if len(ye):
            bs = bs_h if bs_h is not None else jnp.full((len(ye), cw_ // sp), 2, jnp.int32)
            if rep != spacing:
                bs = jnp.maximum(bs[:, 0::2], bs[:, 1::2])
            gate = jnp.repeat((bs == 2) & on_grid(len(ye)), sp, axis=1)
            rows = (ye[:, None] + np.arange(-2, 2)[None, :]).reshape(-1)
            slabs = c32[rows, :].reshape(len(ye), 4, cw_).transpose(0, 2, 1)
            out = _chroma_edge_filter(slabs, chroma_tc(edge_qp(False), sp, c_off), gate, mx=(1 << bd) - 1)
            wrows = (ye[:, None] + np.arange(-1, 1)[None, :]).reshape(-1)
            c32 = c32.at[wrows, :].set(out[..., 1:3].transpose(0, 2, 1).reshape(len(ye) * 2, cw_))
        return c32.astype(jnp.uint8 if bd == 8 else jnp.uint16)

    return (y32.astype(jnp.uint8 if bd == 8 else jnp.uint16),
            chroma_plane(u, cb_qp_offset), chroma_plane(v, cr_qp_offset))


def bs_maps_cu8(split, cw: int, ch: int):
    """bS maps at 8-pel spacing for an intra CU8-quadtree picture.

    Edges on the 16 (CTB) grid are always CU boundaries (bS 2, 8.7.2.4);
    the interior 8-edges of a CTB are boundaries only when it is split.
    split: (nctu,) 0/1.  Returns (bs_v (2cw-1, 2ch), bs_h (2ch-1, 2cw)).
    """
    sp = np.asarray(split, np.int32).reshape(ch, cw)
    bs_v = np.zeros((2 * cw - 1, 2 * ch), np.int32)
    for e in range(2 * cw - 1):
        if e % 2 == 1:  # x = 16, 32, ... : CTB boundary
            bs_v[e, :] = 2
        else:  # x = 8, 24, ... inside CTB column e // 2
            col = sp[:, e // 2]  # (ch,)
            bs_v[e, :] = 2 * np.repeat(col, 2)
    bs_h = np.zeros((2 * ch - 1, 2 * cw), np.int32)
    for e in range(2 * ch - 1):
        if e % 2 == 1:
            bs_h[e, :] = 2
        else:
            row = sp[e // 2, :]
            bs_h[e, :] = 2 * np.repeat(row, 2)
    return jnp.asarray(bs_v), jnp.asarray(bs_h)
