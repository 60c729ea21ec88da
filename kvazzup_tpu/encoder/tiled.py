"""Tile-column frame encoding: the spatial multi-chip axis, e2e conformant.

HEVC tiles (kvazaar `--tiles`, wired in the reference through
/root/reference/src/media/processing/kvazaarfilter.cpp:193-202) split the
picture into independently-predicted, independently-entropy-coded CTU
rectangles.  That independence is exactly a shard: each tile column is
encoded as a stand-alone strip by the same wavefront kernel
(`encode_frame_intra` at strip width — intra prediction never sees across
the strip edge, which IS the tile-boundary availability rule), so the
device work maps 1:1 onto a `Mesh` "tile" axis with zero halo exchange.

Host side re-indexes strip-raster CTU arrays into picture raster and
emits one CABAC substream per tile with entry-point offsets
(entropy/slice_data.py `encode_slice_data_intra_tiles`).  Deblocking runs
on the assembled picture: the PPS sets
loop_filter_across_tiles_enabled_flag = 1, so filtering tile-boundary
edges is normative (8.7.2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..entropy.slice_data import tile_grid
from .frame_intra import encode_frame_intra


def strip_to_raster(per_ctu: np.ndarray, cols, tile_idx: int, cw: int, ch: int,
                    out: np.ndarray) -> None:
    """Scatter a strip's CTU-major array into the picture-raster array."""
    x0, x1 = cols[tile_idx]
    cwt = x1 - x0
    for r in range(ch):
        out[r * cw + x0 : r * cw + x1] = per_ctu[r * cwt : (r + 1) * cwt]


def raster_to_strip(per_ctu: np.ndarray, cols, tile_idx: int, cw: int, ch: int) -> np.ndarray:
    x0, x1 = cols[tile_idx]
    rows = [per_ctu[r * cw + x0 : r * cw + x1] for r in range(ch)]
    return np.concatenate(rows, axis=0)


def encode_frame_intra_tiles(cfg, y, u, v, qp: int, *, rdoq: bool = False,
                             qp_map=None):
    """Encode one intra frame as `cfg.tile_cols` independent tile columns.

    qp_map: flat per-CTU picture-raster QP grid (cu_qp_delta) — each strip
    gets its tile-raster slice as the wave's per-CTU QP vector.
    Returns picture-raster {mode, lev_y, lev_cb, lev_cr, recon_y/u/v}
    exactly like `encode_frame_intra`, ready for the tile entropy coder.
    """
    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, cfg.tile_cols)
    nctu = cw * ch
    mode = np.zeros(nctu, np.int32)
    lev_y = np.zeros((nctu, n, n), np.int32)
    lev_cb = np.zeros((nctu, n // 2, n // 2), np.int32)
    lev_cr = np.zeros((nctu, n // 2, n // 2), np.int32)
    ry_parts, ru_parts, rv_parts = [], [], []
    for t, (x0, x1) in enumerate(cols):
        px0, px1 = x0 * n, x1 * n
        strip_qp = (qp if qp_map is None else
                    jnp.asarray(raster_to_strip(qp_map, cols, t, cw, ch)))
        out = encode_frame_intra(
            jnp.asarray(y[:, px0:px1]), jnp.asarray(u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(v[:, px0 // 2 : px1 // 2]), strip_qp,
            width=px1 - px0, height=cfg.height, rdoq=rdoq,
        )
        strip_to_raster(np.asarray(out["mode"]), cols, t, cw, ch, mode)
        strip_to_raster(np.asarray(out["lev_y"]), cols, t, cw, ch, lev_y)
        strip_to_raster(np.asarray(out["lev_cb"]), cols, t, cw, ch, lev_cb)
        strip_to_raster(np.asarray(out["lev_cr"]), cols, t, cw, ch, lev_cr)
        ry_parts.append(out["recon_y"])
        ru_parts.append(out["recon_u"])
        rv_parts.append(out["recon_v"])
    return {
        "mode": mode, "lev_y": lev_y, "lev_cb": lev_cb, "lev_cr": lev_cr,
        "recon_y": jnp.concatenate(ry_parts, axis=1),
        "recon_u": jnp.concatenate(ru_parts, axis=1),
        "recon_v": jnp.concatenate(rv_parts, axis=1),
    }


def encode_frame_p_tiles(cfg, y, u, v, ref_y, ref_u, ref_v, qp: int, *,
                         rdoq: bool = False, qp_map=None):
    """Low-delay P frame as independent motion-constrained tile columns
    (kvazaar `--mv-constraint frametile`, kvazaarfilter.cpp:246-276).

    Each strip runs the dense-decision P wavefront on its own view of the
    reference picture with horizontal MV bounds (ops/me.mv_valid_x), so MC
    never reads across a tile boundary — the decoder, which MCs from the
    full reference frame, sees identical predictions.  Loop filtering is
    NOT applied here: the caller deblocks the assembled picture
    (loop_filter_across_tiles_enabled_flag = 1 semantics) exactly like the
    untiled path, which is also what the sharded version reproduces with
    its ppermute halo exchange (parallel/tiles_p.py).

    Returns picture-raster arrays shaped like `encode_frame_p_fast`."""
    from .frame_inter import encode_frame_p_fast

    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, cfg.tile_cols)
    nctu = cw * ch
    ctype = np.zeros(nctu, np.int32)
    imode = np.zeros(nctu, np.int32)
    mv = np.zeros((nctu, 2), np.int32)
    mvp_flag = np.zeros(nctu, np.int32)
    mvd = np.zeros((nctu, 2), np.int32)
    merge_idx = np.zeros(nctu, np.int32)
    lev_y = np.zeros((nctu, n, n), np.int32)
    lev_cb = np.zeros((nctu, n // 2, n // 2), np.int32)
    lev_cr = np.zeros((nctu, n // 2, n // 2), np.int32)
    ry_parts, ru_parts, rv_parts = [], [], []
    n_tiles = len(cols)
    for t, (x0, x1) in enumerate(cols):
        px0, px1 = x0 * n, x1 * n
        xtile = (t > 0, t < n_tiles - 1)
        strip_qp = (qp if qp_map is None else
                    jnp.asarray(raster_to_strip(qp_map, cols, t, cw, ch)))
        out = encode_frame_p_fast(
            jnp.asarray(y[:, px0:px1]), jnp.asarray(u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(v[:, px0 // 2 : px1 // 2]),
            jnp.asarray(ref_y[:, px0:px1]),
            jnp.asarray(ref_u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(ref_v[:, px0 // 2 : px1 // 2]), strip_qp,
            width=px1 - px0, height=cfg.height, rdoq=rdoq, xtile=xtile,
            merge_cand=cfg.merge_cand,
        )
        for key, dst in (("ctype", ctype), ("intra_mode", imode), ("mv", mv),
                         ("mvp_flag", mvp_flag), ("mvd", mvd),
                         ("merge_idx", merge_idx),
                         ("lev_y", lev_y), ("lev_cb", lev_cb),
                         ("lev_cr", lev_cr)):
            strip_to_raster(np.asarray(out[key]), cols, t, cw, ch, dst)
        ry_parts.append(out["recon_y"])
        ru_parts.append(out["recon_u"])
        rv_parts.append(out["recon_v"])
    return {
        "ctype": ctype, "intra_mode": imode, "mv": mv, "mvp_flag": mvp_flag,
        "mvd": mvd, "merge_idx": merge_idx,
        "lev_y": lev_y, "lev_cb": lev_cb, "lev_cr": lev_cr,
        "recon_y": jnp.concatenate(ry_parts, axis=1),
        "recon_u": jnp.concatenate(ru_parts, axis=1),
        "recon_v": jnp.concatenate(rv_parts, axis=1),
    }


def encode_frame_intra64_tiles(cfg, y, u, v, qp: int, *, rdoq: bool = False):
    """All-intra CTB64 quadtree frame as independent tile columns: each
    strip runs the quad64 device wavefront at tile width (intra
    availability stops at the strip edge = the tile rule).  Returns
    (picture-raster trees, recon planes)."""
    from .frame_intra64 import (encode_frame_intra64_fast,
                                quad_trees_from_device64)

    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, cfg.tile_cols)
    trees_pic = [None] * (cw * ch)
    ry_p, ru_p, rv_p = [], [], []
    for t, (x0, x1) in enumerate(cols):
        px0, px1 = x0 * n, x1 * n
        dev = encode_frame_intra64_fast(
            jnp.asarray(y[:, px0:px1]), jnp.asarray(u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(v[:, px0 // 2 : px1 // 2]), qp,
            width=px1 - px0, height=cfg.height, rdoq=rdoq)
        trees_t = quad_trees_from_device64(dev, px1 - px0, cfg.height)
        cwt = x1 - x0
        for r in range(ch):
            for ci in range(cwt):
                trees_pic[r * cw + x0 + ci] = trees_t[r * cwt + ci]
        ry_p.append(dev["recon_y"])
        ru_p.append(dev["recon_u"])
        rv_p.append(dev["recon_v"])
    return trees_pic, (jnp.concatenate(ry_p, axis=1),
                       jnp.concatenate(ru_p, axis=1),
                       jnp.concatenate(rv_p, axis=1))


def col_strip_slice(col_mv, col_inter, height: int, px0: int, px1: int):
    """Strip-raster slice of the picture-raster 16-grid collocated store
    for the tile column covering pixels [px0, px1), EXTENDED by one cell
    column on the right: the spec derives colBr (8.5.3.2.8) picture-level,
    so a right-edge unit's colBr cell lives in the NEXT tile column (at
    the picture edge the extra column is inter=0 = unavailable).  Pairs
    with encode_frame_p64_fast(col_xext=True)."""
    h16 = height // 16
    w16 = col_inter.shape[0] // h16
    mv2 = np.asarray(col_mv).reshape(h16, w16, 2)
    if2 = np.asarray(col_inter).reshape(h16, w16)
    x0, x1 = px0 // 16, px1 // 16
    mv_s = np.zeros((h16, x1 - x0 + 1, 2), np.int32)
    if_s = np.zeros((h16, x1 - x0 + 1), np.int32)
    xe = min(x1 + 1, w16)
    mv_s[:, : xe - x0] = mv2[:, x0:xe]
    if_s[:, : xe - x0] = if2[:, x0:xe]
    return (jnp.asarray(mv_s.reshape(-1, 2)),
            jnp.asarray(if_s.reshape(-1)))


def encode_frame_p64_tiles(cfg, y, u, v, ref_y, ref_u, ref_v, qp: int, *,
                           merge_cand: int = 1, rdoq: bool = False,
                           tmvp: bool = False, col_mv=None, col_inter=None):
    """Low-delay P CTB64 quadtree frame as motion-constrained tile columns
    (kvazaar --mv-constraint frametile): each strip runs the quad64 P
    wavefront on its own view of the reference with xtile MV bounds, so
    MC never reads across a tile boundary.  Loop filtering is the
    caller's, on the assembled picture (across-tiles semantics).

    tmvp: temporal MVP (8.5.3.2.8) — col_mv/col_inter are the PICTURE-
    raster 16-grid collocated store of the reference; each strip gets its
    tile-column slice (col_strip_slice).  MCTS keeps candidate SELECTION
    inside the column via the existing xtile masks."""
    from .frame_inter64 import (encode_frame_p64_fast,
                                quad_p64_trees_from_device)

    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, cfg.tile_cols)
    n_tiles = len(cols)
    trees_pic = [None] * (cw * ch)
    ry_p, ru_p, rv_p = [], [], []
    for t, (x0, x1) in enumerate(cols):
        px0, px1 = x0 * n, x1 * n
        tmvp_kw = {}
        if tmvp:
            cmv, cif = col_strip_slice(col_mv, col_inter, cfg.height,
                                       px0, px1)
            tmvp_kw = dict(tmvp=True, col_mv=cmv, col_inter=cif,
                           col_xext=True)
        dev = encode_frame_p64_fast(
            jnp.asarray(y[:, px0:px1]), jnp.asarray(u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(v[:, px0 // 2 : px1 // 2]),
            jnp.asarray(ref_y[:, px0:px1]),
            jnp.asarray(ref_u[:, px0 // 2 : px1 // 2]),
            jnp.asarray(ref_v[:, px0 // 2 : px1 // 2]), qp,
            width=px1 - px0, height=cfg.height, merge_cand=merge_cand,
            rdoq=rdoq, xtile=(t > 0, t < n_tiles - 1), **tmvp_kw)
        trees_t = quad_p64_trees_from_device(dev, px1 - px0, cfg.height)
        cwt = x1 - x0
        for r in range(ch):
            for ci in range(cwt):
                trees_pic[r * cw + x0 + ci] = trees_t[r * cwt + ci]
        ry_p.append(dev["recon_y"])
        ru_p.append(dev["recon_u"])
        rv_p.append(dev["recon_v"])
    return trees_pic, (jnp.concatenate(ry_p, axis=1),
                       jnp.concatenate(ru_p, axis=1),
                       jnp.concatenate(rv_p, axis=1))


def _strip_qp(qp, cols, t, cw, ch):
    """Per-strip QP: scalar passthrough, or tile-raster slice of a flat
    per-CTU actual-QP vector (cu_qp_delta)."""
    if np.isscalar(qp) or getattr(qp, "ndim", 0) == 0:
        return qp
    return jnp.asarray(raster_to_strip(np.asarray(qp), cols, t, cw, ch))


def reconstruct_frame_p_tiles(cfg, n_cols: int, ctype, intra_modes, mvs,
                              lev_y, lev_cb, lev_cr, ref, qp):
    """Decoder-side tiled P reconstruction: each tile column reconstructs
    independently from its own strip of the reference picture (valid
    because coded MVs are MCTS-constrained — ops/me.mv_valid_x), matching
    the encoder's per-strip wavefront availability at tile edges."""
    from ..decoder.frame_inter import reconstruct_frame_p

    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, n_cols)
    ref_y, ref_u, ref_v = (jnp.asarray(p) for p in ref)
    ys, us, vs = [], [], []
    for t, (x0, x1) in enumerate(cols):
        px0, px1 = x0 * n, x1 * n
        strip = lambda a: jnp.asarray(raster_to_strip(np.asarray(a), cols, t, cw, ch))
        sy, su, sv = reconstruct_frame_p(
            strip(ctype), strip(intra_modes), strip(mvs),
            strip(lev_y), strip(lev_cb), strip(lev_cr),
            ref_y[:, px0:px1], ref_u[:, px0 // 2 : px1 // 2],
            ref_v[:, px0 // 2 : px1 // 2], _strip_qp(qp, cols, t, cw, ch),
            width=px1 - px0, height=cfg.height,
        )
        ys.append(sy)
        us.append(su)
        vs.append(sv)
    return (
        jnp.concatenate(ys, axis=1),
        jnp.concatenate(us, axis=1),
        jnp.concatenate(vs, axis=1),
    )


def reconstruct_frame_intra_tiles(cfg, n_cols: int, modes, lev_y, lev_cb, lev_cr, qp):
    """Decoder-side tile reconstruction: strip wavefronts, assembled picture."""
    from ..decoder.frame_intra import reconstruct_frame_intra

    n = cfg.ctb_size
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, n_cols)
    ys, us, vs = [], [], []
    for t, (x0, x1) in enumerate(cols):
        sy, su, sv = reconstruct_frame_intra(
            raster_to_strip(modes, cols, t, cw, ch),
            raster_to_strip(lev_y, cols, t, cw, ch),
            raster_to_strip(lev_cb, cols, t, cw, ch),
            raster_to_strip(lev_cr, cols, t, cw, ch),
            _strip_qp(qp, cols, t, cw, ch),
            width=(x1 - x0) * n, height=cfg.height,
        )
        ys.append(sy)
        us.append(su)
        vs.append(sv)
    return (
        jnp.concatenate(ys, axis=1),
        jnp.concatenate(us, axis=1),
        jnp.concatenate(vs, axis=1),
    )
