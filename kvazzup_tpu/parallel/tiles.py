"""Tile/GOP sharding: the multi-chip axes of the encoder.

HEVC tiles are independently-predictable, independently-entropy-coded
rectangular CTU regions — the codec's native spatial sharding axis
(SURVEY.md §2.7: "tile -> chip shard").  Frames in flight (OWF) and GOPs
are the data-parallel axis.  This module lays a `Mesh` over
(gop = frames, tile = tile columns) and runs the per-tile CTU scan under
`shard_map`, with per-device outputs gathered for the host entropy stage.

Reference parity: kvazaar `tiles`/`owf` options wired through
/root/reference/src/media/processing/kvazaarfilter.cpp:193-202; here the
"threads" become mesh devices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encoder.frame_intra import encode_frame_intra


def make_mesh(n_gop: int, n_tile: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_gop * n_tile, "not enough devices"
    grid = devices[: n_gop * n_tile].reshape(n_gop, n_tile)
    return Mesh(grid, ("gop", "tile"))


def encode_frames_tiled(mesh: Mesh, frames_y, frames_u, frames_v, qp, *, width: int, height: int):
    """Encode a batch of frames, sharded (gop x tile).

    frames_y: (B, H, W) uint8 with B divisible by mesh 'gop' size; the
    picture splits into `n_tile` equal-width CTB-aligned tile columns, each
    encoded independently (intra prediction does not cross tile boundaries,
    which is exactly HEVC tile semantics).  Returns per-tile CTU outputs
    with a leading (B, n_tile) axis.
    """
    n_tile = mesh.shape["tile"]
    assert width % (16 * n_tile) == 0, "tile columns must be CTB-aligned"
    tile_w = width // n_tile

    def per_shard(y, u, v):
        # y: (B_local, H, tile_w) — each device encodes its tile column of
        # its local frames; availability at the tile's left edge is handled
        # by the frame-edge logic (x0 == 0 inside the tile view).  qp stays
        # a closed-over python int so tracing (and RD tie-breaks) are
        # identical to the single-device path.
        def one(yy, uu, vv):
            o = encode_frame_intra(yy, uu, vv, qp, width=tile_w, height=height)
            return (
                o["mode"],
                o["lev_y"],
                o["lev_cb"],
                o["lev_cr"],
                o["recon_y"],
                o["recon_u"],
                o["recon_v"],
            )

        return jax.vmap(one)(y, u, v)

    from jax import shard_map

    spec_y = P("gop", None, "tile")
    ctu = P("gop", "tile")  # CTU-indexed outputs concatenate along the tile axis
    ctu2 = P("gop", "tile", None, None)
    modes, lev_y, lev_cb, lev_cr, ry, ru, rv = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_y, spec_y, spec_y),
        out_specs=(ctu, ctu2, ctu2, ctu2, spec_y, spec_y, spec_y),
        check_vma=False,
    )(frames_y, frames_u, frames_v)
    return {
        "mode": modes,
        "lev_y": lev_y,
        "lev_cb": lev_cb,
        "lev_cr": lev_cr,
        "recon_y": ry,
        "recon_u": ru,
        "recon_v": rv,
    }


def gop_parallel_spec(mesh: Mesh):
    """Sharding for a batch of independent frames (GOP/OWF axis)."""
    return NamedSharding(mesh, P("gop"))


def encode_tiled_stream(mesh: Mesh, cfg, frames):
    """Mesh-sharded conformant encode: (gop x tile) device encode, host
    entropy + mux.  `frames` is a list of (y, u, v) uint8 tuples with
    len(frames) == mesh 'gop' size; cfg.tile_cols must equal the mesh
    'tile' size and divide cfg.width evenly in CTBs (the uniform-spacing
    case where all tile columns are equal width).  Returns a list of
    Annex-B IDR access units (one per frame, each with parameter sets).

    The bitstream is identical to the single-device tiles path
    (encoder/tiled.py): tiles are independent, so sharding them over
    devices changes where the strips are computed, not what they contain.
    """
    from ..core.nal import NalType, NalUnit, compose_nal
    from ..core.params import SliceHeader, compose_pps, compose_slice_header, compose_sps, compose_vps
    from ..encoder.tiled import strip_to_raster
    from ..entropy.slice_data import encode_slice_data_intra_tiles, tile_grid

    n_tile = mesh.shape["tile"]
    assert cfg.tile_cols == n_tile and cfg.ctbs_w % n_tile == 0
    cw, ch = cfg.ctbs_w, cfg.ctbs_h
    cols = tile_grid(cfg, n_tile)
    ys = jnp.stack([jnp.asarray(f[0]) for f in frames])
    us = jnp.stack([jnp.asarray(f[1]) for f in frames])
    vs = jnp.stack([jnp.asarray(f[2]) for f in frames])
    out = encode_frames_tiled(mesh, ys, us, vs, cfg.qp, width=cfg.width, height=cfg.height)
    headers = b"".join(
        compose_nal(n) for n in (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg))
    )
    streams = []
    nctu = cw * ch
    n = cfg.ctb_size
    for b in range(len(frames)):
        mode = np.zeros(nctu, np.int32)
        lev_y = np.zeros((nctu, n, n), np.int32)
        lev_cb = np.zeros((nctu, n // 2, n // 2), np.int32)
        lev_cr = np.zeros((nctu, n // 2, n // 2), np.int32)
        # per-tile outputs concatenate along the CTU axis in tile order
        per_tile = nctu // n_tile
        for t in range(n_tile):
            sl = slice(t * per_tile, (t + 1) * per_tile)
            strip_to_raster(np.asarray(out["mode"][b][sl]), cols, t, cw, ch, mode)
            strip_to_raster(np.asarray(out["lev_y"][b][sl]), cols, t, cw, ch, lev_y)
            strip_to_raster(np.asarray(out["lev_cb"][b][sl]), cols, t, cw, ch, lev_cb)
            strip_to_raster(np.asarray(out["lev_cr"][b][sl]), cols, t, cw, ch, lev_cr)
        payload, entry_offsets = encode_slice_data_intra_tiles(
            cfg, n_tile, mode, lev_y, lev_cb, lev_cr
        )
        sh = SliceHeader(slice_type=2, qp=cfg.qp, nal_type=NalType.IDR_W_RADL)
        w = compose_slice_header(cfg, sh, entry_offsets)
        w.write_bytes(payload)
        streams.append(headers + compose_nal(NalUnit(sh.nal_type, w.data())))
    return streams
