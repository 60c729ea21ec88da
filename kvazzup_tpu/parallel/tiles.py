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

    def per_shard(y, u, v, qp_s):
        # y: (B_local, H, tile_w) — each device encodes its tile column of
        # its local frames; availability at the tile's left edge is handled
        # by the frame-edge logic (x0 == 0 inside the tile view).
        def one(yy, uu, vv):
            o = encode_frame_intra(yy, uu, vv, qp_s[0], width=tile_w, height=height)
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

    from jax.experimental.shard_map import shard_map

    spec_y = P("gop", None, "tile")
    ctu = P("gop", "tile")  # CTU-indexed outputs concatenate along the tile axis
    ctu2 = P("gop", "tile", None, None)
    modes, lev_y, lev_cb, lev_cr, ry, ru, rv = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_y, spec_y, spec_y, P()),
        out_specs=(ctu, ctu2, ctu2, ctu2, spec_y, spec_y, spec_y),
        check_rep=False,
    )(
        frames_y,
        frames_u,
        frames_v,
        jnp.asarray([qp], jnp.int32),
    )
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
