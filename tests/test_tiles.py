"""Tiles: independent tile-column substreams, e2e conformance, mesh sharding.

Reference parity: kvazaar tiles (`--tiles`) as wired through the reference's
kvazaarfilter (see SURVEY.md §2.7); verified against libavcodec like the
other e2e suites.
"""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder

from test_e2e_intra import oracle_decode, synthetic_frames


@pytest.mark.parametrize("n_cols", [2, 3, 4])
def test_tiles_self_and_oracle(n_cols, tmp_path):
    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=7)[0]
    cfg = StreamConfig(width=w, height=h, qp=30, tile_cols=n_cols)
    enc = Encoder(cfg, intra_period=1)
    stream, recon = enc.encode_frame(y, u, v)

    frames = Decoder().decode(stream)
    assert len(frames) == 1
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))

    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == 1, err
    for p in range(3):
        assert np.array_equal(oracle[0][p], np.asarray(frames[0][p])), (
            f"plane {p} differs from libavcodec"
        )


def test_tiles_vs_single_tile_psnr(tmp_path):
    """Tile splits only remove prediction context; quality stays close."""
    from kvazzup_tpu.io.yuv import psnr

    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=9)[0]
    r = {}
    for n_cols in (1, 4):
        cfg = StreamConfig(width=w, height=h, qp=30, tile_cols=n_cols)
        stream, recon = Encoder(cfg, intra_period=1).encode_frame(y, u, v)
        r[n_cols] = (len(stream), psnr(y, np.asarray(recon[0])))
    assert abs(r[1][1] - r[4][1]) < 1.0  # PSNR within 1 dB
    assert r[4][0] < r[1][0] * 1.15  # <15% bitrate overhead


def test_mesh_tiled_stream_conformance(tmp_path):
    """shard_map (gop x tile) encode produces oracle-exact bitstreams."""
    import jax

    from kvazzup_tpu.parallel.tiles import encode_tiled_stream, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    w, h = 128, 64
    frames = synthetic_frames(w, h, 2, seed=11)
    cfg = StreamConfig(width=w, height=h, qp=32, tile_cols=4)
    mesh = make_mesh(2, 4)
    streams = encode_tiled_stream(mesh, cfg, frames)
    assert len(streams) == 2

    # identical to the single-device tiles path
    enc = Encoder(cfg, intra_period=1)
    ref_stream, _ = enc.encode_frame(*frames[0])
    assert streams[0] == ref_stream

    for i, s in enumerate(streams):
        oracle, err = oracle_decode(s, w, h, tmp_path)
        ours = Decoder().decode(s)
        assert len(oracle) == 1, err
        for p in range(3):
            assert np.array_equal(oracle[0][p], np.asarray(ours[0][p]))
