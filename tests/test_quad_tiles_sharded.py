"""ShardedQuadTileEncoder: the quad64 production combo over a device mesh
must be byte-identical to the single-device Encoder quad_tiles path
(stage-1 engines identical per strip, host bS identical on assembled
trees, deblock/SAO halo exchange pinned as in tiles_p)."""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.parallel.tiles_p import (ShardedQuadTileEncoder,
                                          make_tile_mesh)


def _frames(w, h, n):
    f0 = synthetic_frames(w, h, 1, seed=41)[0]
    return [f0] + [
        tuple(np.roll(p, (2 * i, 3 * i), axis=(0, 1)) for p in f0)
        for i in range(1, n)
    ]


def test_sharded_quad_tiles_byte_identical_production():
    w, h = 256, 128  # 2 CTB64 columns per device on a 2-mesh
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True,
                       sao_enabled=True, merge_cand=5, rdoq=True,
                       tile_cols=2)
    frames = _frames(w, h, 3)
    enc = ShardedQuadTileEncoder(make_tile_mesh(2), cfg, intra_period=8)
    stream = enc.encode(frames)
    ref = Encoder(cfg, intra_period=8)
    ref_stream = b"".join(ref.encode_frame(*f)[0] for f in frames)
    assert stream == ref_stream


def test_sharded_quad_tiles_four_devices_plain():
    w, h = 256, 64  # 1 CTB64 column per device on a 4-mesh
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True,
                       tile_cols=4)
    frames = _frames(w, h, 3)
    enc = ShardedQuadTileEncoder(make_tile_mesh(4), cfg, intra_period=8)
    stream = enc.encode(frames)
    ref = Encoder(cfg, intra_period=8)
    ref_stream = b"".join(ref.encode_frame(*f)[0] for f in frames)
    assert stream == ref_stream


def test_sharded_quad_tiles_tmvp_byte_identical(tmp_path):
    """TMVP composed into the sharded production combo (VERDICT r4 ask
    #6): per-shard tile-column slices of the collocated store (extended
    one cell column right for the picture-level colBr, 8.5.3.2.8) must
    reproduce the single-device quad-tiles stream byte-for-byte, across
    an IDR refresh; and the stream must decode bit-exactly in the
    libavcodec oracle."""
    from tests.test_e2e_intra import oracle_decode

    w, h = 256, 128
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True,
                       sao_enabled=True, merge_cand=5, rdoq=True,
                       temporal_mvp=True, tile_cols=2)
    frames = _frames(w, h, 5)
    enc = ShardedQuadTileEncoder(make_tile_mesh(2), cfg, intra_period=3)
    stream = enc.encode(frames)
    ref = Encoder(cfg, intra_period=3)
    ref_out = [ref.encode_frame(*f) for f in frames]
    ref_stream = b"".join(s for s, _ in ref_out)
    assert stream == ref_stream
    dec, log = oracle_decode(stream, w, h, tmp_path)
    assert len(dec) == len(frames), log
    for k, ((_, rec), out) in enumerate(zip(ref_out, dec)):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {k}")
