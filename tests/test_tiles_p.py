"""Motion-constrained tile columns (MCTS): P tiles on one device, the
ppermute-sharded encoder, and oracle conformance.

Reference parity: kvazaar `--tiles` + `--mv-constraint frametile`
(/root/reference/src/media/processing/kvazaarfilter.cpp:196-276)."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames
from tests.test_e2e_intra import oracle_decode


def _motion_frames(w, h, n, seed=11):
    f0 = synthetic_frames(w, h, 1, seed=seed)[0]
    return [f0] + [
        tuple(np.roll(p, (2 * i, 3 * i), axis=(0, 1)) for p in f0)
        for i in range(1, n)
    ]


def test_tile_p_oracle(tmp_path):
    """Single-device tiled I+P GOP: libavcodec decode == our recon."""
    w, h = 128, 64
    frames = _motion_frames(w, h, 5)
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=True,
                       tile_cols=2)
    enc = Encoder(cfg, intra_period=5)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == len(frames), log
    for i, (r, mine) in enumerate(zip(ref, recons)):
        for p, q in zip(r, mine):
            assert np.array_equal(p, np.asarray(q)), f"frame {i} differs"
    # our own decoder handles general tile P slices too
    from kvazzup_tpu.decoder.top import Decoder

    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for got, want in zip(outs, recons):
        for p, q in zip(got, want):
            assert np.array_equal(np.asarray(p), np.asarray(q))


def test_tile_p_mv_constraint():
    """No coded MV's MC support may cross a tile boundary (the decoder
    would read the other tile's pixels)."""
    from kvazzup_tpu.entropy.slice_data import tile_grid
    from kvazzup_tpu.ops.me import mv_valid_x

    w, h = 128, 64
    frames = _motion_frames(w, h, 4, seed=3)
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=True,
                       tile_cols=2)
    enc = Encoder(cfg, intra_period=4)
    cols = tile_grid(cfg, 2)
    n = cfg.ctb_size
    for k, (y, u, v) in enumerate(frames):
        ctx = enc.encode_frame_device(y, u, v)
        if ctx["kind"] != "tiles_p":
            continue
        ct = np.asarray(ctx["out"]["ctype"]).reshape(cfg.ctbs_h, cfg.ctbs_w)
        mv = np.asarray(ctx["out"]["mv"]).reshape(cfg.ctbs_h, cfg.ctbs_w, 2)
        for t, (x0, x1) in enumerate(cols):
            tw = (x1 - x0) * n
            for r in range(cfg.ctbs_h):
                for c in range(x0, x1):
                    if ct[r, c] == 0:
                        continue  # intra
                    ok = mv_valid_x(
                        np.int32(mv[r, c, 0]), np.int32((c - x0) * n), n, tw,
                        t > 0, t < len(cols) - 1)
                    assert bool(np.asarray(ok)), (
                        f"frame {k} CTU ({r},{c}) mv {mv[r, c]} crosses tile")


def test_sharded_tiles_byte_identical(tmp_path):
    """shard_map + ppermute halo exchange == single-device tiled Encoder,
    and the stream is oracle-conformant."""
    from kvazzup_tpu.parallel.tiles_p import ShardedTileEncoder, make_tile_mesh

    w, h = 256, 64
    frames = _motion_frames(w, h, 5)
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=True,
                       tile_cols=4)
    ref_enc = Encoder(cfg, intra_period=5)
    ref_stream = b"".join(ref_enc.encode_frame(*f)[0] for f in frames)
    sharded = ShardedTileEncoder(make_tile_mesh(4), cfg, intra_period=5)
    got = sharded.encode(frames)
    assert got == ref_stream
    ref, log = oracle_decode(got, w, h, tmp_path)
    assert len(ref) == len(frames), log
    rec = tuple(np.asarray(p) for p in sharded._enc._ref)
    for p, q in zip(ref[-1], rec):
        assert np.array_equal(p, q)


def test_sharded_tiles_sao_byte_identical(tmp_path):
    """Sharded SAO (decide+apply on ppermute halos of the deblocked
    neighbor columns) == the single-device tiled encoder's assembled-
    picture SAO, byte for byte; oracle-conformant."""
    from kvazzup_tpu.parallel.tiles_p import ShardedTileEncoder, make_tile_mesh

    w, h = 256, 64
    frames = _motion_frames(w, h, 4, seed=31)
    cfg = StreamConfig(width=w, height=h, qp=31, deblocking_enabled=True,
                       sao_enabled=True, tile_cols=4, merge_cand=5)
    ref_enc = Encoder(cfg, intra_period=4)
    ref_stream = b"".join(ref_enc.encode_frame(*f)[0] for f in frames)
    sharded = ShardedTileEncoder(make_tile_mesh(4), cfg, intra_period=4)
    got = sharded.encode(frames)
    assert got == ref_stream
    ref, log = oracle_decode(got, w, h, tmp_path)
    assert len(ref) == len(frames), log
    rec = tuple(np.asarray(p) for p in sharded._enc._ref)
    for p, q in zip(ref[-1], rec):
        assert np.array_equal(p, q)


def test_tiles_sao_qp_map(tmp_path):
    """Tiles compose with SAO + cu_qp_delta: the full tiled production
    combo (deblock+sao+merge5+ROI qp map) I+P+P, oracle-exact and
    self-decode-exact.  SAO merge flags stop at tile boundaries
    (7.3.8.3); the cu_qp_delta chain resets per tile (8.6.1)."""
    from kvazzup_tpu.decoder.top import Decoder

    w, h = 128, 64
    frames = _motion_frames(w, h, 3, seed=23)
    cfg = StreamConfig(width=w, height=h, qp=34, tile_cols=2,
                       deblocking_enabled=True, sao_enabled=True,
                       cu_qp_delta=True, merge_cand=5)
    enc = Encoder(cfg, intra_period=8)
    qm = np.full((cfg.ctbs_h, cfg.ctbs_w), 36, np.int32)
    qm[:, : cfg.ctbs_w // 2] = 26  # ROI = left tile
    qm[1, :] += 2  # exercise the per-tile delta chain
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v, qp_map=qm)
        stream += s
        recons.append(rec)
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == len(frames), log
    for fi, (rec, rf) in enumerate(zip(recons, ref)):
        for a, b in zip(rec, rf):
            np.testing.assert_array_equal(np.asarray(a), b,
                                          err_msg=f"frame {fi}")


def test_tiles_sao_only(tmp_path):
    """Tiles + SAO without qp maps (merge-flag tile availability path)."""
    from kvazzup_tpu.decoder.top import Decoder

    w, h = 128, 64
    frames = _motion_frames(w, h, 3, seed=29)
    cfg = StreamConfig(width=w, height=h, qp=30, tile_cols=3,
                       deblocking_enabled=True, sao_enabled=True)
    enc = Encoder(cfg, intra_period=8)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    outs = Decoder().decode(stream)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == len(frames), log
    for fi, (rec, rf) in enumerate(zip(recons, ref)):
        for a, b in zip(rec, rf):
            np.testing.assert_array_equal(np.asarray(a), b,
                                          err_msg=f"frame {fi}")
