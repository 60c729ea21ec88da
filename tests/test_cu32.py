"""CTB-32 quadtree intra coding (encoder/cu32.py + entropy/quad.py).

The deeper CTU recursion of kvazaar's search (SURVEY §2.6 Compression:
`search.c` CU depth 0..3).  Streams must decode bit-exactly in our own
decoder AND in libavcodec (openHEVC-replacement bar, SURVEY §2.6).
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420

from test_e2e_intra import _ensure_oracle


def _cfg(w, h, qp, deblock=True):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=5, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=deblock)


@pytest.mark.parametrize("qp,deblock", [(31, True), (26, False)])
def test_cu32_self_decode(qp, deblock):
    w, h = 64, 64
    y, u, v = synthetic_frames(w, h, 1, seed=5)[0]
    enc = Encoder(_cfg(w, h, qp, deblock))
    stream, recon = enc.encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p


def test_cu32_oracle_decode(tmp_path):
    tool = _ensure_oracle()
    w, h = 64, 64
    y, u, v = synthetic_frames(w, h, 1, seed=7)[0]
    enc = Encoder(_cfg(w, h, 30, deblock=True))
    stream, recon = enc.encode_frame(y, u, v)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine


def test_cu32_saves_bits_vs_ctb16():
    """Larger CTBs must not cost bits on smooth content (the point of the
    deeper quadtree: one CU32 replaces 4 split flags + 4 modes)."""
    w, h = 64, 64
    y, u, v = synthetic_frames(w, h, 1, seed=5)[0]
    s32, _ = Encoder(_cfg(w, h, 31)).encode_frame(y, u, v)
    cfg16 = StreamConfig(width=w, height=h, qp=31, ctb_log2=4, min_cb_log2=3,
                         deblocking_enabled=True)
    s16, _ = Encoder(cfg16).encode_frame(y, u, v)
    assert len(s32) <= len(s16)


def _cfg64(w, h, qp, deblock=True):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=deblock)


def test_ctb64_self_decode():
    """CTB64: CU64 leaves force-split the transform tree into four TU32s
    with per-quadrant chroma TU16s (7.3.8.8)."""
    w, h = 64, 64
    y, u, v = synthetic_frames(w, h, 1, seed=9)[0]
    stream, recon = Encoder(_cfg64(w, h, 32)).encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p


def test_ctb64_cu64_leaf_oracle(tmp_path):
    """Smooth gradient content must actually choose CU64 leaves, and the
    stream must decode byte-identically in libavcodec."""
    tool = _ensure_oracle()
    w, h = 128, 64
    xx = np.mgrid[0:h, 0:w][1]
    y = ((xx * 255) // w).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = ((np.mgrid[0:h // 2, 0:w // 2][0] * 255) // (h // 2)).astype(np.uint8)
    enc = Encoder(_cfg64(w, h, 34))
    ctx = enc.encode_frame_device(y, u, v)
    assert any("split" not in t for t in ctx["out"]["trees"]), "no CU64 leaf chosen"
    stream, recon = enc.encode_frame_entropy(ctx)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine


def test_tu_tree_split_oracle(tmp_path):
    """Explicit TU trees (split_transform_flag, max_td_intra=1): quarter
    TUs with per-quadrant chroma at CU16/CU32 (7.3.8.8), selected on
    mixed flat/detail content and byte-exact in libavcodec."""
    tool = _ensure_oracle()
    rng = np.random.default_rng(4)
    w, h = 96, 64
    y = np.full((h, w), 120, np.uint8)
    y[:, w // 2 :] = rng.integers(0, 256, (h, w // 2)).astype(np.uint8)
    y[:, : w // 2] += (np.mgrid[0:h, 0 : w // 2][1] // 3).astype(np.uint8)
    u = rng.integers(100, 140, (h // 2, w // 2)).astype(np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    cfg = StreamConfig(width=w, height=h, qp=30, ctb_log2=5, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True,
                       max_transform_hierarchy_depth_intra=1)
    enc = Encoder(cfg)
    ctx = enc.encode_frame_device(y, u, v)

    def count_ts(n):
        if "split" in n:
            return sum(count_ts(s) for s in n["split"])
        return int(n.get("tsplit", 0))

    assert sum(count_ts(t) for t in ctx["out"]["trees"]) > 0, "no TU split chosen"
    stream, recon = enc.encode_frame_entropy(ctx)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine


def test_ctb64_sao_tu_trees_oracle(tmp_path):
    """The full CTB64 intra toolset together: deblocking + SAO + TU trees
    (the kvazaar-default operating point, loop filters on)."""
    tool = _ensure_oracle()
    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=12)[0]
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True, sao_enabled=True,
                       max_transform_hierarchy_depth_intra=1)
    enc = Encoder(cfg)
    stream, recon = enc.encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine


def test_cu32_wpp_sao_oracle(tmp_path):
    """WPP substreams (entropy_coding_sync) + SAO + deblocking at CTB32:
    per-row context inheritance with picture-level depth/mode maps."""
    tool = _ensure_oracle()
    w, h = 96, 96
    y, u, v = synthetic_frames(w, h, 1, seed=13)[0]
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=5, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True, sao_enabled=True,
                       wpp=True)
    stream, recon = Encoder(cfg).encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine
