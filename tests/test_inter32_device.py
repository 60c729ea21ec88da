"""Device-native CTB32 quadtree P encoding (encoder/frame_inter32.py +
entropy/quad.py P writer).

kvazaar's inter CU quadtree at CTB32 (search.c depth 0/1, 2Nx2N PUs) as
a TPU wavefront: merge/AMVP lists at 16-cell granularity (spec positions
incl. the TL quadrant's A0), skip/merge/AMVP/intra arbitration, TU==CU
residuals.  Streams must decode bit-exactly in our decoder AND
libavcodec across merge_cand settings, SAO, and skip-heavy content.
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames

from test_e2e_intra import _ensure_oracle


def _cfg(w, h, qp, merge=1, sao=False, tmvp=False, wpp=False):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=5, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=True,
                        sao_enabled=sao, merge_cand=merge, temporal_mvp=tmvp,
                        wpp=wpp)


def _frames(w, h, nf, seed=5, moving=True):
    f0 = synthetic_frames(w, h, 1, seed=seed)[0]
    if not moving:
        return [f0] * nf
    return [f0] + [tuple(np.roll(p, (3 * i, 5 * i), axis=(0, 1)) for p in f0)
                   for i in range(1, nf)]


def _roundtrip(cfg, frames, intra_period=16):
    enc = Encoder(cfg, intra_period=intra_period)
    stream, recons = b"", []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    return stream, recons


@pytest.mark.parametrize("merge,sao", [(1, False), (5, True)])
def test_p32_self_decode(merge, sao):
    w, h = 96, 64
    stream, recons = _roundtrip(_cfg(w, h, 30, merge, sao), _frames(w, h, 3))
    dec = Decoder().decode(stream)
    for fi in range(3):
        for p in range(3):
            assert np.array_equal(np.asarray(dec[fi][p]),
                                  np.asarray(recons[fi][p])), (fi, p)


def test_p32_uses_quadtree_and_skip():
    """P pictures must exercise the quadtree (split CTBs), inter CUs, and
    skip coding on static content."""
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.frame_inter32 import encode_frame_p32_fast

    w, h = 160, 96
    f0, _ = _frames(w, h, 2, seed=9)
    # divergent local motion: each 32-px band scrolls differently, so a
    # single CU32 MV cannot cover a CTB but its 16x16 quadrants can
    f1 = []
    for p in f0:
        q = p.copy()
        band = 16 if p.shape[0] == h else 8
        half = q.shape[0] // 2
        # top half: 16-px bands scroll divergently (forces 16x16 splits);
        # bottom half: one uniform shift (a CU32 2Nx2N MV suffices)
        for bi in range(half // band):
            q[bi * band : (bi + 1) * band] = np.roll(
                q[bi * band : (bi + 1) * band],
                (bi % 5 - 2) * 3, axis=1)
        q[half:] = np.roll(q[half:], 2, axis=1)
        f1.append(q)
    f1 = tuple(f1)
    out = encode_frame_p32_fast(
        jnp.asarray(f1[0]), jnp.asarray(f1[1]), jnp.asarray(f1[2]),
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        27, width=w, height=h, merge_cand=3)
    ct32 = np.asarray(out["ct32"])
    sp = np.asarray(out["split"])
    assert (ct32[sp == 0] != 0).any(), "no inter CU32 coded"
    assert 0 < sp.sum() < sp.size, "split decision never/always fires"

    # static frame pair -> skip-dominated
    outs = encode_frame_p32_fast(
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        34, width=w, height=h, merge_cand=3)
    cts = np.asarray(outs["ct32"])
    sps = np.asarray(outs["split"])
    assert (cts[sps == 0] == 3).mean() > 0.5, "static content should skip"


@pytest.mark.parametrize("merge,sao,moving,qp", [
    (1, False, True, 30),
    (5, True, True, 26),
    (3, False, False, 34),
])
def test_p32_oracle(tmp_path, merge, sao, moving, qp):
    tool = _ensure_oracle()
    w, h = 160, 96
    stream, recons = _roundtrip(_cfg(w, h, qp, merge, sao),
                                _frames(w, h, 4, seed=3, moving=moving))
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8))
                    for rec in recons for p in rec)
    assert out.read_bytes() == mine


def test_p32_tmvp_oracle(tmp_path):
    """TMVP in the quad path: the temporal merge/AMVP candidate (8.5.3.2.8
    colBr-then-center on the 16x16-compressed store) must change the
    stream AND stay libavcodec-exact, across an IDR refresh (collocated
    resets to all-intra)."""
    tool = _ensure_oracle()
    w, h = 160, 96
    frames = _frames(w, h, 6, seed=3)
    stream, recons = _roundtrip(_cfg(w, h, 29, merge=5, sao=True, tmvp=True),
                                frames, intra_period=3)
    base, _ = _roundtrip(_cfg(w, h, 29, merge=5, sao=True), frames,
                         intra_period=3)
    assert stream != base, "temporal candidate never engaged"
    dec = Decoder().decode(stream)
    for fi in range(6):
        for p in range(3):
            assert np.array_equal(np.asarray(dec[fi][p]),
                                  np.asarray(recons[fi][p])), (fi, p)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8))
                    for rec in recons for p in rec)
    assert out.read_bytes() == mine


def test_p32_production_combo_oracle(tmp_path):
    """The kvazaar-style production toolset composed at CTB32: quadtree
    inter + WPP substreams + SAO + deblock + TMVP + merge 5 — self-decode
    and libavcodec byte-exact."""
    tool = _ensure_oracle()
    w, h = 160, 96
    frames = _frames(w, h, 5, seed=11)
    stream, recons = _roundtrip(
        _cfg(w, h, 28, merge=5, sao=True, tmvp=True, wpp=True), frames,
        intra_period=4)
    dec = Decoder().decode(stream)
    for fi in range(5):
        for p in range(3):
            assert np.array_equal(np.asarray(dec[fi][p]),
                                  np.asarray(recons[fi][p])), (fi, p)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8))
                    for rec in recons for p in rec)
    assert out.read_bytes() == mine


def test_p32_idr_refresh():
    """intra_period mid-stream: IDR re-anchors the quad-P chain."""
    w, h = 96, 64
    frames = _frames(w, h, 5, seed=7)
    stream, recons = _roundtrip(_cfg(w, h, 31, 2), frames, intra_period=2)
    dec = Decoder().decode(stream)
    for fi in range(5):
        for p in range(3):
            assert np.array_equal(np.asarray(dec[fi][p]),
                                  np.asarray(recons[fi][p])), (fi, p)
