"""Random-access B-pyramid on the CTB64 quad device engines (encoder/ra.py):
gop4/gop8 hierarchical coding, oracle-exact vs libavcodec, self-decode
bit-exact, open-GOP intra refresh, and the production toolset combo
(wpp + sao + deblock + merge5 + tmvp + rdoq)."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import RandomAccessEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_e2e_intra import oracle_decode


def _cfg(w, h, qp=32, **kw):
    kw.setdefault("deblocking_enabled", True)
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, num_reorder_pics=3,
                        max_dec_pic_buffering=6, **kw)


def _moving_frames(w, h, n, seed=12):
    return synthetic_frames(w, h, n, seed=seed)


def _run_ra(cfg, frames, tmp_path, gop_size=8, intra_period=32):
    enc = RandomAccessEncoder(cfg, gop_size=gop_size,
                              intra_period=intra_period)
    stream = b""
    recons = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            stream += nal
            recons[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recons[poc] = rec
    assert sorted(recons) == list(range(len(frames)))
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for k, poc in enumerate(sorted(recons)):
        for a, b in zip(recons[poc], outs[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (self)")
    ref, log = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
    assert len(ref) == len(frames), log
    for k, poc in enumerate(sorted(recons)):
        for a, b in zip(recons[poc], ref[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (oracle)")
    return stream, recons


def test_ra_quad_gop8(tmp_path):
    """One full gop8 pyramid + LD tail, deblocking on."""
    w, h = 128, 128
    frames = _moving_frames(w, h, 11)
    _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8)


def test_ra_quad_gop4(tmp_path):
    w, h = 128, 64
    frames = _moving_frames(w, h, 7)
    _run_ra(_cfg(w, h), frames, tmp_path, gop_size=4, intra_period=16)


def test_ra_quad_production_combo(tmp_path):
    """The full production toolset: wpp + sao + deblock + merge5 + tmvp
    + rdoq over two gop8 groups."""
    w, h = 192, 128
    frames = _moving_frames(w, h, 17, seed=7)
    cfg = _cfg(w, h, qp=30, wpp=True, sao_enabled=True, merge_cand=5,
               temporal_mvp=True, rdoq=True)
    _run_ra(cfg, frames, tmp_path, gop_size=8)


def test_ra_quad_open_gop_refresh(tmp_path):
    """intra_period=8: the second anchor is an open-GOP I (TRAIL_R I
    slice), its trailing Bs keep the previous anchor alive via RPS."""
    w, h = 128, 64
    frames = _moving_frames(w, h, 17, seed=9)
    stream, _ = _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8,
                        intra_period=8)
    # exactly one IDR (stream start); refreshes are non-IRAP I slices
    assert stream.count(b"\x00\x00\x01\x26") == 1


def test_ra_quad_static_content_skips(tmp_path):
    """Static content in B layers must code mostly as skip."""
    w, h = 128, 64
    f0 = _moving_frames(w, h, 1)[0]
    frames = [f0] * 9
    stream, _ = _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8)
    nals = stream.split(b"\x00\x00\x01")
    sizes = [len(n) for n in nals if n[:1] == b"\x02"]  # TRAIL_R
    idr = [len(n) for n in nals if n[:1] == b"\x26"]
    assert idr and sizes
    assert max(sizes) < idr[0] / 8
