"""CTB64 quadtree x tiles (VERDICT r3 ask #4): the production toolset's
multi-chip axis.  Per-strip quad64 wavefronts with MCTS MV constraints
(kvazaar --mv-constraint frametile), per-tile CABAC substreams with entry
points, picture-level loop filters across tile boundaries — pinned
against the libavcodec oracle (which MCs from the full reference frame,
so any cross-tile read the encoder failed to constrain would mismatch)."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_e2e_intra import oracle_decode


def _cfg(w, h, tiles, **kw):
    kw.setdefault("deblocking_enabled", True)
    return StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, tile_cols=tiles, **kw)


def _run(cfg, frames, tmp_path, intra_period=8):
    from kvazzup_tpu.decoder.top import Decoder

    enc = Encoder(cfg, intra_period=intra_period)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    # self-decode (generic-tier tiles path) + libavcodec oracle
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for k, (rec, out) in enumerate(zip(recons, outs)):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {k} (self)")
    ref, log = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
    assert len(ref) == len(frames), log
    for k, (rec, out) in enumerate(zip(recons, ref)):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {k}")
    return stream, recons


def test_quad64_tiles_intra(tmp_path):
    w, h = 256, 128
    cfg = _cfg(w, h, 2)
    frames = synthetic_frames(w, h, 2, seed=31)
    _run(cfg, frames, tmp_path, intra_period=1)


def test_quad64_tiles_ip_production(tmp_path):
    """I+P+P+P over 2 tiles with the production tools that compose with
    MCTS: sao + deblock + merge5 + rdoq (wpp and tmvp are excluded with
    tiles, as in kvazaar's mv-constraint operating point)."""
    w, h = 256, 128
    cfg = _cfg(w, h, 2, sao_enabled=True, merge_cand=5, rdoq=True)
    frames = synthetic_frames(w, h, 5, seed=33)
    _run(cfg, frames, tmp_path)


def test_quad64_tiles_three_cols(tmp_path):
    """3 uniform tile columns: interior tile constrained on both sides."""
    w, h = 192, 128
    cfg = _cfg(w, h, 3, merge_cand=5)
    frames = synthetic_frames(w, h, 4, seed=35)
    _run(cfg, frames, tmp_path)


def test_quad64_tiles_untiled_unchanged():
    """xtile plumbing must not change the untiled quad64 P stream."""
    w, h = 128, 128
    frames = synthetic_frames(w, h, 3, seed=37)
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True, merge_cand=5)
    enc = Encoder(cfg, intra_period=8)
    streams = [enc.encode_frame(*f)[0] for f in frames]
    assert all(len(s) > 0 for s in streams)


def test_quad64_tiles_tmvp_production(tmp_path):
    """TMVP composed into the quad64 tiles path (VERDICT r4 ask #6): the
    collocated 16-grid store is sliced per tile column (temporal
    candidate cells are same-position, 8.5.3.2.8) and MCTS filters
    candidate selection.  Crosses an IDR refresh (intra_period=3) so the
    collocated store reset after the refresh is exercised too; pinned
    against the libavcodec oracle."""
    w, h = 256, 128
    cfg = _cfg(w, h, 2, sao_enabled=True, merge_cand=5, rdoq=True,
               temporal_mvp=True)
    frames = synthetic_frames(w, h, 5, seed=37)
    _run(cfg, frames, tmp_path, intra_period=3)
