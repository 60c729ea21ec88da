"""CU-tree lookahead (encoder/lookahead.py) on the RA-quad64 path.

Decision-layer feature: the offsets steer per-CTB QP through the
qp_map x RA surface (kvazaarfilter.cpp:423-431 analogue), so streams
must stay libavcodec-exact with the tree enabled — and the propagation
itself must put the cuts where references live (the anchor)."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.lookahead import cutree_offsets
from kvazzup_tpu.encoder.ra import _GOP4, QuadRAEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_e2e_intra import oracle_decode


def _cfg(w, h, **kw):
    return StreamConfig(width=w, height=h, qp=34, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, cu_qp_delta=True,
                        deblocking_enabled=True, num_reorder_pics=2,
                        max_dec_pic_buffering=5, **kw)


def test_cutree_offsets_concentrate_on_anchor():
    """Static content propagates fully: the gop4 anchor (display off 4,
    referenced by every B) gets the deepest cuts; offsets are <= 0."""
    w, h = 192, 128
    frames = synthetic_frames(w, h, 5, seed=11)
    static = [frames[0]] * 4  # offsets 1..4, identical -> full propagation
    offs = cutree_offsets(static, frames[0][0], _GOP4, 32,
                          width=w, height=h, strength=2.0)
    assert sorted(offs) == [1, 2, 3, 4]
    for o in offs.values():
        assert o.shape == (h // 64, w // 64)
        assert o.max() <= 0
    # anchor is referenced (directly or transitively) by B2, B1, B3
    assert offs[4].mean() < offs[1].mean()
    assert offs[4].min() <= -2


def test_cutree_disabled_needs_cu_qp_delta(monkeypatch):
    monkeypatch.setenv("KVZ_TPU_RA_CUTREE", "2.0")
    cfg = StreamConfig(width=192, height=128, qp=34, ctb_log2=6,
                       min_cb_log2=3, max_tb_log2=5,
                       num_reorder_pics=2, max_dec_pic_buffering=5)
    with pytest.raises(ValueError, match="cu_qp_delta"):
        QuadRAEncoder(cfg, gop_size=4, intra_period=16)


def test_ra_quad_cutree_oracle_exact(tmp_path, monkeypatch):
    """gop4 pyramid with the cu-tree active, full production toolset:
    self-decode and libavcodec byte-identity."""
    monkeypatch.setenv("KVZ_TPU_RA_CUTREE", "2.0")
    w, h = 192, 128
    cfg = _cfg(w, h, wpp=True, sao_enabled=True, merge_cand=5, rdoq=True)
    frames = synthetic_frames(w, h, 6, seed=7)
    enc = QuadRAEncoder(cfg, gop_size=4, intra_period=16)
    stream = b""
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            stream += nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recs[poc] = rec
    assert sorted(recs) == list(range(len(frames)))
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for k, poc in enumerate(sorted(recs)):
        for a, b in zip(recs[poc], outs[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (self)")
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == len(frames), log
    for k, poc in enumerate(sorted(recs)):
        for a, b in zip(recs[poc], ref[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (oracle)")
