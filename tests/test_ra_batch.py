"""QuadRABatchEncoder (level-batched RA B-pyramid) must be byte-identical
to the sequential QuadRAEncoder — vmap batches the same ops per lane and
the finish tail is shared code (encoder/ra_batch.py)."""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.ra import QuadRAEncoder
from kvazzup_tpu.encoder.ra_batch import QuadRABatchEncoder
from kvazzup_tpu.io.yuv import synthetic_frames


def _cfg(w, h, **kw):
    kw.setdefault("deblocking_enabled", True)
    return StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, num_reorder_pics=3,
                        max_dec_pic_buffering=6, **kw)


def _encode(enc_cls, cfg, frames, gop_size, **kw):
    enc = enc_cls(cfg, gop_size=gop_size, intra_period=32)
    nals = {}
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v, **kw):
            nals[poc] = nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        nals[poc] = nal
        recs[poc] = rec
    return nals, recs


def test_ra_batch_gop8_byte_identical():
    w, h = 192, 128
    frames = synthetic_frames(w, h, 11, seed=17)
    cfg = _cfg(w, h, wpp=True, sao_enabled=True, merge_cand=5,
               temporal_mvp=True, rdoq=True)
    seq, seq_r = _encode(QuadRAEncoder, cfg, frames, 8)
    bat, bat_r = _encode(QuadRABatchEncoder, cfg, frames, 8)
    assert sorted(seq) == sorted(bat)
    for poc in sorted(seq):
        assert seq[poc] == bat[poc], f"stream mismatch at poc {poc}"
        for a, b in zip(seq_r[poc], bat_r[poc]):
            np.testing.assert_array_equal(a, b)


# gop4 lives in test_ra_batch_gop4.py: one heavy byte-identity case per
# xdist worker keeps each below the jaxlib compile-count segfault
# threshold (see pytest.ini).
