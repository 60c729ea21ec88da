"""QuadRABatchEncoder gop4 byte-identity — own file for xdist worker
compile-budget spreading (see tests/test_ra_batch.py)."""

from kvazzup_tpu.encoder.ra import QuadRAEncoder
from kvazzup_tpu.encoder.ra_batch import QuadRABatchEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_ra_batch import _cfg, _encode


def test_ra_batch_gop4_byte_identical():
    w, h = 128, 64
    frames = synthetic_frames(w, h, 9, seed=19)
    cfg = _cfg(w, h)
    seq, _ = _encode(QuadRAEncoder, cfg, frames, 4)
    bat, _ = _encode(QuadRABatchEncoder, cfg, frames, 4)
    assert sorted(seq) == sorted(bat)
    for poc in sorted(seq):
        assert seq[poc] == bat[poc], f"stream mismatch at poc {poc}"
