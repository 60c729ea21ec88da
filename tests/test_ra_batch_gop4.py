"""QuadRABatchEncoder gop4 byte-identity — own file for xdist worker
compile-budget spreading; sequential reference in a subprocess (see
tests/test_ra_batch.py)."""

import os

os.environ["KVZ_TPU_CACHE_NO_PUT"] = "1"  # see tests/test_ra_batch.py
os.environ["KVZ_TPU_QUAD_UNROLL"] = "1"
os.environ["KVZ_TPU_WAVE_UNROLL"] = "1"

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.ra_batch import QuadRABatchEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_ra_batch import (_cfg_kwargs, _encode,
                                 _encode_seq_subprocess)


def test_ra_batch_gop4_byte_identical(tmp_path):
    w, h = 128, 64
    frames = synthetic_frames(w, h, 9, seed=19)
    kwargs = _cfg_kwargs(w, h)
    seq = _encode_seq_subprocess(kwargs, frames, 4, tmp_path)
    bat, _ = _encode(QuadRABatchEncoder, StreamConfig(**kwargs), frames, 4)
    assert sorted(seq) == sorted(bat)
    for poc in sorted(seq):
        assert seq[poc] == bat[poc], f"stream mismatch at poc {poc}"
