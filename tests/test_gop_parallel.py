"""GOP-parallel distribution (pipeline/gop_parallel.py): closed-GOP
segments encoded by a worker pool concatenate byte-identically to the
sequential encoder (SURVEY §2.7 OWF / §2.8 DCN GOP distribution)."""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.pipeline.gop_parallel import (
    GopParallelEncoder,
    encode_sequential_reference,
)


def test_gop_parallel_byte_identical():
    w, h = 64, 64
    frames = synthetic_frames(w, h, 6, seed=6)
    cfg = StreamConfig(width=w, height=h, qp=32)
    seq = encode_sequential_reference(cfg, frames, gop_size=3)
    par = GopParallelEncoder(cfg, gop_size=3, workers=2).encode(frames)
    assert par == seq
    dec = Decoder().decode(par)
    assert len(dec) == 6


def test_gop_parallel_custom_executor():
    """Any object with .map plugs in — the remote/DCN pool hook."""

    class Inline:
        def map(self, fn, jobs):
            return [fn(j) for j in jobs]

    w, h = 64, 64
    frames = synthetic_frames(w, h, 4, seed=2)
    cfg = StreamConfig(width=w, height=h, qp=33)
    par = GopParallelEncoder(cfg, gop_size=2, executor=Inline()).encode(frames)
    seq = encode_sequential_reference(cfg, frames, gop_size=2)
    assert par == seq
