"""Device-batched GOP parallelism: byte-identity with the sequential
encoder (the gop_parallel.py contract, now with the batch riding vmap)."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.pipeline.gop_batch import GopBatchDeviceEncoder
from kvazzup_tpu.pipeline.gop_parallel import encode_sequential_reference


@pytest.mark.parametrize("sao,wpp", [(False, False), (True, True)])
def test_gop_batch_byte_identical(sao, wpp):
    w, h = 96, 64
    frames = synthetic_frames(w, h, 10, seed=3)
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=True,
                       sao_enabled=sao, wpp=wpp)
    ref = encode_sequential_reference(cfg, frames, gop_size=4)
    got = GopBatchDeviceEncoder(cfg, gop_size=4, batch=2).encode(frames)
    assert got == ref


def test_gop_batch_decodes(tmp_path):
    from kvazzup_tpu.decoder.top import Decoder

    w, h = 96, 64
    frames = synthetic_frames(w, h, 8, seed=5)
    cfg = StreamConfig(width=w, height=h, qp=32, deblocking_enabled=True)
    stream = GopBatchDeviceEncoder(cfg, gop_size=4, batch=2).encode(frames)
    outs = Decoder().decode(stream)
    assert len(outs) == 8
