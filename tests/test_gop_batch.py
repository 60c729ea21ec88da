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


def test_gop_batch_quad64_production_byte_identical():
    """The quad64 production combo (wpp+sao+deblock+merge5+tmvp+rdoq)
    through the batched scheduler == the sequential encoder, byte for
    byte (VERDICT r2: gop_batch beyond CTB16)."""
    w, h = 128, 128
    frames = synthetic_frames(w, h, 10, seed=7)
    cfg = StreamConfig(width=w, height=h, qp=30, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True,
                       sao_enabled=True, wpp=True, merge_cand=5,
                       temporal_mvp=True, rdoq=True)
    ref = encode_sequential_reference(cfg, frames, gop_size=4)
    got = GopBatchDeviceEncoder(cfg, gop_size=4, batch=2).encode(frames)
    assert got == ref


def test_gop_batch_quad64_decodes():
    from kvazzup_tpu.decoder.top import Decoder

    w, h = 128, 64
    frames = synthetic_frames(w, h, 6, seed=9)
    cfg = StreamConfig(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, deblocking_enabled=True)
    stream = GopBatchDeviceEncoder(cfg, gop_size=3, batch=2).encode(frames)
    outs = Decoder().decode(stream)
    assert len(outs) == 6
