"""Session parallelism (SURVEY §2.7): N calls batched per device dispatch,
each session's stream byte-identical to a dedicated sequential Encoder."""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.pipeline.sessions import MultiSessionEncoder


def test_multisession_byte_identical():
    w, h, n_frames, period = 96, 64, 5, 4
    cfg = StreamConfig(width=w, height=h, qp=30, wpp=True,
                       deblocking_enabled=True, sao_enabled=True)
    # three sessions with distinct content
    sess = [synthetic_frames(w, h, n_frames, seed=70 + k) for k in range(3)]

    streams = [b"", b"", b""]
    with MultiSessionEncoder(cfg, 3, intra_period=period) as mse:
        for t in range(n_frames):
            for k, chunk in enumerate(mse.push([sess[k][t] for k in range(3)])):
                streams[k] += chunk

    for k in range(3):
        ref_enc = Encoder(cfg, intra_period=period, vps_period=1)
        ref = b"".join(ref_enc.encode_frame(*f)[0] for f in sess[k])
        assert streams[k] == ref, f"session {k} diverges from sequential"
        # and each stream round-trips through the decoder
        frames = Decoder().decode(streams[k])
        assert len(frames) == n_frames


def test_multisession_staggered_intra():
    """Sessions joining mid-call have staggered IDR phases: the I and P
    groups batch separately but stay byte-identical per session."""
    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=32, wpp=True)
    a = synthetic_frames(w, h, 4, seed=80)
    b = synthetic_frames(w, h, 4, seed=81)
    out_a = b""
    out_b = b""
    with MultiSessionEncoder(cfg, 2, intra_period=3) as mse:
        # stagger: session B "joins" one frame later by feeding a repeat
        seq_a = [a[0], a[1], a[2], a[3]]
        seq_b = [b[0], b[0], b[1], b[2]]
        for t in range(4):
            ca, cb = mse.push([seq_a[t], seq_b[t]])
            out_a += ca
            out_b += cb
    for stream, seq in ((out_a, seq_a), (out_b, seq_b)):
        ref_enc = Encoder(cfg, intra_period=3, vps_period=1)
        ref = b"".join(ref_enc.encode_frame(*f)[0] for f in seq)
        assert stream == ref
