"""Closed-loop rate control: hit a bitrate target with bounded QP motion.

Counterpart of kvazaar's rate_control.c behavior as exercised through the
reference's bitrate setting (kvazaarfilter.cpp videoBitrate mapping) and
the RTCP feedback loop (uvgrtpsender.cpp:121-148 -> resourceallocator).
"""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.pipeline.rate_control import RateController

from test_e2e_intra import synthetic_frames


def _encode_sequence(bitrate, n=24, w=128, h=64, fps=30.0, intra_period=8):
    frames = []
    base = synthetic_frames(w, h, 2, seed=3)
    rng = np.random.default_rng(0)
    for i in range(n):
        y, u, v = base[i % 2]
        dy = rng.integers(0, 7, y.shape).astype(np.uint8)
        frames.append((np.clip(y + dy, 0, 255).astype(np.uint8), u, v))
    cfg = StreamConfig(width=w, height=h, qp=32)
    enc = Encoder(cfg, intra_period=intra_period)
    rc = RateController(bitrate, fps, base_qp=32)
    total_bits = 0
    qps = []
    for i, (y, u, v) in enumerate(frames):
        is_idr = i % intra_period == 0
        qp = rc.frame_qp(is_idr)
        qps.append(qp)
        stream, _ = enc.encode_frame(y, u, v, qp=qp)
        rc.update(qp, len(stream) * 8, is_idr)
        total_bits += len(stream) * 8
    achieved = total_bits * fps / n
    return achieved, qps


def test_converges_to_target():
    target = 600_000  # 600 kbit/s at 128x64/30 — generous but reachable
    achieved, qps = _encode_sequence(target)
    # within 35% after only 24 frames (IDR transient included)
    assert 0.65 * target < achieved < 1.35 * target, (achieved, qps)


def test_qp_rises_for_tight_budget():
    _, qps_loose = _encode_sequence(2_000_000, n=12)
    _, qps_tight = _encode_sequence(150_000, n=12)
    assert np.mean(qps_tight[4:]) > np.mean(qps_loose[4:]) + 3


def test_slew_limited():
    _, qps = _encode_sequence(300_000, n=16)
    diffs = np.abs(np.diff(qps))
    assert diffs.max() <= 6


def test_retarget_reacts():
    rc = RateController(1_000_000, 30.0, base_qp=30)
    qp0 = rc.frame_qp()
    rc.update(qp0, 1_000_000 / 30)  # exactly on budget
    rc.retarget(250_000)  # RTCP says congestion
    # drive a few frames: produced bits still sized for the old budget
    qps = []
    for _ in range(6):
        qp = rc.frame_qp()
        qps.append(qp)
        rc.update(qp, 800_000 / 30)
    assert qps[-1] > qp0  # QP must climb to shed bitrate
