"""End-to-end all-intra tests: encode -> self-decode (bit-exact) -> external
conformance oracle (libavcodec HEVC decoder) -> bit-exact reconstruction.

This is the PR1 acceptance gate (BASELINE.json configs[0]): conformant
all-intra encode, decodable by an independent decoder, with our own decoder
matching bit-for-bit.
"""

import os
import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import psnr, synthetic_frames

HEVCREF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "hevcref")


def _is_fresh(src: str) -> bool:
    return os.path.exists(HEVCREF) and \
        os.path.getmtime(HEVCREF) >= os.path.getmtime(src)


def _ensure_oracle() -> str:
    """Build the libavcodec conformance oracle on first use.

    Race-safe for xdist: at round start every worker sees a stale binary
    at once; an exclusive flock serializes the build and the compile goes
    to a temp path + atomic rename so no worker ever execs a file that is
    open for writing (ETXTBSY)."""
    src = HEVCREF + ".c"
    if _is_fresh(src):
        return HEVCREF
    import fcntl

    with open(HEVCREF + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if not _is_fresh(src):
            tmp = f"{HEVCREF}.build.{os.getpid()}"
            subprocess.run(
                ["gcc", "-O2", src, "-o", tmp, "-lavcodec", "-lavutil"],
                check=True)
            os.replace(tmp, HEVCREF)
    return HEVCREF


def oracle_decode(stream: bytes, w: int, h: int, tmp_path):
    _ensure_oracle()
    inp = tmp_path / "t.265"
    out = tmp_path / "t.yuv"
    inp.write_bytes(stream)
    r = subprocess.run([HEVCREF, "decode", str(inp), str(out)], capture_output=True, text=True)
    data = out.read_bytes()
    frames = []
    fsz = w * h * 3 // 2
    for i in range(len(data) // fsz):
        chunk = np.frombuffer(data[i * fsz : (i + 1) * fsz], dtype=np.uint8)
        frames.append(
            (
                chunk[: w * h].reshape(h, w),
                chunk[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
                chunk[w * h + w * h // 4 :].reshape(h // 2, w // 2),
            )
        )
    return frames, r.stderr


def _content(kind: str, w: int, h: int):
    if kind == "synthetic":
        return synthetic_frames(w, h, 1, seed=3)[0]
    if kind == "flat":
        return (
            np.full((h, w), 128, np.uint8),
            np.full((h // 2, w // 2), 64, np.uint8),
            np.full((h // 2, w // 2), 192, np.uint8),
        )
    if kind == "noise":
        rng = np.random.default_rng(9)
        return (
            rng.integers(0, 256, (h, w), np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.uint8),
        )
    if kind == "extremes":
        y = np.zeros((h, w), np.uint8)
        y[::2, :] = 255
        y[:, : w // 2] = 0
        y[h // 2 :, w // 2 :] = 255
        return y, np.zeros((h // 2, w // 2), np.uint8), np.full((h // 2, w // 2), 255, np.uint8)
    raise ValueError(kind)


@pytest.mark.parametrize("qp", [12, 32, 47])
def test_e2e_qp_sweep(qp, tmp_path):
    w, h = 64, 48
    cfg = StreamConfig(width=w, height=h, qp=qp)
    y, u, v = _content("synthetic", w, h)
    stream, recon = Encoder(cfg).encode_frame(y, u, v)
    outs = Decoder().decode(stream)
    assert len(outs) == 1
    for a, b in zip(recon, outs[0]):
        np.testing.assert_array_equal(a, b)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == 1, log
    for a, b in zip(recon, ref[0]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("kind", ["flat", "noise", "extremes"])
def test_e2e_content(kind, tmp_path):
    w, h = 64, 48
    cfg = StreamConfig(width=w, height=h, qp=30)
    y, u, v = _content(kind, w, h)
    stream, recon = Encoder(cfg).encode_frame(y, u, v)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == 1, log
    for a, b in zip(recon, ref[0]):
        np.testing.assert_array_equal(a, b)
    outs = Decoder().decode(stream)
    for a, b in zip(recon, outs[0]):
        np.testing.assert_array_equal(a, b)


def test_quality_reasonable(tmp_path):
    w, h = 64, 48
    y, u, v = _content("synthetic", w, h)
    cfg = StreamConfig(width=w, height=h, qp=22)
    stream, recon = Encoder(cfg).encode_frame(y, u, v)
    assert psnr(y, recon[0]) > 33.0


@pytest.mark.parametrize("qp", [22, 37])
def test_e2e_deblocking(qp, tmp_path):
    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=qp, deblocking_enabled=True)
    y, u, v = _content("synthetic", w, h)
    stream, recon = Encoder(cfg).encode_frame(y, u, v)
    outs = Decoder().decode(stream)
    for a, b in zip(recon, outs[0]):
        np.testing.assert_array_equal(a, b)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == 1, log
    for a, b in zip(recon, ref[0]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("wpp", [False, True])
def test_roi_cu_qp_delta(wpp, tmp_path):
    """Per-CTU adaptive QP (cu_qp_delta): ROI coded finer, oracle-exact."""
    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=34, cu_qp_delta=True,
                       deblocking_enabled=True, wpp=wpp)
    enc = Encoder(cfg)
    y, u, v = _content("synthetic", w, h)
    qp_map = np.full((cfg.ctbs_h, cfg.ctbs_w), 34, np.int32)
    qp_map[1:3, 1:5] = 26
    stream, recon = enc.encode_frame(y, u, v, qp_map=qp_map)
    outs = Decoder().decode(stream)
    for a, b in zip(recon, outs[0]):
        np.testing.assert_array_equal(a, b)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == 1, log
    for a, b in zip(recon, ref[0]):
        np.testing.assert_array_equal(a, b)
    assert psnr(y[16:48, 16:80], recon[0][16:48, 16:80]) > psnr(y[:16, :], recon[0][:16, :]) + 3
