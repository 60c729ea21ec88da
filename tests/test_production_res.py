"""Production-resolution (1080p) regression tests, slow-marked.

Pins the claims from the round-1/2 work at the real operating point
(VERDICT round-1 weak #5: "tests never leave toy resolutions"):
- x265 MEDIUM-preset 1080p streams decode byte-identically (openHEVC
  replacement claim, SURVEY §2.6).
- our own 1080p low-delay I/P encode (fast schedule + merge candidates)
  round-trips bit-exactly through our decoder AND libavcodec.

Run with: python -m pytest tests/test_production_res.py -m slow
(collected by default too; they just take a couple of minutes each).
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420

from test_e2e_intra import _ensure_oracle


def _planes(raw, i, w, h):
    fsz = w * h * 3 // 2
    c = np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8)
    return (c[: w * h].reshape(h, w),
            c[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
            c[w * h + w * h // 4 :].reshape(h // 2, w // 2))


@pytest.mark.slow
def test_1080p_x265_medium_decode_bit_exact(tmp_path):
    """x265's full default (medium) preset at 1080p: CTB64 quadtree, AMP,
    SAO, signhide, WPP, B-frames off (keyint covers I+P) — alien-stream
    decode must match libavcodec byte for byte."""
    tool = _ensure_oracle()
    w, h = 1920, 1080
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), synthetic_frames(w, h, 2, seed=3))
    out = tmp_path / "out.265"
    r = subprocess.run(
        [tool, "encode", str(src), f"{w}x{h}", "30", str(out),
         "no-scenecut=1:repeat-headers=1:frame-threads=1:keyint=25"],
        capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-200:]}")
    gold_f = tmp_path / "gold.yuv"
    subprocess.run([tool, "decode", str(out), str(gold_f)], capture_output=True)
    gold = gold_f.read_bytes()
    fsz = w * h * 3 // 2
    nf = len(gold) // fsz
    frames = Decoder().decode(out.read_bytes())
    assert len(frames) == nf
    for i in range(nf):
        for p, plane in enumerate(_planes(gold, i, w, h)):
            assert np.array_equal(plane, np.asarray(frames[i][p])), (i, p)


@pytest.mark.slow
def test_1080p_own_low_delay_p_roundtrip(tmp_path):
    """Own encoder at 1080p: fast-schedule I+P+P with merge candidates and
    deblocking — our decode AND libavcodec's decode match the recon."""
    w, h = 1920, 1088
    cfg = StreamConfig(width=w, height=h, qp=32, deblocking_enabled=True,
                       merge_cand=3)
    enc = Encoder(cfg, intra_period=16)
    stream = b""
    recons = []
    for (y, u, v) in synthetic_frames(w, h, 3, seed=5):
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    outs = Decoder().decode(stream)
    assert len(outs) == len(recons)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b)
    tool = _ensure_oracle()
    f265 = tmp_path / "own.265"
    f265.write_bytes(stream)
    gold_f = tmp_path / "gold.yuv"
    r = subprocess.run([tool, "decode", str(f265), str(gold_f)],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip("libavcodec oracle unavailable")
    gold = gold_f.read_bytes()
    assert len(gold) // (w * h * 3 // 2) == len(recons)
    for i, rec in enumerate(recons):
        for p, plane in enumerate(_planes(gold, i, w, h)):
            assert np.array_equal(plane, rec[p]), (i, p)


@pytest.mark.slow
def test_1080p_wpp_substream_decode(tmp_path):
    """WPP entry points at production size (68 CTB rows -> 68 substreams
    with EBSP-domain offsets, commit f93b6ca's claim pinned at full size).
    1088 keeps whole CTUs -> device fast tier (1080 = partial bottom row
    -> generic tier, covered by the medium-preset test above)."""
    tool = _ensure_oracle()
    w, h = 1920, 1088
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), synthetic_frames(w, h, 2, seed=11))
    out = tmp_path / "out.265"
    r = subprocess.run(
        [tool, "encode", str(src), f"{w}x{h}", "32", str(out),
         "ctu=16:min-cu-size=8:tu-intra-depth=1:no-tskip=1:keyint=1:"
         "wpp=1:sao=1:signhide=1:frame-threads=1:no-scenecut=1:"
         "repeat-headers=1:no-info=1:bframes=0:ref=1:rd=2"],
        capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-200:]}")
    gold_f = tmp_path / "gold.yuv"
    subprocess.run([tool, "decode", str(out), str(gold_f)], capture_output=True)
    gold = gold_f.read_bytes()
    fsz = w * h * 3 // 2
    nf = len(gold) // fsz
    frames = Decoder().decode(out.read_bytes())
    assert len(frames) == nf
    for i in range(nf):
        for p, plane in enumerate(_planes(gold, i, w, h)):
            assert np.array_equal(plane, np.asarray(frames[i][p])), (i, p)
