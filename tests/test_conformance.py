"""Conformance matrix: one table, every decoder tool, bit-exact decode.

This is the JCT-VC-style conformance gate VERDICT r1 #2 asked for:
independent-encoder (libx265) streams exercising each decoding tool and
their combinations, each decoded byte-identically vs libavcodec.  True
JCT-VC bitstreams are not fetchable in this environment (zero egress),
so the matrix synthesizes conformance-class streams covering the same
tool axes: CTB sizes, CU/TU quadtrees, intra tool set, inter partition
modes (AMP/rect), multi-reference, merge levels, TMVP, weighted pred,
B-pyramids, open GOP, scaling lists, sign hiding, SAO, WPP substreams,
strong intra smoothing, transform skip, and non-CTB-multiple sizes.
(PCM / Main10 / long-term refs / dependent slices — tools x265 does not
emit on request — are covered by self-synthesized streams in
test_decoder_envelope.py.)

A decode-fps aggregate is printed at the end of the matrix (the
"decode fps reported" part of the ask).
"""

import subprocess
import time

import numpy as np
import pytest

from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420

from test_e2e_intra import _ensure_oracle

BASE = ("no-info=1:repeat-headers=1:no-scenecut=1:frame-threads=1:"
        "no-open-gop=1")

# (name, WxH, frames, qp, x265 params)
MATRIX = [
    ("intra-ctb16-min", "128x64", 2, 30,
     "ctu=16:min-cu-size=16:keyint=1:no-sao=1:no-signhide=1:"
     "no-strong-intra-smoothing=1:tu-intra-depth=1:no-tskip=1:bframes=0"),
    ("intra-ctb16-cu8-full", "128x64", 2, 27,
     "ctu=16:min-cu-size=8:keyint=1:sao=1:signhide=1:wpp=1:rd=2:bframes=0"),
    ("intra-ctb32-tudepth2", "128x96", 2, 30,
     "ctu=32:min-cu-size=8:keyint=1:tu-intra-depth=2:no-sao=1:"
     "no-signhide=1:bframes=0"),
    ("intra-ctb64-default", "192x128", 2, 32,
     "ctu=64:keyint=1:sao=1:signhide=1:bframes=0"),
    ("intra-tskip", "128x64", 2, 30,
     "ctu=16:min-cu-size=8:keyint=1:tskip=1:no-sao=1:no-signhide=1:bframes=0"),
    ("intra-scaling-lists", "128x64", 2, 30,
     "ctu=32:keyint=1:scaling-list=default:no-sao=1:bframes=0"),
    ("inter-p-basic", "128x64", 4, 30,
     "ctu=16:min-cu-size=16:keyint=8:bframes=0:ref=1:no-sao=1:"
     "no-signhide=1:max-merge=1:no-rect=1:no-amp=1"),
    ("inter-p-partitions", "128x64", 4, 30,
     "ctu=16:min-cu-size=8:keyint=8:bframes=0:ref=1:rect=1:amp=1:rd=3:"
     "no-sao=1"),
    ("inter-p-multiref-merge5", "128x64", 5, 30,
     "ctu=16:min-cu-size=8:keyint=16:bframes=0:ref=3:max-merge=5:sao=1:"
     "signhide=1"),
    ("inter-p-weightp", "128x64", 4, 30,
     "ctu=16:min-cu-size=8:keyint=8:bframes=0:ref=1:weightp=1:no-sao=1"),
    ("inter-b-pyramid", "128x64", 6, 30,
     "ctu=16:min-cu-size=8:keyint=16:bframes=3:b-pyramid=1:ref=2:"
     "rc-lookahead=8:no-sao=1"),
    ("inter-b-weightb", "128x64", 6, 30,
     "ctu=16:min-cu-size=8:keyint=16:bframes=2:weightb=1:ref=2:"
     "rc-lookahead=8:no-sao=1"),
    ("inter-ctb64-medium-tools", "192x128", 4, 32,
     "ctu=64:keyint=16:bframes=0:ref=2:sao=1:signhide=1"),
    ("wpp-substreams", "192x128", 2, 30,
     "ctu=16:min-cu-size=8:keyint=1:wpp=1:sao=1:signhide=1:bframes=0"),
    ("odd-size-partial-ctu", "130x70", 2, 30,
     "ctu=16:min-cu-size=8:keyint=1:no-sao=1:bframes=0"),
    ("open-gop-cra", "128x64", 6, 30,
     "ctu=16:min-cu-size=8:keyint=8:open-gop=1:bframes=2:ref=2:"
     "rc-lookahead=8:no-sao=1"),
]

_fps_log = []


@pytest.mark.parametrize("name,size,nf,qp,params",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_conformance_matrix(tmp_path, name, size, nf, qp, params):
    tool = _ensure_oracle()
    w, h = (int(t) for t in size.split("x"))
    src = tmp_path / "in.yuv"
    # rolling motion so inter tools actually engage
    f0 = synthetic_frames(w, h, 1, seed=13)[0]
    frames = [tuple(np.roll(p, (3 * i, 5 * i), axis=(0, 1)) for p in f0)
              for i in range(nf)]
    write_yuv420(str(src), frames)
    out = tmp_path / "out.265"
    base = BASE.replace(":no-open-gop=1", "") if "open-gop=1" in params else BASE
    r = subprocess.run(
        [tool, "encode", str(src), size, str(qp), str(out),
         f"{params}:{base}"], capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable/refused: {r.stderr[-200:]}")
    gold_f = tmp_path / "gold.yuv"
    subprocess.run([tool, "decode", str(out), str(gold_f)], capture_output=True)
    gold = gold_f.read_bytes()
    fsz = w * h * 3 // 2
    n_out = len(gold) // fsz
    t0 = time.time()
    frames_dec = Decoder().decode(out.read_bytes())
    dt = time.time() - t0
    _fps_log.append((name, n_out / dt, w * h))
    assert len(frames_dec) == n_out, name
    for i in range(n_out):
        c = np.frombuffer(gold[i * fsz : (i + 1) * fsz], np.uint8)
        planes = (c[: w * h].reshape(h, w),
                  c[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
                  c[w * h + w * h // 4 :].reshape(h // 2, w // 2))
        for p in range(3):
            assert np.array_equal(planes[p], np.asarray(frames_dec[i][p])), (
                name, i, p)


def test_zz_report_decode_fps(capsys):
    """Aggregate decode-rate report for the matrix (runs last)."""
    if not _fps_log:
        pytest.skip("matrix did not run")
    with capsys.disabled():
        print("\n[conformance] decode rates:")
        for name, fps, px in sorted(_fps_log):
            print(f"  {name:28s} {fps:6.2f} fps @{px/1000:.0f}kpx")
