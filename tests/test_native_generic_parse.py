"""Native generic-tier CABAC parse (native/slice_cabac.c
parse_generic_slice_c): the openHEVC-class split of C parse + replayed
reconstruction (SURVEY §2.6).

Pins two properties the alien-decode suite alone cannot:
- ENGAGEMENT: the native parser actually handles the stream instead of
  silently falling back to the Python CABAC (a fallback would keep every
  bit-exactness test green while quietly losing the speedup).
- EQUIVALENCE: native-parse decode output is byte-identical to the pure
  Python path (KVZ_TPU_NO_NATIVE=1) on the same stream.
"""

import os
import subprocess

import numpy as np
import pytest

import kvazzup_tpu.decoder.native_parse as native_parse
import kvazzup_tpu.decoder.native_recon as native_recon
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420
from kvazzup_tpu.native import get_lib

from test_e2e_intra import _ensure_oracle


def _x265(tmp_path, params, w=192, h=128, n=3, qp=30):
    tool = _ensure_oracle()
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), synthetic_frames(w, h, n, seed=5))
    out = tmp_path / "out.265"
    r = subprocess.run(
        [tool, "encode", str(src), f"{w}x{h}", str(qp), str(out), params],
        capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-200:]}")
    return out.read_bytes()


def _decode_both(stream):
    """Decode with the native tiers and with the Python fallback; return
    (native_frames, python_frames, ok_delta, fb_delta).  ok counts
    pictures handled natively by EITHER tier (full C recon preferred,
    replay parse as fallback); fb counts pictures neither tier took."""
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rok0, pok0 = native_recon.RECON_OK, native_parse.PARSE_OK
    pfb0 = native_parse.PARSE_FALLBACK
    nat = Decoder().decode(stream)
    rok1, pok1 = native_recon.RECON_OK, native_parse.PARSE_OK
    pfb1 = native_parse.PARSE_FALLBACK
    os.environ["KVZ_TPU_NO_NATIVE"] = "1"
    try:
        py = Decoder().decode(stream)
    finally:
        del os.environ["KVZ_TPU_NO_NATIVE"]
    return nat, py, (rok1 - rok0) + (pok1 - pok0), pfb1 - pfb0


def _decode_recon_only(stream):
    """Decode asserting the FULL-RECON tier took every picture."""
    rok0, rfb0 = native_recon.RECON_OK, native_recon.RECON_FALLBACK
    nat = Decoder().decode(stream)
    rok1, rfb1 = native_recon.RECON_OK, native_recon.RECON_FALLBACK
    return nat, rok1 - rok0, rfb1 - rfb0


CASES = [
    # x265 medium defaults: CTB64 quadtree, AMP, SAO, signhide, WPP, I+P
    ("medium-wpp", "no-scenecut=1:repeat-headers=1:frame-threads=1:keyint=25"),
    # non-WPP single-segment path
    ("no-wpp", "no-scenecut=1:repeat-headers=1:frame-threads=1:keyint=25:"
               "no-wpp=1"),
    # multi-slice (per-segment state persistence in GenericParseState;
    # this build of x265 requires WPP with slices)
    ("slices", "no-scenecut=1:repeat-headers=1:frame-threads=1:keyint=25:"
               "slices=2"),
]


@pytest.mark.parametrize("tag,params", CASES, ids=[c[0] for c in CASES])
def test_native_parse_engages_and_matches(tmp_path, tag, params):
    stream = _x265(tmp_path, params)
    nat, py, ok, fb = _decode_both(stream)
    assert ok > 0, "native parser never engaged"
    assert fb == 0, "native parser fell back on some picture"
    assert len(nat) == len(py) and len(nat) >= 3
    for i in range(len(nat)):
        for p in range(3):
            assert np.array_equal(np.asarray(nat[i][p]),
                                  np.asarray(py[i][p])), (i, p)


@pytest.mark.parametrize("tag,params", CASES, ids=[c[0] for c in CASES])
def test_native_full_recon_engages(tmp_path, tag, params):
    """The full C-reconstruction tier (not just replay parse) must take
    every picture of these 8-bit flat-scaling streams."""
    stream = _x265(tmp_path, params)
    if get_lib() is None:
        pytest.skip("native library unavailable")
    nat, ok, fb = _decode_recon_only(stream)
    assert ok > 0, "full-recon tier never engaged"
    assert fb == 0, "full-recon tier fell back on some picture"
    assert len(nat) >= 3
