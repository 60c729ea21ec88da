"""Random-access B-pyramid on the CTB64 quad device engines (encoder/ra.py):
gop4/gop8 hierarchical coding, oracle-exact vs libavcodec, self-decode
bit-exact, and static-content skip behavior.  The production-toolset combo
and open-GOP refresh live in test_ra_quad_combo.py / test_ra_quad_refresh.py
so xdist's per-file workers stay below the jaxlib compile-count segfault
threshold (pytest.ini)."""

from tests.ra_quad_common import _cfg, _moving_frames, _run_ra


def test_ra_quad_gop8(tmp_path):
    """One full gop8 pyramid + LD tail, deblocking on."""
    w, h = 128, 128
    frames = _moving_frames(w, h, 11)
    _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8)


def test_ra_quad_gop4(tmp_path):
    w, h = 128, 64
    frames = _moving_frames(w, h, 7)
    _run_ra(_cfg(w, h), frames, tmp_path, gop_size=4, intra_period=16)


def test_ra_quad_static_content_skips(tmp_path):
    """Static content in B layers must code mostly as skip."""
    w, h = 128, 64
    f0 = _moving_frames(w, h, 1)[0]
    frames = [f0] * 9
    stream, _ = _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8)
    nals = stream.split(b"\x00\x00\x01")
    sizes = [len(n) for n in nals if n[:1] == b"\x02"]  # TRAIL_R
    idr = [len(n) for n in nals if n[:1] == b"\x26"]
    assert idr and sizes
    assert max(sizes) < idr[0] / 8
