"""RA quad64 open-GOP intra refresh — own file for xdist load spreading
(see tests/ra_quad_common.py)."""

from tests.ra_quad_common import _cfg, _moving_frames, _run_ra


def test_ra_quad_open_gop_refresh(tmp_path):
    """intra_period=8: the second anchor is an open-GOP I (TRAIL_R I
    slice), its trailing Bs keep the previous anchor alive via RPS."""
    w, h = 128, 64
    frames = _moving_frames(w, h, 17, seed=9)
    stream, _ = _run_ra(_cfg(w, h), frames, tmp_path, gop_size=8,
                        intra_period=8)
    # exactly one IDR (stream start); refreshes are non-IRAP I slices
    assert stream.count(b"\x00\x00\x01\x26") == 1
