"""RA quad64 production-toolset combo (wpp + sao + deblock + merge5 + tmvp
+ rdoq) — in its own file so its heavy multi-GOP compile load gets a
dedicated xdist worker (see pytest.ini / tests/ra_quad_common.py)."""

from tests.ra_quad_common import _cfg, _moving_frames, _run_ra


def test_ra_quad_production_combo(tmp_path):
    """The full production toolset: wpp + sao + deblock + merge5 + tmvp
    + rdoq over two gop8 groups."""
    w, h = 192, 128
    frames = _moving_frames(w, h, 17, seed=7)
    cfg = _cfg(w, h, qp=30, wpp=True, sao_enabled=True, merge_cand=5,
               temporal_mvp=True, rdoq=True)
    _run_ra(cfg, frames, tmp_path, gop_size=8)
