"""Native B-slice quad walker (slice_cabac.c qw_p_cu B branch) vs the
Python _QuadWriterB: byte-identical payloads over hand-built trees that
cover every B leaf kind (skip / merge / AMVP L0/L1/BI / intra) at CU64,
CU32 and CU16, plain and WPP."""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.entropy import quad as quad_mod
from kvazzup_tpu.entropy.quad import (encode_slice_data_b_quad,
                                      encode_slice_data_b_quad_wpp)
from kvazzup_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def _lev(n, seed, density=0.15):
    rng = np.random.default_rng(seed)
    a = rng.integers(-4, 5, size=(n, n)).astype(np.int32)
    return (a * (rng.random((n, n)) < density)).astype(np.int32)


def _zeros(n):
    return np.zeros((n, n), np.int32)


def _inter(n, ct, dr, seed, merge_idx=0, mvd=((0, 0), (0, 0)),
           mvp=(0, 0), skip=False):
    mv = [[0, 0], [0, 0]]
    for l in range(2):
        if dr & (1 << l):
            mv[l] = [4 * (l + 1), -8]
    return dict(
        size=n, ctype=ct, pf=(dr & 1, (dr >> 1) & 1), inter_dir=dr,
        mv=tuple(tuple(m) for m in mv), merge_idx=merge_idx,
        mvp_flag=mvp, mvd=mvd,
        lev_y=_zeros(n) if skip else _lev(n, seed),
        lev_cb=_zeros(n // 2) if skip else _lev(n // 2, seed + 1),
        lev_cr=_zeros(n // 2) if skip else _lev(n // 2, seed + 2))


def _intra(n, mode, seed):
    return dict(size=n, part=0, modes=[mode], lev_y=_lev(n, seed),
                lev_cb=_lev(n // 2, seed + 1), lev_cr=_lev(n // 2, seed + 2))


def _trees():
    """2x2 CTB64 picture covering the full B leaf matrix."""
    t0 = _inter(64, 3, 3, 10, merge_idx=2, skip=True)  # CU64 skip BI
    t1 = _inter(64, 2, 3, 20, mvd=((3, -2), (-1, 4)), mvp=(1, 0))  # CU64 BI
    c16 = dict(size=32, split=[
        _inter(16, 3, 1, 30, merge_idx=4, skip=True),      # 16 skip L0
        _inter(16, 1, 2, 40, merge_idx=1),                 # 16 merge L1
        _inter(16, 2, 2, 50, mvd=((0, 0), (7, -5)), mvp=(0, 1)),  # 16 AMVP L1
        _intra(16, 26, 60),
    ])
    t2 = dict(size=64, split=[
        _inter(32, 1, 3, 70, merge_idx=0),                 # 32 merge BI
        _inter(32, 2, 1, 80, mvd=((-9, 2), (0, 0)), mvp=(1, 0)),  # 32 AMVP L0
        _intra(32, 10, 90),
        c16,
    ])
    t3 = _inter(64, 1, 2, 100, merge_idx=3)                # CU64 merge L1
    return [t0, t1, t2, t3]


def _cfg(**kw):
    return StreamConfig(width=128, height=128, qp=30, ctb_log2=6,
                        min_cb_log2=3, max_tb_log2=5, **kw)


def _python_only(monkeypatch):
    monkeypatch.setattr(quad_mod, "_try_native_quad",
                        lambda *a, **k: None)


@pytest.mark.parametrize("merge_k", [1, 5])
def test_native_b_quad_matches_python(monkeypatch, merge_k):
    cfg = _cfg()
    trees = _trees()
    native = encode_slice_data_b_quad(cfg, trees, merge_k=merge_k)
    _python_only(monkeypatch)
    py = encode_slice_data_b_quad(cfg, trees, merge_k=merge_k)
    assert native == py


def test_native_b_quad_wpp_matches_python(monkeypatch):
    cfg = _cfg(wpp=True)
    trees = _trees()
    native, offs_n = encode_slice_data_b_quad_wpp(cfg, trees, merge_k=5)
    _python_only(monkeypatch)
    py, offs_p = encode_slice_data_b_quad_wpp(cfg, trees, merge_k=5)
    assert native == py
    assert offs_n == offs_p
