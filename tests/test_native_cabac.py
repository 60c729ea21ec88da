"""Native C slice codec must be byte-identical to the Python reference."""

import time

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.entropy.slice_data import decode_slice_data_intra, encode_slice_data_intra
from kvazzup_tpu.native import get_lib


def _random_slice(cfg, seed, density=0.2):
    rng = np.random.default_rng(seed)
    n = cfg.ctb_size
    nctu = cfg.ctbs_w * cfg.ctbs_h
    modes = rng.integers(0, 35, nctu).astype(np.int32)

    def levs(sz, dens):
        mask = rng.random((nctu, sz, sz)) < dens
        mag = rng.integers(1, 200, (nctu, sz, sz))
        big = rng.random((nctu, sz, sz)) < 0.01
        mag = np.where(big, rng.integers(200, 32767, (nctu, sz, sz)), mag)
        sign = rng.choice([-1, 1], (nctu, sz, sz))
        return (mask * mag * sign).astype(np.int32)

    return modes, levs(n, density), levs(n // 2, density / 2), levs(n // 2, density / 2)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


@pytest.mark.parametrize("seed,density", [(1, 0.02), (2, 0.2), (3, 0.7)])
def test_native_matches_python(lib, seed, density):
    cfg = StreamConfig(width=96, height=64, qp=30)
    modes, ly, lcb, lcr = _random_slice(cfg, seed, density)
    py = encode_slice_data_intra(cfg, modes, ly, lcb, lcr, use_native=False)
    nat = encode_slice_data_intra(cfg, modes, ly, lcb, lcr, use_native=True)
    assert py == nat

    m2, y2, cb2, cr2 = decode_slice_data_intra(cfg, nat, cfg.qp, use_native=True)
    np.testing.assert_array_equal(m2, modes)
    np.testing.assert_array_equal(y2, ly)
    np.testing.assert_array_equal(cb2, lcb)
    np.testing.assert_array_equal(cr2, lcr)
    m3, y3, cb3, cr3 = decode_slice_data_intra(cfg, py, cfg.qp, use_native=False)
    np.testing.assert_array_equal(m3, modes)
    np.testing.assert_array_equal(y3, ly)


def test_native_speed(lib):
    cfg = StreamConfig(width=352, height=288, qp=32)
    modes, ly, lcb, lcr = _random_slice(cfg, 5, 0.1)
    t0 = time.time()
    nat = encode_slice_data_intra(cfg, modes, ly, lcb, lcr, use_native=True)
    dt = time.time() - t0
    assert dt < 0.25, f"native CABAC too slow: {dt:.3f}s for CIF"
