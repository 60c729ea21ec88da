"""Round-trip tests for transform-coefficient syntax (residual_coding)."""

import numpy as np
import pytest

from kvazzup_tpu.core.tables import SCAN_DIAG, SCAN_HORIZ, SCAN_VERT
from kvazzup_tpu.entropy.cabac import CabacDecoder, CabacEncoder
from kvazzup_tpu.entropy.syntax import decode_residual, encode_residual


def _roundtrip_blocks(blocks, qp=32):
    enc = CabacEncoder(0, qp)
    for coeffs, log2, c_idx, scan in blocks:
        encode_residual(enc, coeffs, log2, c_idx, scan)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.data(), 0, qp)
    for coeffs, log2, c_idx, scan in blocks:
        out = decode_residual(dec, log2, c_idx, scan)
        np.testing.assert_array_equal(out, coeffs)
    np.testing.assert_array_equal(enc.ctx, dec.ctx)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_single_coeff_positions(log2):
    n = 1 << log2
    blocks = []
    rng = np.random.default_rng(log2)
    for _ in range(20):
        c = np.zeros((n, n), dtype=np.int64)
        y, x = rng.integers(0, n, 2)
        c[y, x] = int(rng.integers(1, 100)) * (1 if rng.random() < 0.5 else -1)
        blocks.append((c, log2, int(rng.integers(0, 2)), SCAN_DIAG))
    _roundtrip_blocks(blocks)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("density", [0.05, 0.3, 0.9])
def test_random_blocks(log2, density):
    n = 1 << log2
    rng = np.random.default_rng(hash((log2, density)) % 2**32)
    blocks = []
    for _ in range(12):
        mask = rng.random((n, n)) < density
        mag = rng.integers(1, 32767, (n, n))
        sign = rng.choice([-1, 1], (n, n))
        c = (mask * mag * sign).astype(np.int64)
        if not np.any(c):
            c[n - 1, n - 1] = 5
        c_idx = int(rng.integers(0, 2))
        blocks.append((c, log2, c_idx, SCAN_DIAG))
    _roundtrip_blocks(blocks, qp=int(rng.integers(0, 52)))


@pytest.mark.parametrize("scan", [SCAN_DIAG, SCAN_HORIZ, SCAN_VERT])
def test_scan_orders_4x4_8x8(scan):
    rng = np.random.default_rng(scan)
    blocks = []
    for log2 in (2, 3):
        n = 1 << log2
        for _ in range(10):
            c = (rng.random((n, n)) < 0.4) * rng.integers(-500, 500, (n, n))
            if not np.any(c):
                c[0, 0] = -3
            blocks.append((c.astype(np.int64), log2, 0, scan))
    _roundtrip_blocks(blocks)


def test_dc_only_and_inferred_dc():
    # exercise the inferred-DC path: middle subblock with only DC nonzero
    c = np.zeros((16, 16), dtype=np.int64)
    c[12, 12] = 7  # a late subblock to make earlier ones "middle"
    c[4, 4] = 3  # DC of subblock (1,1)
    c[0, 0] = -2
    _roundtrip_blocks([(c, 4, 0, SCAN_DIAG)])


def test_large_levels_rice_escalation():
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = 32767
    c[0, 1] = -20000
    c[1, 0] = 12345
    c[1, 1] = 3
    c[2, 2] = -1
    _roundtrip_blocks([(c, 3, 0, SCAN_DIAG), (c, 3, 1, SCAN_DIAG)])
