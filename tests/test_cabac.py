"""CABAC engine round-trip tests (the analogue of kvazaar's
test_cabac_state.sh — SURVEY.md §4)."""

import numpy as np

from kvazzup_tpu.entropy.cabac import (
    CabacDecoder,
    CabacEncoder,
    decode_coeff_remaining,
    encode_coeff_remaining,
)
from kvazzup_tpu.entropy.cabac_tables import NUM_CONTEXTS, init_all_contexts, init_context


def test_context_init_range():
    for init_type in range(3):
        for qp in (0, 17, 26, 37, 51):
            ctx = init_all_contexts(init_type, qp)
            assert ctx[:, 0].min() >= 0 and ctx[:, 0].max() <= 63
            assert set(np.unique(ctx[:, 1])) <= {0, 1}


def test_init_context_examples():
    # init_value 154 is the "neutral" value: state 0 either MPS at any QP
    for qp in (0, 26, 51):
        state, mps = init_context(154, qp)
        assert state <= 1


def _roundtrip(bins, qp=32, init_type=0):
    enc = CabacEncoder(init_type, qp)
    for kind, a, b in bins:
        if kind == "ctx":
            enc.encode_bin(a, b)
        elif kind == "byp":
            enc.encode_bypass(a)
        elif kind == "term":
            enc.encode_terminate(a)
    enc.encode_terminate(1)
    data = enc.data()
    dec = CabacDecoder(data, init_type, qp)
    for kind, a, b in bins:
        if kind == "ctx":
            assert dec.decode_bin(a) == b
        elif kind == "byp":
            assert dec.decode_bypass() == a
        elif kind == "term":
            assert dec.decode_terminate() == a
    assert dec.decode_terminate() == 1
    # encoder and decoder context states must match bin-for-bin
    np.testing.assert_array_equal(enc.ctx, dec.ctx)
    return data


def test_cabac_roundtrip_random():
    rng = np.random.default_rng(1234)
    for trial in range(20):
        n = int(rng.integers(1, 2000))
        bins = []
        for _ in range(n):
            k = rng.integers(0, 3)
            if k == 0:
                bins.append(("ctx", int(rng.integers(0, NUM_CONTEXTS)), int(rng.integers(0, 2))))
            elif k == 1:
                bins.append(("byp", int(rng.integers(0, 2)), None))
            else:
                bins.append(("term", 0, None))
        _roundtrip(bins, qp=int(rng.integers(0, 52)), init_type=int(rng.integers(0, 3)))


def test_cabac_skewed_streams():
    # long runs of MPS exercise renormalization / outstanding-bit paths
    bins = [("ctx", 0, 0)] * 5000 + [("byp", 1, None)] * 64 + [("ctx", 1, 1)] * 999
    _roundtrip(bins)


def test_coeff_remaining_roundtrip():
    rng = np.random.default_rng(7)
    vals = list(range(0, 80)) + [100, 1000, 32766, 65535] + list(rng.integers(0, 30000, 64))
    for rice in range(5):
        enc = CabacEncoder(0, 32)
        for v in vals:
            encode_coeff_remaining(enc, int(v), rice)
        enc.encode_terminate(1)
        dec = CabacDecoder(enc.data(), 0, 32)
        for v in vals:
            assert decode_coeff_remaining(dec, rice) == int(v)
