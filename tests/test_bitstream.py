"""Round-trip tests for bit-level I/O, Exp-Golomb codes, NAL framing."""

import numpy as np

from kvazzup_tpu.core.bitstream import (
    BitReader,
    BitWriter,
    insert_emulation_prevention,
    remove_emulation_prevention,
)
from kvazzup_tpu.core.nal import NalType, NalUnit, compose_nal, split_annexb


def test_u_roundtrip():
    w = BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (7, 3), (0xFFFF, 16), (1, 7)]
    for v, n in vals:
        w.u(v, n)
    w.align_zero()
    r = BitReader(w.data())
    for v, n in vals:
        assert r.u(n) == v


def test_ue_se_roundtrip():
    rng = np.random.default_rng(0)
    ue_vals = [0, 1, 2, 3, 7, 8, 255, 256, 65534] + list(rng.integers(0, 100000, 50))
    se_vals = [0, 1, -1, 2, -2, 127, -128] + list(rng.integers(-5000, 5000, 50))
    w = BitWriter()
    for v in ue_vals:
        w.ue(int(v))
    for v in se_vals:
        w.se(int(v))
    w.align_zero()
    r = BitReader(w.data())
    for v in ue_vals:
        assert r.ue() == int(v)
    for v in se_vals:
        assert r.se() == int(v)


def test_emulation_prevention():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x00\x00\x00",
        b"\x01\x02\x03",
        bytes(range(256)) + b"\x00\x00\x00\x00\x01",
    ]
    for rbsp in cases:
        payload = insert_emulation_prevention(rbsp)
        # no 00 00 0x pattern with x<=3 may remain
        for i in range(len(payload) - 2):
            if payload[i] == 0 and payload[i + 1] == 0:
                assert payload[i + 2] > 2
        assert remove_emulation_prevention(payload) == rbsp


def test_nal_roundtrip():
    units = [
        NalUnit(NalType.VPS, b"\x11\x22\x00\x00\x00\x01"),
        NalUnit(NalType.SPS, b"\x00\x00\x01"),
        NalUnit(NalType.IDR_W_RADL, bytes(100)),
    ]
    stream = b"".join(compose_nal(u) for u in units)
    parsed = split_annexb(stream)
    assert len(parsed) == len(units)
    for a, b in zip(units, parsed):
        assert a.nal_type == b.nal_type
        assert a.rbsp == b.rbsp
