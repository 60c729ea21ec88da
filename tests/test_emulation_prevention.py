"""Vectorized emulation-prevention (core/bitstream.py) vs the literal
7.4.2/7.3.1.1 byte-scan: insertion reset rule (00 00 00 00 escapes once),
removal offsets, and roundtrip, fuzzed over zero-dense payloads."""

import random

from kvazzup_tpu.core.bitstream import (insert_emulation_prevention,
                                        remove_emulation_prevention_pos)


def _ins_ref(rbsp):
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rem_ref(payload):
    out = bytearray()
    removals = []
    zeros = 0
    i = 0
    while i < len(payload):
        b = payload[i]
        if zeros >= 2 and b == 3:
            removals.append(len(out))
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out), tuple(removals)


def test_emulation_prevention_matches_scan():
    rng = random.Random(7)
    cases = [b"", b"\x00", b"\x00\x00", b"\x00\x00\x03",
             b"\x00\x00\x00\x00", b"\x00" * 9, b"\x00\x00\x03\x03",
             b"\x00\x00\x01\x00\x00\x02", b"\x00\x00\x03\x00\x00\x03"]
    for _ in range(4000):
        n = rng.randrange(0, 40)
        cases.append(bytes(rng.choice([0, 0, 0, 1, 2, 3, 255, 17])
                           for _ in range(n)))
    for c in cases:
        assert insert_emulation_prevention(c) == _ins_ref(c)
        assert remove_emulation_prevention_pos(c) == _rem_ref(c)
        out, _ = remove_emulation_prevention_pos(
            insert_emulation_prevention(c))
        assert out == c
