"""ZRTP media-path keying (RFC 6189) -> SRTP protected media.

Reference parity: uvgRTP ZRTP DH mode selected by the reference's
delivery layer (delivery.cpp:309-343).
"""

import struct

from kvazzup_tpu.delivery.srtp import SrtpContext
from kvazzup_tpu.delivery.zrtp import ZrtpEndpoint, parse_packet, run_loopback


def test_handshake_derives_paired_keys():
    a = ZrtpEndpoint(ssrc=0x1111)
    b = ZrtpEndpoint(ssrc=0x2222)
    assert run_loopback(a, b)
    assert a.keys.sas == b.keys.sas and len(a.keys.sas) == 4
    assert a.keys.master_key_tx == b.keys.master_key_rx
    assert a.keys.master_key_rx == b.keys.master_key_tx
    assert a.keys.master_salt_tx == b.keys.master_salt_rx
    assert a.keys.master_key_tx != a.keys.master_key_rx
    assert a._done and b._done  # Confirm MACs verified on both sides


def test_keys_are_call_unique():
    k = []
    for _ in range(2):
        a, b = ZrtpEndpoint(ssrc=1), ZrtpEndpoint(ssrc=2)
        assert run_loopback(a, b)
        k.append(a.keys.master_key_tx)
    assert k[0] != k[1]


def test_corrupt_packet_ignored():
    a, b = ZrtpEndpoint(ssrc=1), ZrtpEndpoint(ssrc=2)
    pkts = a.packets_to_send()
    bad = bytearray(pkts[0])
    bad[-1] ^= 0xFF  # break CRC
    assert parse_packet(bytes(bad)) is None
    b.receive(bytes(bad))  # must not throw or advance state
    assert b.keys is None


def test_zrtp_keys_drive_srtp():
    """End to end: handshake, then SRTP-protect RTP both directions."""
    a, b = ZrtpEndpoint(ssrc=0xAAAA), ZrtpEndpoint(ssrc=0xBBBB)
    assert run_loopback(a, b)
    tx_a = SrtpContext(a.keys.master_key_tx, a.keys.master_salt_tx)
    rx_b = SrtpContext(b.keys.master_key_rx, b.keys.master_salt_rx)
    rtp = struct.pack(">BBHII", 0x80, 96, 1, 1000, 0xAAAA) + b"payload-bytes"
    prot = tx_a.protect(rtp)
    assert prot != rtp
    assert rx_b.unprotect(prot) == rtp
