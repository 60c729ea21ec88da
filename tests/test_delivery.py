"""RTP/H.265 payload + RTCP + STUN tests, including a UDP loopback."""

import socket
import time

import numpy as np

from kvazzup_tpu.delivery.rtp import (
    H265Depacketizer,
    H265Packetizer,
    ReportBlock,
    RtpPacket,
    pack_receiver_report,
    parse_rtcp,
)
from kvazzup_tpu.delivery.stun import (
    BINDING_REQUEST,
    BINDING_RESPONSE,
    StunMessage,
    StunTransactionTracker,
)
from kvazzup_tpu.core.nal import split_annexb


def _test_stream():
    # small annexb stream with several NALs, one large
    from kvazzup_tpu.core.nal import NalUnit, compose_nal

    rng = np.random.default_rng(0)
    return b"".join(
        [
            compose_nal(NalUnit(32, bytes(rng.integers(0, 255, 20, np.uint8)))),
            compose_nal(NalUnit(33, bytes(rng.integers(0, 255, 40, np.uint8)))),
            compose_nal(NalUnit(19, bytes(rng.integers(0, 255, 5000, np.uint8)))),
        ]
    )


def test_rtp_header_roundtrip():
    pkt = RtpPacket(97, 1234, 567890, 0xDEADBEEF, b"payload", marker=True)
    out = RtpPacket.parse(pkt.pack())
    assert (out.payload_type, out.seq, out.timestamp, out.ssrc, out.marker) == (
        97, 1234, 567890, 0xDEADBEEF, True)
    assert out.payload == b"payload"


def test_h265_packetize_roundtrip():
    stream = _test_stream()
    pk = H265Packetizer(mtu=500)
    packets = pk.packetize(stream, 0.0)
    assert len(packets) > 3  # large NAL fragmented
    de = H265Depacketizer()
    out = b"".join(de.push(p) for p in packets)
    a = split_annexb(stream)
    b = split_annexb(out)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.nal_type == y.nal_type
        assert x.rbsp == y.rbsp


def test_h265_loss_drops_fragment():
    stream = _test_stream()
    pk = H265Packetizer(mtu=500)
    packets = pk.packetize(stream, 0.0)
    de = H265Depacketizer()
    # drop one mid-FU packet
    lost = [p for i, p in enumerate(packets) if i != len(packets) // 2]
    out = b"".join(de.push(p) for p in lost)
    assert de.packets_lost == 1
    # the fragmented NAL must not be emitted corrupted
    outs = split_annexb(out)
    assert all(len(n.rbsp) < 5000 for n in outs)


def test_rtp_udp_loopback():
    stream = _test_stream()
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pk = H265Packetizer(mtu=1200)
    packets = pk.packetize(stream, 0.1)
    for p in packets:
        tx.sendto(p.pack(), ("127.0.0.1", port))
    de = H265Depacketizer()
    out = b""
    for _ in packets:
        data, _ = rx.recvfrom(2048)
        out += de.push(RtpPacket.parse(data))
    assert len(split_annexb(out)) == len(split_annexb(stream))
    rx.close()
    tx.close()


def test_rtcp_rr_roundtrip():
    block = ReportBlock(0x1111, 25, 100, 5000, 30)
    raw = pack_receiver_report(0x2222, [block])
    parsed = parse_rtcp(raw)
    assert parsed[0][0] == "rr"
    assert parsed[0][1] == 0x2222
    rb = parsed[0][2][0]
    assert (rb.ssrc, rb.fraction_lost, rb.cumulative_lost, rb.jitter) == (0x1111, 25, 100, 30)


def test_stun_roundtrip_and_xor_addr():
    msg = StunMessage(BINDING_RESPONSE)
    msg.set_xor_mapped_address("192.168.1.42", 23001)
    out = StunMessage.parse(msg.pack())
    assert out.msg_type == BINDING_RESPONSE
    assert out.transaction_id == msg.transaction_id
    assert out.xor_mapped_address() == ("192.168.1.42", 23001)


def test_stun_transaction_tracking():
    tr = StunTransactionTracker()
    req = StunMessage(BINDING_REQUEST)
    tr.track(req, time.monotonic())
    resp = StunMessage(BINDING_RESPONSE, req.transaction_id)
    assert tr.match_response(resp)
    assert not tr.match_response(resp)  # consumed


def test_ice_priorities():
    from kvazzup_tpu.delivery.ice import candidate_priority, form_pairs, pair_priority
    from kvazzup_tpu.signaling.sdp import IceCandidate

    hp = candidate_priority("host", 65535, 1)
    sp = candidate_priority("srflx", 65535, 1)
    assert hp > sp
    # RFC 8445 worked relationship: controlling G, controlled D
    assert pair_priority(100, 200) == (100 << 32) + 2 * 200
    assert pair_priority(200, 100) == (100 << 32) + 2 * 200 + 1

    local = [IceCandidate("1", 1, "udp", hp, "10.0.0.1", 1000, "host")]
    remote = [
        IceCandidate("1", 1, "udp", sp, "10.0.0.2", 2000, "srflx"),
        IceCandidate("2", 1, "udp", hp, "10.0.0.2", 2001, "host"),
        IceCandidate("3", 2, "udp", hp, "10.0.0.2", 2002, "host"),
    ]
    pairs = form_pairs(local, remote, controlling=True)
    assert len(pairs) == 2  # component mismatch filtered
    assert pairs[0].remote.port == 2001  # host-host ranks first


def test_ice_loopback_nomination():
    from kvazzup_tpu.delivery.ice import CandidatePair, IceAgent, form_pairs, pair_priority
    from kvazzup_tpu.signaling.sdp import IceCandidate
    import threading

    controller = IceAgent(controlling=True)
    controlled = IceAgent(controlling=False)
    a_addr = controller.bind_component(1, "127.0.0.1", 0)
    b_addr = controlled.bind_component(1, "127.0.0.1", 0)

    mk = lambda addr: IceCandidate("1", 1, "udp", 2130706431, addr[0], addr[1], "host")
    pairs_a = form_pairs([mk(a_addr)], [mk(b_addr)], controlling=True)
    pairs_b = form_pairs([mk(b_addr)], [mk(a_addr)], controlling=False)

    res_b = {}
    t = threading.Thread(target=lambda: res_b.update(controlled.run_checks(pairs_b, timeout=4)))
    t.start()
    res_a = controller.run_checks(pairs_a, timeout=4)
    t.join()
    assert 1 in res_a, "controller must nominate a pair"
    assert 1 in res_b, "controlled side must mirror the nomination"
    assert res_a[1].remote.port == b_addr[1]


def test_srtp_protect_unprotect():
    import os as _os

    from kvazzup_tpu.delivery.srtp import SrtpContext

    key, salt = _os.urandom(16), _os.urandom(14)
    tx = SrtpContext(key, salt)
    rx = SrtpContext(key, salt)
    pkt = RtpPacket(97, 100, 1234, 0xAABBCCDD, b"secret payload data")
    wire = tx.protect(pkt.pack())
    assert wire != pkt.pack()
    assert b"secret" not in wire
    out = rx.unprotect(wire)
    assert out == pkt.pack()
    # tamper -> auth failure
    bad = bytearray(wire)
    bad[-1] ^= 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rx.unprotect(bytes(bad))


def test_srtp_sequence_rollover():
    import os as _os

    from kvazzup_tpu.delivery.srtp import SrtpContext

    key, salt = _os.urandom(16), _os.urandom(14)
    tx = SrtpContext(key, salt)
    rx = SrtpContext(key, salt)
    for seq in (0xFFFE, 0xFFFF, 0x0000, 0x0001):  # wraps ROC
        pkt = RtpPacket(97, seq, 1234, 0x11, bytes([seq & 0xFF] * 20))
        assert rx.unprotect(tx.protect(pkt.pack())) == pkt.pack()


def test_srtp_replay_and_forgery_state(monkeypatch=None):
    """RFC 3711 3.3.2: replays rejected; forged packets leave crypto state intact."""
    import os as _os

    import pytest as _pytest

    from kvazzup_tpu.delivery.srtp import SrtpContext

    key, salt = _os.urandom(16), _os.urandom(14)
    tx = SrtpContext(key, salt)
    rx = SrtpContext(key, salt)
    pkts = []
    for seq in range(10):
        p = RtpPacket(97, seq, 100 + seq, 0x42, bytes([seq] * 16)).pack()
        pkts.append(tx.protect(p))
    assert rx.unprotect(pkts[3]) is not None
    # exact replay of an authenticated packet -> rejected
    with _pytest.raises(ValueError, match="replay"):
        rx.unprotect(pkts[3])
    # a forged packet with a crafted far-future seq must NOT desync state
    forged = bytearray(pkts[4])
    forged[2:4] = (0x7F00).to_bytes(2, "big")  # crafted seq, bogus tag
    roc_before, last_before = rx.roc, rx._last_seq
    with _pytest.raises(ValueError, match="auth"):
        rx.unprotect(bytes(forged))
    assert (rx.roc, rx._last_seq) == (roc_before, last_before)
    # legitimate traffic still flows after the forgery attempt
    for i in (4, 5, 6):
        assert rx.unprotect(pkts[i]).endswith(bytes([i] * 16))


def test_srtp_header_extension_not_encrypted():
    """RFC 3711 4.1: encryption starts after the RFC 3550 header extension."""
    import os as _os
    import struct as _struct

    from kvazzup_tpu.delivery.srtp import SrtpContext

    key, salt = _os.urandom(16), _os.urandom(14)
    tx = SrtpContext(key, salt)
    rx = SrtpContext(key, salt)
    base = RtpPacket(97, 7, 1000, 0x99, b"payload-bytes").pack()
    ext = _struct.pack("!HH", 0xBEDE, 2) + b"EXTENSION"[:8]  # 2 words of ext data
    pkt = bytes([base[0] | 0x10]) + base[1:12] + ext + base[12:]
    wire = tx.protect(pkt)
    # the extension rides in the clear; the payload does not
    assert ext in wire
    assert b"payload-bytes" not in wire
    assert rx.unprotect(wire) == pkt


def test_rtcp_sdes_bye_roundtrip():
    """SDES CNAME + BYE compose/parse (RFC 3550 6.5/6.6; uvgRTP parity)."""
    from kvazzup_tpu.delivery.rtp import pack_bye, pack_sdes, parse_rtcp_full

    compound = pack_sdes(0x1234, "alice@host") + pack_bye(0x1234, "teardown")
    entries = parse_rtcp_full(compound)
    assert ("sdes", 0x1234, "alice@host") in entries
    assert ("bye", 0x1234, "teardown") in entries
    # word alignment of every sub-packet
    assert len(compound) % 4 == 0


def test_packet_pacer_spreads_bursts_and_keeps_alive():
    import time

    from kvazzup_tpu.delivery.rtp import PacketPacer

    sent = []
    pacer = PacketPacer(lambda p: sent.append((time.monotonic(), p)),
                        fps=50.0, window_frac=0.5, keepalive_s=0.3,
                        max_burst=2)
    try:
        pkts = [bytes([i]) * 100 for i in range(8)]
        t0 = time.monotonic()
        pacer.send_frame(pkts)
        deadline = time.monotonic() + 2
        while len(sent) < 8 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert [p for _, p in sent[:8]] == pkts  # order preserved
        # paced: the frame spread over ~the pace window, not back-to-back
        spread = sent[7][0] - sent[0][0]
        assert spread >= 0.004, spread
        # idle -> keepalive datagrams appear
        n0 = len(sent)
        time.sleep(0.8)
        keepalives = [p for _, p in sent[n0:] if p == b""]
        assert keepalives, "no keepalive while idle"
    finally:
        pacer.stop()
