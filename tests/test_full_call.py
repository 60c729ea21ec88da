"""Full loopback call integration: SIP INVITE + SDP O/A + real video over
RTP/UDP, decoded bit-exactly on the far side.

This is the system test the reference performs manually against a Kamailio
proxy (SURVEY.md §4) — here fully in-process.
"""

import queue
import socket
import threading
import time

import numpy as np
import pytest

from kvazzup_tpu.controller import Controller
from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.delivery.rtp import H265Depacketizer, H265Packetizer, RtpPacket
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.pipeline.media_pipeline import Frame
from kvazzup_tpu.signaling.dialog import CallState


def test_signaling_call_setup_teardown():
    """Two controllers over an in-memory wire: call connects, then ends."""
    wires = {"a": [], "b": []}
    alice = Controller("alice", "10.0.0.1", send_fn=lambda d: wires["b"].append(d))
    bob = Controller("bob", "10.0.0.2", send_fn=lambda d: wires["a"].append(d))
    incoming = []
    bob.on_incoming_call = incoming.append

    def pump():
        for _ in range(20):
            moved = False
            while wires["b"]:
                bob.receive(wires["b"].pop(0))
                moved = True
            while wires["a"]:
                alice.receive(wires["a"].pop(0))
                moved = True
            if not moved:
                break

    sess_a = alice.start_call("sip:bob@10.0.0.2")
    pump()
    assert incoming, "bob must see the incoming call"
    sess_b = incoming[0]
    bob.accept_call(sess_b)
    pump()
    assert sess_a.invite.state == CallState.CONNECTED
    assert sess_b.invite.state == CallState.CONNECTED
    assert sess_a.negotiation.remote_sdp.media[1].rtpmaps[0].codec == "H265"
    assert sess_a.media is not None and sess_b.media is not None

    alice.end_call(sess_a)
    pump()
    assert sess_b.invite.state == CallState.ENDED
    alice_stats = alice.stats.snapshot()
    assert alice_stats["sessions"] == 0


def test_video_over_rtp_udp_end_to_end():
    """Encode -> RTP/UDP -> depacketize -> decode: frames arrive bit-exact."""
    from kvazzup_tpu.decoder.top import Decoder

    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=True)
    frames = synthetic_frames(w, h, 3, seed=5)

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(3.0)
    port = rx.getsockname()[1]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    pk = H265Packetizer(mtu=700)
    sent_packets = 0

    from kvazzup_tpu.encoder.top import Encoder

    enc = Encoder(cfg, intra_period=16)
    recons = []
    for i, (y, u, v) in enumerate(frames):
        stream, rec = enc.encode_frame(y, u, v)
        recons.append(rec)
        for pkt in pk.packetize(stream, i / 30.0):
            tx.sendto(pkt.pack(), ("127.0.0.1", port))
            sent_packets += 1

    de = H265Depacketizer()
    data = b""
    for _ in range(sent_packets):
        buf, _ = rx.recvfrom(2048)
        data += de.push(RtpPacket.parse(buf))
    rx.close()
    tx.close()

    outs = Decoder().decode(data)
    assert len(outs) == len(frames)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b)
