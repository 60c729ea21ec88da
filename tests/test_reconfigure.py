"""Live reconfiguration: settings change -> re-INVITE -> media rebuild
(SURVEY §3.5: the reference tears down and rebuilds its filter graph on
settings changes and re-INVITEs mid-call, controller.cpp:208-218)."""

import numpy as np

from kvazzup_tpu.controller import Controller
from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.signaling.dialog import CallState
from kvazzup_tpu.utils.settings import Settings


def _pump(alice, bob, wires, rounds=20):
    for _ in range(rounds):
        moved = False
        while wires["b"]:
            bob.receive(wires["b"].pop(0))
            moved = True
        while wires["a"]:
            alice.receive(wires["a"].pop(0))
            moved = True
        if not moved:
            break


def test_settings_subscription_fires():
    st = Settings()
    seen = []
    st.subscribe(lambda k, v: seen.append((k, v)))
    st.set("video/Preset", "fast")
    assert seen == [("video/Preset", "fast")]


def test_reinvite_rebuilds_media():
    wires = {"a": [], "b": []}
    small = StreamConfig(width=96, height=64, qp=30)
    alice = Controller("alice", "10.0.0.1", send_fn=lambda d: wires["b"].append(d),
                       video_cfg=small)
    bob = Controller("bob", "10.0.0.2", send_fn=lambda d: wires["a"].append(d),
                     video_cfg=small)
    bob.on_incoming_call = lambda s: bob.accept_call(s)
    sess = alice.start_call("sip:bob@10.0.0.2")
    _pump(alice, bob, wires)
    assert sess.invite.state == CallState.CONNECTED
    assert sess.media is not None
    bsess = next(iter(bob.sessions.values()))
    media_before_a = sess.media
    media_before_b = bsess.media

    # mid-call upscale: alice renegotiates to a larger resolution
    big = StreamConfig(width=128, height=96, qp=30)
    alice.renegotiate(sess, video_cfg=big)
    _pump(alice, bob, wires)
    assert sess.invite.state == CallState.CONNECTED
    assert sess.media is not None and sess.media is not media_before_a
    assert bsess.media is not None and bsess.media is not media_before_b
    assert sess.media.send.cfg.width == 128

    # the rebuilt pipeline still encodes/decodes
    from kvazzup_tpu.decoder.top import Decoder
    from kvazzup_tpu.io.yuv import synthetic_frames

    y, u, v = synthetic_frames(128, 96, 1, seed=3)[0]
    stream, recon = sess.media.send.encoder.encode_frame(y, u, v)
    got = Decoder().decode(stream)
    assert np.array_equal(np.asarray(got[0][0]), np.asarray(recon[0]))

    alice.end_call(sess)
    _pump(alice, bob, wires)
    assert not alice.sessions and not bob.sessions


def test_encoder_snapshot_resume():
    """Checkpoint/resume (SURVEY §5): a restored encoder continues the P
    chain byte-identically."""
    from kvazzup_tpu.encoder.top import Encoder
    from kvazzup_tpu.io.yuv import synthetic_frames

    w, h = 96, 64
    frames = synthetic_frames(w, h, 4, seed=4)
    enc = Encoder(StreamConfig(width=w, height=h, qp=32), intra_period=4)
    for f in frames[:3]:
        enc.encode_frame(*f)
    snap = enc.snapshot()
    want = enc.encode_frame(*frames[3])[0]
    enc2 = Encoder(StreamConfig(width=w, height=h, qp=32), intra_period=4)
    enc2.restore(snap)
    assert enc2.encode_frame(*frames[3])[0] == want


def test_vps_resend_period():
    """Parameter sets re-sent every N IDRs (videoVPS parity) so late
    joiners can start decoding mid-stream."""
    from kvazzup_tpu.decoder.top import Decoder
    from kvazzup_tpu.encoder.top import Encoder
    from kvazzup_tpu.io.yuv import synthetic_frames

    w, h = 96, 64
    frames = synthetic_frames(w, h, 6, seed=4)
    enc = Encoder(StreamConfig(width=w, height=h, qp=32), intra_period=2,
                  vps_period=2)
    streams = [enc.encode_frame(*f)[0] for f in frames]
    has_vps = [s.startswith(b"\x00\x00\x00\x01\x40") for s in streams]
    assert has_vps == [True, False, False, False, True, False]
    # a late joiner picking up at the re-sent parameter sets can decode
    late = b"".join(streams[4:])
    got = Decoder().decode(late)
    assert len(got) >= 1
