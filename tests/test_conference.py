"""Three-party mesh conference: signaling fan-out + media to every peer.

Reference behavior: the host re-INVITEs existing participants as new ones
join and synthesizes cross-participant SDP (controller.cpp:208-218,
sdpmeshconference.h); media is a full mesh of point-to-point streams;
received audio is N-way mixed (audiomixer.cpp:38-63).
"""

import time

import numpy as np

from kvazzup_tpu.audio.frames import AudioMixer
from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.signaling.mesh import MeshType, SdpMeshConference
from kvazzup_tpu.signaling.sdp import default_sdp


def test_mesh_media_full_exchange():
    """Each of 3 participants encodes its camera; every other participant
    decodes it bit-exactly (video full mesh = 6 directed streams)."""
    w, h = 64, 48
    names = ["alice", "bob", "carol"]
    frames = {n: synthetic_frames(w, h, 1, seed=i)[0] for i, n in enumerate(names)}
    streams = {}
    recons = {}
    for n in names:
        enc = Encoder(StreamConfig(width=w, height=h, qp=32), intra_period=1)
        streams[n], recons[n] = enc.encode_frame(*frames[n])
    for receiver in names:
        for sender in names:
            if sender == receiver:
                continue
            got = Decoder().decode(streams[sender])
            assert len(got) == 1
            for p in range(3):
                assert np.array_equal(np.asarray(got[0][p]), np.asarray(recons[sender][p]))


def test_mesh_sdp_covers_all_pairs():
    mesh = SdpMeshConference(MeshType.PORT_SHIFTED)
    for sid in (1, 2, 3):
        mesh.add_remote_sdp(sid, default_sdp(f"peer{sid}", f"10.0.0.{sid}", 5000, 5002))
    # every participant gets an SDP for every OTHER participant, and the
    # synthesized port pairs never collide for a given receiver
    for me in (1, 2, 3):
        others = [s for s in (1, 2, 3) if s != me]
        ports = set()
        for o in others:
            sdp = mesh.synthesize(me, o)
            for m in sdp.media:
                assert m.port not in ports
                ports.add(m.port)


def test_audio_mixer_three_sources():
    """Mixer parity: output only when every live session contributed, and
    the mix is the clipped sum (audiomixer.cpp:38-63)."""
    mix = AudioMixer()
    for sid in (1, 2, 3):
        mix.add_session(sid)
    t1 = np.full(160, 1000, np.int16)
    t2 = np.full(160, -300, np.int16)
    t3 = np.full(160, 20000, np.int16)
    assert mix.input_frame(1, t1) is None  # waits for the others
    assert mix.input_frame(2, t2) is None
    out = mix.input_frame(3, t3)
    assert out is not None
    assert int(out[0]) == 1000 - 300 + 20000
    # clipping
    loud = np.full(160, 30000, np.int16)
    mix.input_frame(1, loud)
    mix.input_frame(2, loud)
    out = mix.input_frame(3, loud)
    assert out is not None and int(out[0]) == 32767
    # a participant leaving unblocks the mix
    mix.remove_session(3)
    mix.input_frame(1, t1)
    out = mix.input_frame(2, t2)
    assert out is not None and int(out[0]) == 700
