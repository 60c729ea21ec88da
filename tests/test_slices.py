"""Multi-slice pictures: independent row slices, e2e conformance.

Reference parity: kvazaar `slices` as wired through kvazaarfilter
(/root/reference/src/media/processing/kvazaarfilter.cpp:204-215);
verified against libavcodec like the other e2e suites.
"""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder

from test_e2e_intra import oracle_decode, synthetic_frames


@pytest.mark.parametrize("n_slices", [2, 3])
def test_slices_self_and_oracle(n_slices, tmp_path):
    w, h = 128, 96
    y, u, v = synthetic_frames(w, h, 1, seed=13)[0]
    cfg = StreamConfig(width=w, height=h, qp=30, slices=n_slices)
    enc = Encoder(cfg, intra_period=1)
    stream, recon = enc.encode_frame(y, u, v)
    # one NAL per slice (plus the 3 parameter sets)
    assert stream.count(b"\x00\x00\x00\x01") == 3 + n_slices

    frames = Decoder().decode(stream)
    assert len(frames) == 1
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))

    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == 1, err
    for p in range(3):
        assert np.array_equal(oracle[0][p], np.asarray(frames[0][p])), (
            f"plane {p} differs from libavcodec"
        )


@pytest.mark.parametrize("merge_cand", [1, 5])
def test_slices_ip_chain(merge_cand, tmp_path):
    """Multi-slice I+P+P: slice boundaries cut in-picture prediction, MC
    crosses them into the reference (kvazaar slices semantics)."""
    w, h = 128, 96
    frames = synthetic_frames(w, h, 3, seed=21)
    cfg = StreamConfig(width=w, height=h, qp=32, slices=3,
                       deblocking_enabled=True, merge_cand=merge_cand)
    enc = Encoder(cfg, intra_period=8)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == len(frames), err
    for fi, (rec, rf) in enumerate(zip(recons, oracle)):
        for a, b in zip(rec, rf):
            np.testing.assert_array_equal(np.asarray(a), b,
                                          err_msg=f"frame {fi}")


def test_slices_pipelined_identical():
    from kvazzup_tpu.encoder.pipelined import PipelinedEncoder

    w, h = 128, 96
    frames = synthetic_frames(w, h, 3, seed=14)
    cfg = StreamConfig(width=w, height=h, qp=30, slices=2)
    seq = b""
    enc = Encoder(cfg, intra_period=1)
    for f in frames:
        seq += enc.encode_frame(*f)[0]
    with PipelinedEncoder(StreamConfig(width=w, height=h, qp=30, slices=2),
                          intra_period=1) as pe:
        chunks = []
        for f in frames:
            chunks += [s for s, _ in pe.push(*f)]
        chunks += [s for s, _ in pe.flush()]
    assert b"".join(chunks) == seq


def test_slice_loss_resilience():
    """Each slice decodes independently: dropping one NAL still yields the
    other rows (the RTP packet-loss story for multi-slice pictures)."""
    from kvazzup_tpu.core.nal import compose_nal, split_annexb

    w, h = 128, 96
    y, u, v = synthetic_frames(w, h, 1, seed=15)[0]
    cfg = StreamConfig(width=w, height=h, qp=30, slices=3, deblocking_enabled=False)
    stream, recon = Encoder(cfg, intra_period=1).encode_frame(y, u, v)
    nals = list(split_annexb(stream))
    # drop the middle slice NAL (parameter sets are the first three)
    kept = nals[:4] + nals[5:]
    damaged = b"".join(compose_nal(n) for n in kept)
    frames = Decoder().decode(damaged)
    assert len(frames) == 1
    got = np.asarray(frames[0][0])
    ref = np.asarray(recon[0])
    rows = h // 3
    assert np.array_equal(got[:rows], ref[:rows])  # slice 0 intact
    assert np.array_equal(got[-rows:], ref[-rows:])  # slice 2 intact
