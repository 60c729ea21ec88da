"""Conformance window (7.4.3.2.1): true display-size encode via internal
CTB padding + SPS crop signalling (VERDICT r3 ask #8 — a spec-correct
"1080p" stream is 1920x1088 coded with an 8-row bottom crop, as any
kvazaar 1080p encode signals).

Pins: SPS round-trip of the window, self-decode and libavcodec oracle
decode both returning display-size frames equal to the encoder recon, and
the RA paths (CTB16 gop4 + quad64 gop8)."""

import numpy as np

from kvazzup_tpu.core.params import (StreamConfig, compose_sps, parse_sps)
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder, RandomAccessEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_e2e_intra import oracle_decode


def test_sps_conf_win_roundtrip():
    cfg = StreamConfig.for_source(1920, 1080, ctb_log2=6, min_cb_log2=3,
                                  max_tb_log2=5)
    assert (cfg.width, cfg.height) == (1920, 1088)
    assert (cfg.out_width, cfg.out_height) == (1920, 1080)
    sps = parse_sps(compose_sps(cfg).rbsp)
    assert sps.conf_win == (0, 0, 0, 4)  # bottom crop of 8 luma rows
    assert (sps.width, sps.height) == (1920, 1088)


def _check(cfg, frames, stream, recons, tmp_path):
    w, h = cfg.out_width, cfg.out_height
    for rec in recons:
        assert rec[0].shape == (h, w)
        assert rec[1].shape == (h // 2, w // 2)
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for rec, out in zip(recons, outs):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == len(frames), log
    for rec, out in zip(recons, ref):
        for a, b in zip(rec, out):
            np.testing.assert_array_equal(a, b)


def test_conf_win_intra_p_ld(tmp_path):
    """Low-delay I+P with wpp+sao at a non-CTB-aligned source size."""
    w, h = 200, 116  # coded 208x128 at CTB16
    cfg = StreamConfig.for_source(w, h, qp=32, wpp=True, sao_enabled=True,
                                  deblocking_enabled=True)
    frames = synthetic_frames(w, h, 3, seed=5)
    enc = Encoder(cfg, intra_period=4)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    _check(cfg, frames, stream, recons, tmp_path)


def test_conf_win_ra_quad64(tmp_path):
    """RA quad64 production path at a display size needing both-axis pads."""
    from kvazzup_tpu.encoder.ra import QuadRAEncoder

    w, h = 190, 100  # coded 192x128 at CTB64
    cfg = StreamConfig.for_source(w, h, qp=32, ctb_log2=6, min_cb_log2=3,
                                  max_tb_log2=5, deblocking_enabled=True,
                                  num_reorder_pics=2,
                                  max_dec_pic_buffering=5)
    frames = synthetic_frames(w, h, 5, seed=11)
    enc = QuadRAEncoder(cfg, gop_size=4, intra_period=16)
    stream = b""
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            stream += nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recs[poc] = rec
    recons = [recs[p] for p in sorted(recs)]
    _check(cfg, frames, stream, recons, tmp_path)


def test_conf_win_ra_ctb16(tmp_path):
    w, h = 120, 68  # coded 128x80 at CTB16
    cfg = StreamConfig.for_source(w, h, qp=32, deblocking_enabled=True,
                                  num_reorder_pics=2,
                                  max_dec_pic_buffering=4)
    frames = synthetic_frames(w, h, 5, seed=13)
    enc = RandomAccessEncoder(cfg, gop_size=4, intra_period=16)
    stream = b""
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            stream += nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recs[poc] = rec
    recons = [recs[p] for p in sorted(recs)]
    _check(cfg, frames, stream, recons, tmp_path)
