"""CU quadtree (CTB16 -> 4x CU8) intra: conformance + quality.

First level of kvazaar's CTU RDO (reference `search.c` depth recursion,
SURVEY §2.6): split decision, per-CU8 MPM chains, mode-dependent scans
(7.4.9.11), 4x4 chroma TUs, 8-grid deblocking with chroma gating.
"""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder

from test_e2e_intra import oracle_decode, synthetic_frames


def _structured(w, h, seed=7):
    """Blocky/diagonal content where 8x8 CUs actually win."""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 200, np.uint8)
    for _ in range(40):
        x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
        y[y0 : y0 + rng.integers(2, 8), x0 : x0 + rng.integers(2, 8)] = rng.integers(0, 80)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((xx + yy) % 17 < 2, 30, y).astype(np.uint8)
    u = np.where((xx[::2, ::2]) % 11 < 3, 90, 140).astype(np.uint8)
    v = np.where((yy[::2, ::2]) % 13 < 3, 160, 110).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("qp,content", [(22, "synthetic"), (34, "synthetic"),
                                        (30, "structured")])
def test_cu8_self_and_oracle(qp, content, tmp_path):
    w, h = 128, 64
    if content == "synthetic":
        y, u, v = synthetic_frames(w, h, 1, seed=22)[0]
    else:
        y, u, v = _structured(w, h)
    cfg = StreamConfig(width=w, height=h, qp=qp, min_cb_log2=3)
    stream, recon = Encoder(cfg, intra_period=1).encode_frame(y, u, v)

    frames = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))

    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == 1, err
    for p in range(3):
        assert np.array_equal(oracle[0][p], np.asarray(frames[0][p])), (
            f"plane {p} differs from libavcodec"
        )


def test_cu8_splits_engage_and_quality():
    """On structured content the quadtree must actually split and not lose
    to the CU16-only encoder at equal QP."""
    from kvazzup_tpu.encoder.cu8 import encode_frame_intra_cu8_ref
    from kvazzup_tpu.io.yuv import psnr

    w, h = 128, 64
    y, u, v = _structured(w, h)
    out = encode_frame_intra_cu8_ref(y, u, v, 32, width=w, height=h)
    assert out["split"].sum() >= 3  # quadtree engages

    s8, r8 = Encoder(
        StreamConfig(width=w, height=h, qp=32, min_cb_log2=3), intra_period=1
    ).encode_frame(y, u, v)
    s16, r16 = Encoder(
        StreamConfig(width=w, height=h, qp=32), intra_period=1
    ).encode_frame(y, u, v)
    p8, p16 = psnr(y, np.asarray(r8[0])), psnr(y, np.asarray(r16[0]))
    # CU8 must improve the luma RD tradeoff: better PSNR at <= ~5% more bits,
    # or smaller at >= equal PSNR
    assert (p8 >= p16 - 0.05 and len(s8) <= len(s16) * 1.05) or p8 > p16


def test_cu8_scan_coverage():
    """All three residual scans (diag/horiz/vert) appear in split CTBs."""
    from kvazzup_tpu.core.tables import residual_scan_idx
    from kvazzup_tpu.encoder.cu8 import encode_frame_intra_cu8_ref

    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=22)[0]
    out = encode_frame_intra_cu8_ref(y, u, v, 22, width=w, height=h)
    scans = {
        residual_scan_idx(int(m), 3, 0)
        for i in range(len(out["split"])) if out["split"][i]
        for m in out["modes8"][i]
    }
    assert scans == {0, 1, 2}


def test_cu8_device_matches_reference():
    """Wavefront device encoder == sequential reference, bit for bit."""
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.cu8 import encode_frame_intra_cu8_ref
    from kvazzup_tpu.encoder.frame_intra_cu8 import encode_frame_intra_cu8

    w, h = 64, 48
    for seed, qp in ((1, 24), (2, 32), (3, 40)):
        y, u, v = synthetic_frames(w, h, 1, seed=seed)[0]
        dev = encode_frame_intra_cu8(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qp, width=w, height=h
        )
        ref = encode_frame_intra_cu8_ref(y, u, v, qp, width=w, height=h)
        for k in ("split", "modes8", "lev_y", "lev_cb", "lev_cr",
                  "recon_y", "recon_u", "recon_v"):
            assert np.array_equal(np.asarray(dev[k]), np.asarray(ref[k])), (seed, qp, k)


def test_nxn_engages_and_oracle(tmp_path):
    """PART_NxN (4x4 PUs + DST-VII) engages on fine detail and stays
    libavcodec-exact through the full Encoder/Decoder."""
    rng = np.random.default_rng(7)
    w, h = 128, 64
    y = np.full((h, w), 200, np.uint8)
    for _ in range(50):
        x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
        y[y0 : y0 + rng.integers(2, 6), x0 : x0 + rng.integers(2, 6)] = rng.integers(0, 80)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    cfg = StreamConfig(width=w, height=h, qp=27, min_cb_log2=3)
    stream, recon = Encoder(cfg, intra_period=1).encode_frame(y, u, v)

    from kvazzup_tpu.core.nal import split_annexb
    from kvazzup_tpu.core.params import parse_pps, parse_slice_header, parse_sps
    from kvazzup_tpu.entropy.slice_data import decode_slice_data_intra_cu8x

    sps = pps = None
    for nal_ in split_annexb(stream):
        if nal_.nal_type == 33:
            sps = parse_sps(nal_.rbsp)
        elif nal_.nal_type == 34:
            pps = parse_pps(nal_.rbsp)
        elif nal_.nal_type <= 31:
            sh = parse_slice_header(nal_.rbsp, nal_.nal_type, sps, pps)
            scfg = StreamConfig(width=w, height=h, qp=sh.qp, min_cb_log2=3)
            d = decode_slice_data_intra_cu8x(scfg, nal_.rbsp[sh.data_offset_bits // 8 :], sh.qp)
            assert d[1].sum() >= 8  # NxN partitions present in the stream

    frames = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))
    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == 1, err
    for p in range(3):
        assert np.array_equal(oracle[0][p], np.asarray(frames[0][p]))


def test_cu8_wpp_self_and_oracle(tmp_path):
    """Our own CU8 + WPP substreams: conformant entry points + ctx chains."""
    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=22)[0]
    cfg = StreamConfig(width=w, height=h, qp=27, min_cb_log2=3, wpp=True)
    stream, recon = Encoder(cfg, intra_period=1).encode_frame(y, u, v)
    frames = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))
    oracle, err = oracle_decode(stream, w, h, tmp_path)
    assert len(oracle) == 1, err
    for p in range(3):
        assert np.array_equal(oracle[0][p], np.asarray(frames[0][p]))
