"""cu_qp_delta (per-CTU qp_map / ROI hook) on the quad CTB32/64 paths.

The reference exposes ROI-driven per-CTU QP through kvazaar's roi/qp-map
config (/root/reference/src/media/processing/kvazaarfilter.cpp ROI map +
dependencies/kvazaar: cu_qp_delta at any CTU size); here the quad device
waves take a per-CTU QP vector and the quad entropy writers interleave
cu_qp_delta_abs at the first cbf TU (7.3.8.10).  Streams are pinned
against the libavcodec oracle and the package decoder.
"""

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames

from test_e2e_intra import oracle_decode


def _roundtrip(cfg, frames, qp_maps, tmp_path):
    enc = Encoder(cfg, intra_period=len(frames))
    stream = b""
    recons = []
    for (y, u, v), qm in zip(frames, qp_maps):
        s, recon = enc.encode_frame(y, u, v, qp_map=qm)
        stream += s
        recons.append(recon)
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for got, want in zip(outs, recons):
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
    ref, log = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
    assert len(ref) == len(frames), log
    for got, want in zip(ref, recons):
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
    return recons


def _qp_maps(cfg, n):
    """Per-frame maps with an ROI block and per-frame drift."""
    maps = []
    rng = np.random.default_rng(11)
    for i in range(n):
        m = np.full((cfg.ctbs_h, cfg.ctbs_w), 36, np.int32)
        m[: cfg.ctbs_h // 2, : cfg.ctbs_w // 2] = 26  # ROI quadrant
        m += rng.integers(-2, 3, m.shape)  # exercise the delta chain
        maps.append(np.clip(m, 10, 48))
    return maps


@pytest.mark.parametrize("wpp", [False, True])
@pytest.mark.parametrize("ctb_log2", [5, 6])
def test_quad_qp_map_ip(ctb_log2, wpp, tmp_path):
    """I+P+P with per-CTU QP on the quad production combo."""
    w, h = (128, 96) if ctb_log2 == 5 else (192, 128)
    cfg = StreamConfig(width=w, height=h, qp=34, ctb_log2=ctb_log2,
                       min_cb_log2=3, max_tb_log2=5, cu_qp_delta=True,
                       deblocking_enabled=True, sao_enabled=True, wpp=wpp,
                       merge_cand=5, temporal_mvp=True, rdoq=True)
    frames = synthetic_frames(w, h, 3, seed=5)
    _roundtrip(cfg, frames, _qp_maps(cfg, 3), tmp_path)


def test_quad_qp_roi_quality(tmp_path):
    """The ROI quadrant (QP 24) must come out measurably finer."""
    from kvazzup_tpu.io.yuv import psnr

    w, h = 128, 96
    cfg = StreamConfig(width=w, height=h, qp=40, ctb_log2=5, min_cb_log2=3,
                       max_tb_log2=5, cu_qp_delta=True,
                       deblocking_enabled=True)
    y, u, v = synthetic_frames(w, h, 1, seed=8)[0]
    qm = np.full((cfg.ctbs_h, cfg.ctbs_w), 40, np.int32)
    qm[:, : cfg.ctbs_w // 2] = 24
    enc = Encoder(cfg)
    stream, recon = enc.encode_frame(y, u, v, qp_map=qm)
    ref, log = oracle_decode(stream, w, h, tmp_path)
    assert len(ref) == 1, log
    for a, b in zip(recon, ref[0]):
        np.testing.assert_array_equal(a, b)
    roi = psnr(y[:, : w // 2], recon[0][:, : w // 2])
    rest = psnr(y[:, w // 2 :], recon[0][:, w // 2 :])
    assert roi > rest + 3
