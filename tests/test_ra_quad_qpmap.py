"""qp_map (ROI / per-CTU adaptive QP) composed with the RA-quad64
production path (VERDICT r3 ask #9): the reference's ROI encoding
(roiyolofilter.cpp:664-699 -> kvazaarfilter.cpp:423-431) works on its
default RA operating point, so ours must too.  Temporal-layer QP
cascading shifts the whole map per layer; streams are pinned against the
libavcodec oracle and the package decoder."""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.ra import QuadRAEncoder
from kvazzup_tpu.io.yuv import psnr, synthetic_frames

from tests.test_e2e_intra import oracle_decode


def _cfg(w, h, **kw):
    return StreamConfig(width=w, height=h, qp=34, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, cu_qp_delta=True,
                        deblocking_enabled=True, num_reorder_pics=2,
                        max_dec_pic_buffering=5, **kw)


def _run(cfg, frames, qp_maps, tmp_path, gop_size=4):
    enc = QuadRAEncoder(cfg, gop_size=gop_size, intra_period=16)
    stream = b""
    recs = {}
    for (y, u, v), qm in zip(frames, qp_maps):
        for poc, nal, rec in enc.push_frame(y, u, v, qp_map=qm):
            stream += nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recs[poc] = rec
    assert sorted(recs) == list(range(len(frames)))
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for k, poc in enumerate(sorted(recs)):
        for a, b in zip(recs[poc], outs[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (self)")
    ref, log = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
    assert len(ref) == len(frames), log
    for k, poc in enumerate(sorted(recs)):
        for a, b in zip(recs[poc], ref[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (oracle)")
    return stream, recs


def test_ra_quad_qp_map_production(tmp_path):
    """gop4 pyramid + LD tail with a drifting ROI map, full toolset."""
    w, h = 192, 128
    cfg = _cfg(w, h, wpp=True, sao_enabled=True, merge_cand=5, rdoq=True)
    frames = synthetic_frames(w, h, 7, seed=21)
    rng = np.random.default_rng(3)
    maps = []
    for _ in range(len(frames)):
        m = np.full((cfg.ctbs_h, cfg.ctbs_w), 36, np.int32)
        m[:, : cfg.ctbs_w // 2] = 28  # ROI half
        m += rng.integers(-2, 3, m.shape)
        maps.append(np.clip(m, 10, 48))
    _run(cfg, frames, maps, tmp_path)


# The ROI-quality case lives in test_ra_quad_qpmap_roi.py: one heavy RA
# case per xdist worker (jaxlib compile-budget, see pytest.ini).
