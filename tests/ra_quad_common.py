"""Shared helpers for the RA quad64 test files.

Split across test files (test_ra_quad.py / test_ra_quad_combo.py /
test_ra_quad_refresh.py) so pytest-xdist's per-file scheduling keeps each
worker below the jaxlib ~200-compile segfault threshold (see pytest.ini).
"""

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import RandomAccessEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

from tests.test_e2e_intra import oracle_decode


def _cfg(w, h, qp=32, **kw):
    kw.setdefault("deblocking_enabled", True)
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, num_reorder_pics=3,
                        max_dec_pic_buffering=6, **kw)


def _moving_frames(w, h, n, seed=12):
    return synthetic_frames(w, h, n, seed=seed)


def _run_ra(cfg, frames, tmp_path, gop_size=8, intra_period=32):
    enc = RandomAccessEncoder(cfg, gop_size=gop_size,
                              intra_period=intra_period)
    stream = b""
    recons = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            stream += nal
            recons[poc] = rec
    for poc, nal, rec in enc.flush():
        stream += nal
        recons[poc] = rec
    assert sorted(recons) == list(range(len(frames)))
    outs = Decoder().decode(stream)
    assert len(outs) == len(frames)
    for k, poc in enumerate(sorted(recons)):
        for a, b in zip(recons[poc], outs[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (self)")
    ref, log = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
    assert len(ref) == len(frames), log
    for k, poc in enumerate(sorted(recons)):
        for a, b in zip(recons[poc], ref[k]):
            np.testing.assert_array_equal(a, b, err_msg=f"poc {poc} (oracle)")
    return stream, recons
