"""qp_map x RA-quad64, part 2: the ROI region must come out measurably
better than the rest (split from test_ra_quad_qpmap.py for xdist worker
compile-budget spreading)."""

import numpy as np

from kvazzup_tpu.io.yuv import psnr, synthetic_frames

from tests.test_ra_quad_qpmap import _cfg, _run


def test_ra_quad_qp_map_roi_quality(tmp_path):
    w, h = 192, 128
    cfg = _cfg(w, h)
    frames = synthetic_frames(w, h, 5, seed=22)
    m = np.full((cfg.ctbs_h, cfg.ctbs_w), 40, np.int32)
    m[:, : cfg.ctbs_w // 2] = 24  # strong ROI: left half
    maps = [m] * len(frames)
    _, recs = _run(cfg, frames, maps, tmp_path)
    roi_psnr, rest_psnr = [], []
    for poc in sorted(recs):
        y = frames[poc][0]
        ry = recs[poc][0]
        roi_psnr.append(psnr(y[:, : w // 2], ry[:, : w // 2]))
        rest_psnr.append(psnr(y[:, w // 2 :], ry[:, w // 2 :]))
    assert np.mean(roi_psnr) > np.mean(rest_psnr) + 2.0
