"""ROI detection -> QP-delta maps -> ROI-coded stream (ROIYoloFilter
parity: roiyolofilter.cpp NMS :414-417, makeRoiMap :664-699)."""

import numpy as np
import pytest

from kvazzup_tpu.models.roi import RoiConvNet, nms, roi_map_from_boxes, saliency_roi


def test_saliency_marks_active_region():
    w, h = 128, 64
    prev = np.full((h, w), 100, np.uint8)
    cur = prev.copy()
    cur[16:32, 32:64] = 200  # a moving bright object
    m = np.asarray(saliency_roi(cur, prev))
    assert m.shape == (4, 8)
    assert (m[1, 2:4] < 0).all()  # object CTUs got negative delta
    assert m[3, 7] == 0  # static corner untouched


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    ob, osc = nms(boxes, scores)
    kept = np.asarray(osc) > 0
    assert kept.sum() == 2  # the overlapping pair collapses to one
    assert np.asarray(osc)[0] == pytest.approx(0.9)
    assert np.allclose(np.asarray(ob)[0], boxes[0])


def test_roi_map_from_boxes():
    grid = roi_map_from_boxes(
        np.array([[20, 20, 50, 40]]), np.array([0.9]), width=128, height=64
    )
    assert grid.shape == (4, 8)
    assert (grid[1:3, 1:4] == -10).all()
    assert grid[0, 0] == 0
    # sub-threshold box ignored
    g2 = roi_map_from_boxes(
        np.array([[20, 20, 50, 40]]), np.array([0.3]), width=128, height=64
    )
    assert (g2 == 0).all()


def test_convnet_shapes_and_detect():
    import jax

    net = RoiConvNet()
    params = net.init(jax.random.PRNGKey(0))
    y = np.random.default_rng(0).integers(0, 255, (64, 128)).astype(np.uint8)
    grid = net.apply(params, y)
    assert grid.shape == (4, 8, 5)
    boxes, scores = net.detect(params, y)
    assert boxes.shape == (32, 4) and scores.shape == (32,)


def test_roi_stream_spends_bits_in_roi():
    """ROI qp_map through the encoder: the ROI area gets a lower QP and the
    stream still decodes bit-exactly (the RoiMap -> kvazaar pass-through,
    kvazaarfilter.cpp:423-431)."""
    from kvazzup_tpu.core.params import StreamConfig
    from kvazzup_tpu.decoder.top import Decoder
    from kvazzup_tpu.encoder.top import Encoder
    from kvazzup_tpu.io.yuv import psnr, synthetic_frames

    w, h = 128, 64
    y, u, v = synthetic_frames(w, h, 1, seed=5)[0]
    base_qp = 36
    delta = roi_map_from_boxes(
        np.array([[0, 0, 64, 32]]), np.array([0.9]), width=w, height=h, qp_delta=-8
    )
    qp_map = np.clip(base_qp + delta.astype(np.int32), 0, 51)
    cfg = StreamConfig(width=w, height=h, qp=base_qp, cu_qp_delta=True)
    enc = Encoder(cfg, intra_period=1)
    stream, recon = enc.encode_frame(y, u, v, qp_map=qp_map)
    frames = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(recon[p]), np.asarray(frames[0][p]))
    ry = np.asarray(recon[0])
    roi_psnr = psnr(y[:32, :64], ry[:32, :64])
    rest_psnr = psnr(y[32:, 64:], ry[32:, 64:])
    assert roi_psnr > rest_psnr + 1.5  # bits concentrated in the ROI
