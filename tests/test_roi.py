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


def test_trained_roi_net_detects_held_out_faces():
    """The packaged RoiConvNet weights (trained by models/roi_train.py on
    procedurally rendered face scenes) must detect held-out faces: >=80%
    recall at IoU 0.4, zero detections on faceless backgrounds — closing
    round-1 weak #9 (untrained scaffold)."""
    import jax.numpy as jnp

    from kvazzup_tpu.models.roi_train import (load_default_roi_params,
                                              render_scene)

    params = load_default_roi_params()
    assert params is not None, "roi_weights.npz must be packaged"
    net = RoiConvNet()
    rng = np.random.default_rng(777)  # held out from training (seed 0)

    def iou(a, b):
        x0, y0 = max(a[0], b[0]), max(a[1], b[1])
        x1, y1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, x1 - x0) * max(0, y1 - y0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-6)

    hits = total = 0
    for _ in range(25):
        y, gt = render_scene(rng, 160, 128)
        boxes, scores = net.detect(params, jnp.asarray(y))
        det = [b for b, s in zip(np.asarray(boxes), np.asarray(scores))
               if s > 0.5]
        for g in gt:
            total += 1
            hits += any(iou(g, d) > 0.4 for d in det)
    assert hits / total >= 0.8, f"recall {hits}/{total}"
    # faceless scenes must stay quiet
    for _ in range(10):
        flat = (np.kron(rng.integers(0, 256, (18, 22)),
                        np.ones((8, 8)))[:128, :160] * 0.5 + 64).astype(np.uint8)
        _, scores = net.detect(params, jnp.asarray(flat))
        assert not np.any(np.asarray(scores) > 0.5)


def test_roi_net_qp_map_helps_face_region():
    """End-to-end: the trained net's ROI map shifts bits toward the face
    (roiyolofilter.cpp makeRoiMap flow with OUR detector in the loop)."""
    import jax.numpy as jnp

    from kvazzup_tpu.core.params import StreamConfig
    from kvazzup_tpu.encoder.top import Encoder
    from kvazzup_tpu.io.yuv import psnr
    from kvazzup_tpu.models.roi import roi_map_from_boxes
    from kvazzup_tpu.models.roi_train import (load_default_roi_params,
                                              render_scene)

    params = load_default_roi_params()
    net = RoiConvNet()
    rng = np.random.default_rng(31)
    w, h = 160, 128
    y, gt = render_scene(rng, w, h, max_faces=1)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    boxes, scores = net.detect(params, jnp.asarray(y))
    delta = roi_map_from_boxes(boxes, scores, w, h, qp_delta=-8)
    assert (delta < 0).any(), "detector found no ROI on a face scene"
    base_qp = 37
    qp_map = np.clip(base_qp + delta.astype(np.int32), 0, 51)
    cfg = StreamConfig(width=w, height=h, qp=base_qp, cu_qp_delta=True)
    s_roi, rec_roi = Encoder(cfg, intra_period=1).encode_frame(y, u, v, qp_map=qp_map)
    cfg2 = StreamConfig(width=w, height=h, qp=base_qp)
    s_flat, rec_flat = Encoder(cfg2, intra_period=1).encode_frame(y, u, v)
    gx0, gy0, gx1, gy1 = [int(t) for t in gt[0]]
    gx0, gy0 = max(0, gx0), max(0, gy0)
    face_roi = psnr(y[gy0:gy1, gx0:gx1], np.asarray(rec_roi[0])[gy0:gy1, gx0:gx1])
    face_flat = psnr(y[gy0:gy1, gx0:gx1], np.asarray(rec_flat[0])[gy0:gy1, gx0:gx1])
    assert face_roi > face_flat + 1.0, (face_roi, face_flat)
    # bounded ROI coverage + bit overhead (duplicate boxes only widen the
    # union; -8 QP over the covered quarter of the frame costs ~2x bits)
    assert (delta < 0).mean() <= 0.6
    assert len(s_roi) < len(s_flat) * 2.5


def test_make_roi_fn_kinds():
    from kvazzup_tpu.models.roi import make_roi_fn
    from kvazzup_tpu.pipeline.media_pipeline import Frame

    y = np.random.default_rng(0).integers(0, 255, (64, 96), np.uint8)
    f = Frame(y, y[:32, :48], y[:32, :48], 0.0)
    for kind in ("saliency", "net"):
        fn = make_roi_fn(kind)
        grid = fn(f)
        assert grid.shape == (4, 6) and grid.dtype == np.int8
    try:
        fn = make_roi_fn("haar")
    except RuntimeError:
        return  # no cascades in this environment: constructor is honest
    grid = fn(f)
    assert grid.shape == (4, 6)
