"""ROI detection -> per-CTU QP-delta maps, in native JAX.

Successor of the reference's ONNX-Runtime YOLO filter
(/root/reference/src/media/processing/roiyolofilter.cpp: letterbox,
NMS :414-417, makeRoiMap :664-699 producing an int8 QP-offset grid) — the
one reference component that is trivially TPU-friendly (SURVEY.md §2.6).

Two detectors:
* `saliency_roi` — deterministic, model-free: temporal activity + spatial
  detail saliency.  Always available; used by default.
* `RoiConvNet`   — a small fully-convolutional objectness head with the
  YOLO-style decode + NMS pipeline, as the plug-in point for trained
  weights (architecture + pre/post-processing here; training is out of
  scope for the codec core).

Both feed `roi_map_from_boxes` / quantized maps matching the reference's
RoiMap contract (negative QP delta inside regions of interest).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------- saliency detector


@functools.partial(jax.jit, static_argnames=("ctb_size", "qp_delta"))
def saliency_roi(y, prev_y, *, ctb_size: int = 16, qp_delta: int = -6):
    """Per-CTU QP-delta map from motion + detail saliency.

    y, prev_y: (H, W) uint8 luma.  Returns (ctbs_h, ctbs_w) int8: qp_delta
    where salient, 0 elsewhere (top ~25% most active CTUs are salient).
    """
    yf = y.astype(jnp.float32)
    pf = prev_y.astype(jnp.float32)
    motion = jnp.abs(yf - pf)
    gx = jnp.abs(yf[:, 1:] - yf[:, :-1])
    gy = jnp.abs(yf[1:, :] - yf[:-1, :])
    detail = jnp.pad(gx, ((0, 0), (0, 1))) + jnp.pad(gy, ((0, 1), (0, 0)))
    score = motion * 2.0 + detail

    h, w = y.shape
    ch, cw = h // ctb_size, w // ctb_size
    per_ctu = score[: ch * ctb_size, : cw * ctb_size].reshape(
        ch, ctb_size, cw, ctb_size
    ).mean(axis=(1, 3))
    thresh = jnp.percentile(per_ctu, 75.0)
    # a flat/static frame has an all-zero score surface; >= alone would then
    # mark every CTU salient
    salient = (per_ctu >= thresh) & (per_ctu > 0)
    return jnp.where(salient, jnp.int8(qp_delta), jnp.int8(0))


def roi_map_from_boxes(boxes, scores, width: int, height: int, ctb_size: int = 16,
                       qp_delta: int = -10, score_thresh: float = 0.5):
    """Boxes (N, 4) xyxy + scores -> per-CTU int8 QP-delta grid
    (makeRoiMap parity, roiyolofilter.cpp:664-699)."""
    ch, cw = height // ctb_size, width // ctb_size
    grid = np.zeros((ch, cw), np.int8)
    for (x0, y0, x1, y1), s in zip(np.asarray(boxes), np.asarray(scores)):
        if s < score_thresh:
            continue
        cx0 = max(0, int(x0) // ctb_size)
        cy0 = max(0, int(y0) // ctb_size)
        cx1 = min(cw - 1, int(x1) // ctb_size)
        cy1 = min(ch - 1, int(y1) // ctb_size)
        grid[cy0 : cy1 + 1, cx0 : cx1 + 1] = qp_delta
    return grid


def nms(boxes, scores, iou_thresh: float = 0.45, max_out: int = 32):
    """Greedy non-maximum suppression (fixed-size, jit-safe).

    boxes: (N, 4) xyxy float; scores: (N,).  Returns (max_out, 4) boxes,
    (max_out,) scores (zero-padded)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)

    def iou(b, bs):
        x0 = jnp.maximum(b[0], bs[:, 0])
        y0 = jnp.maximum(b[1], bs[:, 1])
        x1 = jnp.minimum(b[2], bs[:, 2])
        y1 = jnp.minimum(b[3], bs[:, 3])
        inter = jnp.maximum(0.0, x1 - x0) * jnp.maximum(0.0, y1 - y0)
        area = lambda bb: jnp.maximum(0.0, bb[..., 2] - bb[..., 0]) * jnp.maximum(
            0.0, bb[..., 3] - bb[..., 1]
        )
        union = area(b) + area(bs) - inter
        return inter / jnp.maximum(union, 1e-6)

    def body(carry, _):
        scores_live, out_boxes, out_scores, k = carry
        i = jnp.argmax(scores_live)
        s = scores_live[i]
        b = boxes[i]
        keep = s > 0
        out_boxes = out_boxes.at[k].set(jnp.where(keep, b, 0))
        out_scores = out_scores.at[k].set(jnp.where(keep, s, 0))
        suppress = iou(b, boxes) > iou_thresh
        scores_live = jnp.where(suppress, -1.0, scores_live)
        return (scores_live, out_boxes, out_scores, k + 1), None

    init = (scores, jnp.zeros((max_out, 4)), jnp.zeros((max_out,)), 0)
    (s_live, ob, osc, _), _ = jax.lax.scan(body, init, None, length=max_out)
    return ob, osc


@dataclass
class RoiConvNet:
    """Tiny fully-convolutional objectness head (YOLO-style decode).

    Input: (H, W) luma normalized to [0,1], stride-16 feature grid; output
    per-cell (objectness, dx, dy, dw, dh).  Weights are a pytree; random
    init by default (plug trained weights via `params`)."""

    channels: tuple = (8, 16, 32)

    def init(self, key):
        params = []
        cin = 1
        for i, cout in enumerate(self.channels):
            key, k1 = jax.random.split(key)
            w = jax.random.normal(k1, (3, 3, cin, cout)) * np.sqrt(2.0 / (9 * cin))
            params.append({"w": w, "b": jnp.zeros((cout,))})
            cin = cout
        key, k1 = jax.random.split(key)
        params.append({"w": jax.random.normal(k1, (1, 1, cin, 5)) * 0.01, "b": jnp.zeros((5,))})
        return params

    def apply(self, params, y):
        x = (y.astype(jnp.float32) / 255.0)[None, :, :, None]
        for i, p in enumerate(params[:-1]):
            x = jax.lax.conv_general_dilated(
                x, p["w"], window_strides=(2, 2) if i < 4 else (1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"]
            x = jax.nn.relu(x)
        # ensure stride 16 total: 3 stride-2 convs -> 8; one extra pool
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
        )
        p = params[-1]
        out = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["b"]
        return out[0]  # (H/16, W/16, 5)

    def detect(self, params, y, score_thresh: float = 0.5):
        """Decode grid predictions to boxes + NMS."""
        grid = self.apply(params, y)
        gh, gw, _ = grid.shape
        obj = jax.nn.sigmoid(grid[..., 0])
        cy = (jnp.arange(gh)[:, None] + 0.5 + jnp.tanh(grid[..., 1])) * 16
        cx = (jnp.arange(gw)[None, :] + 0.5 + jnp.tanh(grid[..., 2])) * 16
        bw = jnp.exp(jnp.clip(grid[..., 3], -4, 4)) * 32
        bh = jnp.exp(jnp.clip(grid[..., 4], -4, 4)) * 32
        boxes = jnp.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
        ).reshape(-1, 4)
        return nms(boxes, obj.reshape(-1))


# ----------------------------------------------------- Haar production path


class RoiHaarFilter:
    """Face/upper-body ROI via OpenCV Haar cascades — the production
    detector for real camera content (mirrors the reference's CPU-side
    ONNX-Runtime YOLO, roiyolofilter.cpp; SURVEY §2.6 allows host-side
    aux compute).  Cascades ship with the system OpenCV.
    """

    CASCADE_DIR = "/usr/share/opencv4/haarcascades"

    def __init__(self, qp_delta: int = -10, ctb_size: int = 16) -> None:
        import cv2  # hard dep only when this filter is constructed

        if not hasattr(cv2, "CascadeClassifier"):
            raise RuntimeError("OpenCV built without objdetect (no cascades)")
        self.qp_delta = qp_delta
        self.ctb_size = ctb_size
        import os

        base = self.CASCADE_DIR if os.path.isdir(self.CASCADE_DIR) else (
            getattr(cv2.data, "haarcascades", self.CASCADE_DIR))
        self.face = cv2.CascadeClassifier(
            os.path.join(base, "haarcascade_frontalface_alt2.xml"))
        self.body = cv2.CascadeClassifier(
            os.path.join(base, "haarcascade_upperbody.xml"))
        if self.face.empty() and self.body.empty():
            raise RuntimeError("no usable Haar cascades found")

    def detect(self, y: np.ndarray):
        """(H, W) uint8 luma -> (boxes xyxy, scores)."""
        boxes = []
        for det in (self.face, self.body):
            if det.empty():
                continue
            for (x, yy, w, h) in det.detectMultiScale(
                    np.asarray(y), scaleFactor=1.1, minNeighbors=4):
                boxes.append((x, yy, x + w, yy + h))
        if not boxes:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        return (np.asarray(boxes, np.float32),
                np.ones((len(boxes),), np.float32))

    def roi_map(self, y: np.ndarray) -> np.ndarray:
        h, w = y.shape
        boxes, scores = self.detect(y)
        return roi_map_from_boxes(boxes, scores, w, h, self.ctb_size,
                                  self.qp_delta)


def make_roi_fn(kind: str = "saliency", qp_delta: int = -8,
                ctb_size: int = 16, params=None):
    """ROI-callback factory for VideoSendPipeline(roi_fn=...).

    kind: 'saliency' (model-free), 'net' (trained RoiConvNet; packaged
    weights by default), or 'haar' (OpenCV cascades for real faces).
    Returns fn(frame) -> (ctbs_h, ctbs_w) int8 QP-delta grid.
    """
    if kind == "saliency":
        state = {"prev": None}

        def fn(frame):
            prev = state["prev"] if state["prev"] is not None else frame.y
            state["prev"] = frame.y
            return np.asarray(saliency_roi(jnp.asarray(frame.y),
                                           jnp.asarray(prev),
                                           ctb_size=ctb_size,
                                           qp_delta=qp_delta))

        return fn
    if kind == "net":
        from .roi_train import load_default_roi_params

        net = RoiConvNet()
        params = params if params is not None else load_default_roi_params()
        if params is None:
            raise RuntimeError("no trained ROI weights packaged; run "
                               "python -m kvazzup_tpu.models.roi_train")

        def fn(frame):
            h, w = frame.y.shape
            boxes, scores = net.detect(params, jnp.asarray(frame.y))
            return roi_map_from_boxes(boxes, scores, w, h, ctb_size, qp_delta)

        return fn
    if kind == "haar":
        f = RoiHaarFilter(qp_delta=qp_delta, ctb_size=ctb_size)
        return lambda frame: f.roi_map(np.asarray(frame.y))
    raise ValueError(f"unknown roi kind {kind!r}")
