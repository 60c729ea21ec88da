"""ROI detector training: procedural face scenes -> RoiConvNet weights.

The reference ships a pre-trained ONNX YOLO for face/person ROI
(/root/reference/src/media/processing/roiyolofilter.cpp:664-699).  This
environment has no model zoo, so we train the TPU-friendly student
ourselves: a procedural renderer composites face-like objects (skin
ellipse, eye/brow/mouth structure, shading) over textured backgrounds
with non-face distractors, giving ground-truth boxes for free; the tiny
fully-convolutional head (models/roi.RoiConvNet) trains on that in
minutes and generalizes to this family of scenes (held-out IoU test in
tests/test_roi.py).  Packaged weights live next to this file
(roi_weights.npz); `load_default_roi_params()` loads them.

For real camera content the Haar-cascade path (models/roi.RoiHaarFilter,
system OpenCV cascades) is the production detector, mirroring the
reference's CPU-side ONNX-runtime usage.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .roi import RoiConvNet

WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "roi_weights.npz")


# ------------------------------------------------------- scene renderer


def _draw_ellipse(img, cx, cy, rx, ry, value, blend=1.0):
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((xx - cx) / max(rx, 1)) ** 2 + ((yy - cy) / max(ry, 1)) ** 2 <= 1.0
    img[mask] = (1 - blend) * img[mask] + blend * value


def render_face(img, rng, cx, cy, size):
    """Draw one face-like object centred at (cx, cy); returns its box."""
    rx, ry = size * 0.42, size * 0.55
    skin = rng.integers(150, 220)
    _draw_ellipse(img, cx, cy, rx, ry, skin)
    # shading: slightly darker lower half
    _draw_ellipse(img, cx, cy + ry * 0.45, rx * 0.9, ry * 0.45, skin - 15, 0.5)
    eye_dy = ry * 0.30
    eye_dx = rx * 0.45
    eye_r = max(1.5, size * 0.055)
    dark = rng.integers(20, 70)
    for sx in (-1, 1):
        # brow, eye
        _draw_ellipse(img, cx + sx * eye_dx, cy - eye_dy - eye_r * 2.2,
                      eye_r * 1.6, eye_r * 0.6, dark + 30)
        _draw_ellipse(img, cx + sx * eye_dx, cy - eye_dy, eye_r, eye_r, dark)
    # nose shadow + mouth
    _draw_ellipse(img, cx, cy + ry * 0.05, eye_r * 0.7, eye_r * 1.4, skin - 25, 0.7)
    _draw_ellipse(img, cx, cy + ry * 0.45, rx * 0.45, eye_r * 0.7, dark + 20)
    return (cx - rx, cy - ry, cx + rx, cy + ry)


def render_scene(rng, width: int, height: int, max_faces: int = 2):
    """-> (y uint8 (H, W), boxes list of xyxy).  Distractors included."""
    base = rng.integers(0, 256, (height // 8 + 2, width // 8 + 2))
    img = np.kron(base, np.ones((8, 8)))[:height, :width].astype(np.float64)
    img = 0.5 * img + 0.25 * rng.integers(0, 256) + 0.25 * 128
    # non-face distractors: plain ellipses and rectangles
    for _ in range(rng.integers(1, 4)):
        cx, cy = rng.integers(0, width), rng.integers(0, height)
        if rng.random() < 0.5:
            _draw_ellipse(img, cx, cy, rng.integers(6, 30), rng.integers(6, 30),
                          rng.integers(0, 256))
        else:
            x0, y0 = max(0, cx - 20), max(0, cy - 12)
            img[y0 : y0 + rng.integers(8, 36), x0 : x0 + rng.integers(8, 48)] = (
                rng.integers(0, 256))
    boxes = []
    for _ in range(rng.integers(1, max_faces + 1)):
        size = rng.integers(28, min(72, height // 2))
        cx = rng.integers(size // 2 + 4, width - size // 2 - 4)
        cy = rng.integers(size // 2 + 4, height - size // 2 - 4)
        boxes.append(render_face(img, rng, cx, cy, size))
    noise = rng.normal(0, 4, img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8), boxes


def _targets(boxes, gh: int, gw: int, stride: int = 16):
    """Per-cell training targets: (obj, dx, dy, log w/32, log h/32)."""
    t = np.zeros((gh, gw, 5), np.float32)
    for (x0, y0, x1, y1) in boxes:
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        gx, gy = int(cx // stride), int(cy // stride)
        # positive cells: 3x3 around the centre cell (small-object recall)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yy, xx = gy + dy, gx + dx
                if 0 <= yy < gh and 0 <= xx < gw:
                    if t[yy, xx, 0] == 0 or (dx == 0 and dy == 0):
                        t[yy, xx] = (
                            1.0,
                            np.clip(cx / stride - (xx + 0.5), -0.99, 0.99),
                            np.clip(cy / stride - (yy + 0.5), -0.99, 0.99),
                            np.log(max(x1 - x0, 8) / 32.0),
                            np.log(max(y1 - y0, 8) / 32.0),
                        )
    return t


# ------------------------------------------------------------- training


def train_roi_net(steps: int = 1500, width: int = 160, height: int = 128,
                  batch: int = 8, seed: int = 0, lr: float = 3e-3):
    """Train RoiConvNet on rendered scenes; returns params."""
    import optax

    net = RoiConvNet()
    params = net.init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    gh, gw = height // 16, width // 16

    @jax.jit
    def loss_fn(params, ys, ts):
        def one(y, t):
            g = net.apply(params, y)  # (gh, gw, 5)
            obj_logit = g[..., 0]
            obj_t = t[..., 0]
            # focal-ish BCE: balance sparse positives
            bce = optax.sigmoid_binary_cross_entropy(obj_logit, obj_t)
            wpos = jnp.where(obj_t > 0, 8.0, 1.0)
            l_obj = (bce * wpos).mean()
            # box regression only at positive cells
            dxy = jnp.tanh(g[..., 1:3])
            dwh = jnp.clip(g[..., 3:5], -4, 4)
            l_box = (jnp.where(obj_t[..., None] > 0,
                               (dxy - t[..., 1:3]) ** 2
                               + (dwh - t[..., 3:5]) ** 2, 0.0)).sum() / (
                obj_t.sum() * 4 + 1e-6)
            return l_obj + l_box

        return jnp.mean(jax.vmap(one)(ys, ts))

    @jax.jit
    def step(params, opt_state, ys, ts):
        l, g = jax.value_and_grad(loss_fn)(params, ys, ts)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    rng = np.random.default_rng(seed)
    for it in range(steps):
        ys, ts = [], []
        for _ in range(batch):
            y, boxes = render_scene(rng, width, height)
            ys.append(y)
            ts.append(_targets(boxes, gh, gw))
        ys = jnp.asarray(np.stack(ys))
        ts = jnp.asarray(np.stack(ts))
        params, opt_state, l = step(params, opt_state, ys, ts)
        if it % 200 == 0:
            print(f"step {it}: loss {float(l):.4f}")
    return params


def save_params(params, path: str = WEIGHTS_PATH) -> None:
    flat = {}
    for i, layer in enumerate(params):
        flat[f"w{i}"] = np.asarray(layer["w"])
        flat[f"b{i}"] = np.asarray(layer["b"])
    np.savez_compressed(path, **flat)


def load_default_roi_params(path: str = WEIGHTS_PATH):
    """Load the packaged trained weights; None if absent."""
    if not os.path.exists(path):
        return None
    z = np.load(path)
    params = []
    i = 0
    while f"w{i}" in z:
        params.append({"w": jnp.asarray(z[f"w{i}"]), "b": jnp.asarray(z[f"b{i}"])})
        i += 1
    return params


if __name__ == "__main__":
    p = train_roi_net()
    save_params(p)
    print(f"saved {WEIGHTS_PATH}")
