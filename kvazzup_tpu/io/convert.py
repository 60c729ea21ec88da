"""Any-format -> I420 conversion funnel (LibYUVConverter parity).

The reference funnels 13 camera pixel formats into I420 via libyuv's
ConvertToI420, including MJPEG decode
(/root/reference/src/media/processing/libyuvconverter.cpp:30-127).  Here
the arithmetic lives in ops/colorspace.py (JAX, device-capable); this
module is the host-side dispatch by fourcc, with MJPEG decoded through
OpenCV when present (the reference's libjpeg-turbo path) and a clear
error otherwise.
"""

from __future__ import annotations

import numpy as np


def _to_jnp(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def _rgb_to_i420(rgb: np.ndarray):
    from ..ops.colorspace import rgb_to_yuv420

    h = rgb.shape[0] & ~1
    w = rgb.shape[1] & ~1
    y, u, v = rgb_to_yuv420(_to_jnp(rgb[:h, :w]))
    return np.asarray(y), np.asarray(u), np.asarray(v)


def convert_to_i420(fourcc: str, data, width: int | None = None,
                    height: int | None = None):
    """data -> (y, u, v) uint8 planes.

    fourcc: I420/IYUV, NV12, NV21, YUY2/YUYV, UYVY, RGB24, BGR24, RGBA,
    BGRA, ARGB, GRAY/Y800, MJPG/JPEG.  Packed formats take raw bytes (+
    width/height); RGB formats take (H, W, C) arrays or raw bytes.
    """
    f = fourcc.upper()
    if f in ("I420", "IYUV"):
        buf = np.frombuffer(data, np.uint8)
        w, h = width, height
        y = buf[: w * h].reshape(h, w)
        u = buf[w * h : w * h + w * h // 4].reshape(h // 2, w // 2)
        v = buf[w * h + w * h // 4 :][: w * h // 4].reshape(h // 2, w // 2)
        return y.copy(), u.copy(), v.copy()
    if f in ("NV12", "NV21"):
        buf = np.frombuffer(data, np.uint8)
        w, h = width, height
        y = buf[: w * h].reshape(h, w).copy()
        uv = buf[w * h : w * h + w * h // 2].reshape(h // 2, w // 2, 2)
        u, v = (uv[..., 0], uv[..., 1]) if f == "NV12" else (uv[..., 1], uv[..., 0])
        return y, u.copy(), v.copy()
    if f in ("YUY2", "YUYV", "UYVY"):
        from ..ops.colorspace import yuyv_to_yuv420

        buf = np.frombuffer(data, np.uint8).reshape(height, width * 2)
        packed = buf.reshape(height, width, 2)
        if f == "UYVY":  # swap byte roles: U0 Y0 V0 Y1 -> Y U/V interleave
            packed = packed[..., ::-1]
            # UYVY: bytes (U,Y,V,Y); view as pairs then swap -> (Y,U),(Y,V)
        y, u, v = yuyv_to_yuv420(_to_jnp(packed.reshape(height, width * 2)))
        return np.asarray(y), np.asarray(u), np.asarray(v)
    if f in ("RGB24", "RGB"):
        arr = data if isinstance(data, np.ndarray) else np.frombuffer(
            data, np.uint8).reshape(height, width, 3)
        return _rgb_to_i420(arr)
    if f in ("BGR24", "BGR"):
        arr = data if isinstance(data, np.ndarray) else np.frombuffer(
            data, np.uint8).reshape(height, width, 3)
        return _rgb_to_i420(np.ascontiguousarray(arr[:, :, ::-1]))
    if f in ("RGBA", "BGRA", "ARGB"):
        arr = data if isinstance(data, np.ndarray) else np.frombuffer(
            data, np.uint8).reshape(height, width, 4)
        if f == "RGBA":
            rgb = arr[:, :, :3]
        elif f == "BGRA":
            rgb = arr[:, :, 2::-1]
        else:  # ARGB
            rgb = arr[:, :, 1:4]
        return _rgb_to_i420(np.ascontiguousarray(rgb))
    if f in ("GRAY", "Y800", "GREY"):
        arr = data if isinstance(data, np.ndarray) else np.frombuffer(
            data, np.uint8).reshape(height, width)
        h, w = arr.shape[0] & ~1, arr.shape[1] & ~1
        return (arr[:h, :w].copy(),
                np.full((h // 2, w // 2), 128, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8))
    if f in ("MJPG", "JPEG", "MJPEG"):
        try:
            import cv2
        except Exception as e:  # pragma: no cover
            raise NotImplementedError("MJPEG needs OpenCV in this build") from e
        bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("MJPEG decode failed")
        return _rgb_to_i420(np.ascontiguousarray(bgr[:, :, ::-1]))
    raise ValueError(f"unsupported fourcc {fourcc!r}")
