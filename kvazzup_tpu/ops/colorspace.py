"""Pixel-format conversion kernels: the libyuv / in-repo-SIMD replacement.

Parity targets: the reference's hand-written AVX2/SSE4.1 kernels
(/root/reference/src/media/processing/yuvconversions.cpp — fixed-point BT.601
YUV<->RGB with shift-add coefficient decomposition, YUYV unpack, half-size
RGB downscale, flips) and libyuv's ConvertToI420 entry
(/root/reference/src/media/processing/libyuvconverter.cpp:30-127).  One
batched jnp formulation replaces the CPUID dispatch ("dispatch = jit
specialization", SURVEY.md §2.6); rows/planes vectorize on the VPU.

Fixed-point BT.601 studio-swing coefficients (x256), matching the
reference's integer math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """I420 -> interleaved RGB uint8 (H, W, 3).  BT.601 integer math:
    R = (298(Y-16) + 409(V-128) + 128) >> 8, etc."""
    yy = y.astype(jnp.int32) - 16
    uu = _upsample2(u).astype(jnp.int32) - 128
    vv = _upsample2(v).astype(jnp.int32) - 128
    c = 298 * yy
    r = (c + 409 * vv + 128) >> 8
    g = (c - 100 * uu - 208 * vv + 128) >> 8
    b = (c + 516 * uu + 128) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def rgb_to_yuv420(rgb: jnp.ndarray):
    """Interleaved RGB uint8 (H, W, 3) -> I420 planes.  BT.601:
    Y = (66R + 129G + 25B + 128 >> 8) + 16; U/V box-subsampled."""
    p = rgb.astype(jnp.int32)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u_full = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v_full = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    u = _box2(u_full)
    v = _box2(v_full)
    clip8 = lambda x: jnp.clip(x, 0, 255).astype(jnp.uint8)
    return clip8(y), clip8(u), clip8(v)


def yuyv_to_yuv420(packed: jnp.ndarray):
    """YUYV 4:2:2 packed (H, W*2) bytes -> I420 planes (vertical 2:1 chroma
    decimation by averaging)."""
    h, w2 = packed.shape
    w = w2 // 2
    quads = packed.reshape(h, w // 2, 4).astype(jnp.int32)
    y = jnp.stack([quads[..., 0], quads[..., 2]], axis=-1).reshape(h, w)
    u422 = quads[..., 1]
    v422 = quads[..., 3]
    u = (u422[0::2] + u422[1::2] + 1) >> 1
    v = (v422[0::2] + v422[1::2] + 1) >> 1
    clip8 = lambda x: jnp.clip(x, 0, 255).astype(jnp.uint8)
    return clip8(y), clip8(u), clip8(v)


def half_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downscale of interleaved RGB (the self-view half_rgb path)."""
    p = rgb.astype(jnp.int32)
    s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
    return ((s + 2) >> 2).astype(jnp.uint8)


def flip_vertical(img: jnp.ndarray) -> jnp.ndarray:
    return img[::-1]


def flip_horizontal(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, ::-1]


def _upsample2(c: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x chroma upsample (matches the reference's integer path)."""
    return jnp.repeat(jnp.repeat(c, 2, axis=0), 2, axis=1)


def _box2(p: jnp.ndarray) -> jnp.ndarray:
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def scale_plane(plane: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Generic plane resize, bilinear with half-pel centers — the
    ScaleFilter analogue (/root/reference/src/media/processing/
    scalefilter.cpp:21-79, which delegates to Qt's smooth scaler).

    plane: (H, W) uint8/int32.  Separable gather + lerp in fixed point
    (8-bit fractions), batched over the whole plane."""
    p = plane.astype(jnp.int32)
    h, w = p.shape

    def axis_idx(n_out, n_in):
        # source coordinate of each output center, in 1/256 units
        pos = ((jnp.arange(n_out, dtype=jnp.int32) * 2 + 1) * n_in * 128
               // n_out - 128)
        pos = jnp.clip(pos, 0, (n_in - 1) * 256)
        i0 = pos >> 8
        f = pos & 255
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        return i0, i1, f

    y0, y1, fy = axis_idx(out_h, h)
    x0, x1, fx = axis_idx(out_w, w)
    top = p[y0][:, x0] * (256 - fx)[None, :] + p[y0][:, x1] * fx[None, :]
    bot = p[y1][:, x0] * (256 - fx)[None, :] + p[y1][:, x1] * fx[None, :]
    out = (top * (256 - fy)[:, None] + bot * fy[:, None] + 32768) >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def scale_i420(y, u, v, out_h: int, out_w: int):
    """Scale a full I420 frame (luma + both chroma planes)."""
    return (scale_plane(y, out_h, out_w),
            scale_plane(u, out_h // 2, out_w // 2),
            scale_plane(v, out_h // 2, out_w // 2))


def scale_rgb(rgb: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Scale interleaved (H, W, 3) RGB (display-path generic resize)."""
    planes = [scale_plane(rgb[..., c], out_h, out_w) for c in range(3)]
    return jnp.stack(planes, axis=-1)
