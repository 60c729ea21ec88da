"""Live display sink: the render-surface end of the receive pipeline.

Parity targets: the reference's DisplayFilter (mirroring flags +
presentation-delay stats, src/media/processing/displayfilter.cpp) and
VideoYUVWidget (the YUV->RGB render surface,
src/ui/gui/videoyuvwidget.h:23-99).  The TPU build renders headlessly by
design (SURVEY.md §1.4: VideoInterface is the deliberate seam), but this
sink gives frames a REAL surface when one exists:

  * fbdev  — mmap a Linux framebuffer (/dev/fb0) and blit RGB with
             nearest-neighbor fit (the direct-scanout path a kiosk
             deployment uses; no X/Qt needed);
  * kitty  — kitty graphics protocol escape codes to a terminal
             (base64 RGB placements, live video in an ssh session);
  * sixel  — DEC sixel escapes for plain terminals;
  * null   — headless: frames are converted + counted, stats recorded.

YUV->RGB uses the same BT.601 fixed-point kernels as the reference's
in-repo SIMD (ops/colorspace.py <-> yuvconversions.cpp).  Backend "auto"
probes fbdev, then the terminal, then falls back to null — honestly, the
way the audio output device does.
"""

from __future__ import annotations

import base64
import os
import sys
import time

import numpy as np

from ..ops.colorspace import yuv420_to_rgb


class DisplaySink:
    """Callable display: sink(y, u, v) renders one I420 frame.

    mirror_h/mirror_v: the DisplayFilter flip flags (self-view mirroring).
    stats: optional Statistics — presentation delay is recorded per frame
    against an enqueue timestamp (pass present_ts to __call__), matching
    statisticsinterface.h:43-49 semantics.
    """

    def __init__(self, backend: str = "auto", *, mirror_h: bool = False,
                 mirror_v: bool = False, stats=None, fb_path: str = "/dev/fb0",
                 fb_geometry: tuple | None = None, out=None) -> None:
        self.mirror_h = mirror_h
        self.mirror_v = mirror_v
        self.stats = stats
        self.frames_presented = 0
        self.last_rgb = None  # most recent rendered RGB (test/selfview tap)
        self._fb = None
        self._out = out or sys.stdout
        if backend == "auto":
            if os.path.exists(fb_path) and os.access(fb_path, os.W_OK):
                backend = "fbdev"
            elif os.environ.get("TERM", "").startswith("xterm-kitty"):
                backend = "kitty"
            else:
                backend = "null"
        self.backend = backend
        if backend == "fbdev":
            self._fb_path = fb_path
            self._fb_geom = fb_geometry or self._probe_fb_geometry(fb_path)
            if self._fb_geom is None:
                self.backend = "null"

    @staticmethod
    def _probe_fb_geometry(fb_path):
        """(width, height, bytes_per_pixel) from sysfs; None when absent."""
        name = os.path.basename(fb_path)
        try:
            vs = open(f"/sys/class/graphics/{name}/virtual_size").read()
            bpp = int(open(f"/sys/class/graphics/{name}/bits_per_pixel").read())
            w, h = (int(t) for t in vs.strip().split(","))
            return (w, h, bpp // 8)
        except OSError:
            return None

    # ------------------------------------------------------------- render
    def __call__(self, y, u, v, present_ts: float | None = None) -> None:
        y = np.asarray(y)
        u = np.asarray(u)
        v = np.asarray(v)
        rgb = np.asarray(yuv420_to_rgb(y, u, v))
        if self.mirror_h:
            rgb = rgb[:, ::-1]
        if self.mirror_v:
            rgb = rgb[::-1]
        self.last_rgb = rgb
        if self.backend == "fbdev":
            self._blit_fb(rgb)
        elif self.backend == "kitty":
            self._emit_kitty(rgb)
        elif self.backend == "sixel":
            self._emit_sixel(rgb)
        self.frames_presented += 1
        if self.stats is not None and present_ts is not None:
            try:
                self.stats.record_delay("present", time.time() - present_ts)
            except Exception:
                pass

    def _blit_fb(self, rgb: np.ndarray) -> None:
        fw, fh, bpp = self._fb_geom
        h, w = rgb.shape[:2]
        # nearest-neighbor fit (preserve aspect), centered
        scale = min(fw / w, fh / h, 1.0)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        xs = (np.arange(ow) * w // ow).astype(np.int64)
        ys = (np.arange(oh) * h // oh).astype(np.int64)
        img = rgb[ys][:, xs]
        if bpp == 4:  # BGRX
            px = np.zeros((oh, ow, 4), np.uint8)
            px[..., 0] = img[..., 2]
            px[..., 1] = img[..., 1]
            px[..., 2] = img[..., 0]
        elif bpp == 2:  # RGB565
            r = (img[..., 0].astype(np.uint16) >> 3) << 11
            g = (img[..., 1].astype(np.uint16) >> 2) << 5
            b = img[..., 2].astype(np.uint16) >> 3
            px = (r | g | b).astype("<u2").view(np.uint8).reshape(oh, ow, 2)
        else:
            px = img
        x0, y0 = (fw - ow) // 2, (fh - oh) // 2
        row_bytes = px.shape[2] if px.ndim == 3 else 1
        try:
            with open(self._fb_path, "r+b") as f:
                stride = fw * bpp
                for r_i in range(oh):
                    f.seek((y0 + r_i) * stride + x0 * bpp)
                    f.write(px[r_i].tobytes())
        except OSError:
            self.backend = "null"  # surface went away: degrade honestly

    def _emit_kitty(self, rgb: np.ndarray) -> None:
        """kitty graphics protocol: one RGB placement per frame."""
        h, w = rgb.shape[:2]
        payload = base64.standard_b64encode(
            np.ascontiguousarray(rgb).tobytes()).decode()
        first = True
        o = self._out
        for i in range(0, len(payload), 4096):
            chunk = payload[i : i + 4096]
            more = 1 if i + 4096 < len(payload) else 0
            if first:
                o.write(f"\x1b_Gf=24,a=T,s={w},v={h},m={more};{chunk}\x1b\\")
                first = False
            else:
                o.write(f"\x1b_Gm={more};{chunk}\x1b\\")
        o.flush()

    def _emit_sixel(self, rgb: np.ndarray, colors: int = 64) -> None:
        """DEC sixel: coarse 64-color fixed palette (2 bits/channel)."""
        h, w = rgb.shape[:2]
        q = ((rgb[..., 0] >> 6) << 4) | ((rgb[..., 1] >> 6) << 2) \
            | (rgb[..., 2] >> 6)
        o = self._out
        o.write("\x1bPq")
        for c in range(colors):
            r = ((c >> 4) & 3) * 33
            g = ((c >> 2) & 3) * 33
            b = (c & 3) * 33
            o.write(f"#{c};2;{r};{g};{b}")
        for band in range(0, h, 6):
            rows = q[band : band + 6]
            for c in np.unique(rows):
                mask = (rows == c)
                bits = np.zeros(w, np.uint8)
                for k in range(mask.shape[0]):
                    bits |= mask[k].astype(np.uint8) << k
                o.write(f"#{c}" + "".join(chr(63 + b) for b in bits) + "$")
            o.write("-")
        o.write("\x1b\\")
        o.flush()
