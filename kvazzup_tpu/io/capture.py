"""Capture sources: camera / screen / file, feeding the send pipeline.

Parity with the reference's capture filters
(/root/reference/src/media/processing/camerafilter.cpp:92-272 — QCamera
format negotiation + frame callback; screensharefilter.cpp:44-66 — timer
-driven screen grabs).  Headless/TPU-pod reality: real devices are
optional; every source degrades to a deterministic synthetic generator so
the full pipeline runs in CI and on hosts without /dev/video*.

Each source runs its own thread at the configured fps and hands
`pipeline.Frame`s to a callback — the capture edge of the filter graph.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable

import numpy as np

from ..pipeline.media_pipeline import Frame
from ..utils.logging import Logger


class _TimedSource:
    """Base: fps-paced producer thread (screensharefilter.cpp timer model)."""

    def __init__(self, callback: Callable[[Frame], None], fps: float = 30.0) -> None:
        self.callback = callback
        self.fps = fps
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=type(self).__name__)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def _grab(self) -> Frame | None:  # pragma: no cover - overridden
        raise NotImplementedError

    def _run(self) -> None:
        period = 1.0 / self.fps
        next_t = time.monotonic()
        while not self._stop.is_set():
            f = self._grab()
            if f is not None:
                self.callback(f)
            next_t += period
            delay = next_t - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            else:
                next_t = time.monotonic()  # fell behind: don't burst


class SyntheticSource(_TimedSource):
    """Deterministic moving-gradient YUV generator (the CI camera)."""

    def __init__(self, callback, width: int = 640, height: int = 368,
                 fps: float = 30.0, seed: int = 0) -> None:
        super().__init__(callback, fps)
        self.width, self.height = width, height
        self._i = seed

    def _grab(self) -> Frame:
        w, h, i = self.width, self.height, self._i
        self._i += 1
        yy, xx = np.mgrid[0:h, 0:w]
        y = ((xx + 2 * i) // 2 + (yy + i) // 3).astype(np.uint8)
        u = np.full((h // 2, w // 2), 128 + (i % 64) - 32, np.uint8)
        v = np.full((h // 2, w // 2), 128 - (i % 64) + 32, np.uint8)
        return Frame(y, u, v)


class CameraSource(_TimedSource):
    """V4L2 camera via OpenCV when present, else synthetic fallback.

    (The reference negotiates QCamera formats; here the conversion funnel
    is ops/colorspace.py — everything becomes I420 before the encoder.)"""

    def __init__(self, callback, device: int = 0, width: int = 640,
                 height: int = 368, fps: float = 30.0) -> None:
        super().__init__(callback, fps)
        self.width, self.height = width, height
        self._cap = None
        self._fallback = None
        try:  # pragma: no cover - hardware path
            import cv2

            if os.path.exists(f"/dev/video{device}"):
                cap = cv2.VideoCapture(device)
                if cap.isOpened():
                    cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
                    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
                    self._cap = cap
        except Exception:
            pass
        if self._cap is None:
            Logger.get().info("CameraSource", "no camera; synthetic fallback")
            self._fallback = SyntheticSource(callback, width, height, fps)

    def _grab(self) -> Frame | None:
        if self._cap is None:
            return self._fallback._grab()
        ok, bgr = self._cap.read()  # pragma: no cover - hardware path
        if not ok:
            return None
        import jax.numpy as jnp

        from ..ops.colorspace import rgb_to_yuv420

        rgb = np.ascontiguousarray(bgr[:, :, ::-1])
        h = rgb.shape[0] & ~15
        w = rgb.shape[1] & ~15
        y, u, v = rgb_to_yuv420(jnp.asarray(rgb[:h, :w]))
        return Frame(np.asarray(y), np.asarray(u), np.asarray(v))

    def stop(self) -> None:
        super().stop()
        if self._cap is not None:  # pragma: no cover
            self._cap.release()


class FileSource(_TimedSource):
    """Loops a y4m/yuv clip at fps — deterministic 'camera' for tests and
    benchmarks (no reference counterpart; their CI gap, SURVEY §4)."""

    def __init__(self, callback, path: str, fps: float = 30.0,
                 size: str | None = None, loop: bool = True) -> None:
        super().__init__(callback, fps)
        from .yuv import read_y4m, read_yuv420

        if path.endswith(".y4m"):
            self.frames, _, _, _ = read_y4m(path)
        else:
            w, h = (int(t) for t in size.split("x"))
            self.frames = read_yuv420(path, w, h)
        self.loop = loop
        self._i = 0

    def _grab(self) -> Frame | None:
        if self._i >= len(self.frames):
            if not self.loop:
                self._stop.set()
                return None
            self._i = 0
        y, u, v = self.frames[self._i]
        self._i += 1
        return Frame(y, u, v)


class ScreenSource(_TimedSource):
    """Screen capture at a timer-driven fps (screensharefilter.cpp:44-66).

    X11 grab via OpenCV/mss when a display exists; deterministic synthetic
    desktop otherwise (headless pods have no screen to share)."""

    def __init__(self, callback, width: int = 1280, height: int = 720,
                 fps: float = 15.0) -> None:
        super().__init__(callback, fps)
        self.width, self.height = width & ~15, height & ~15
        self._grabber = None
        if os.environ.get("DISPLAY"):  # pragma: no cover - needs X11
            try:
                import mss

                self._grabber = mss.mss()
            except Exception:
                pass
        self._i = 0

    def _grab(self) -> Frame:
        w, h = self.width, self.height
        if self._grabber is not None:  # pragma: no cover - needs X11
            import numpy as _np

            shot = self._grabber.grab(self._grabber.monitors[1])
            rgb = _np.asarray(shot)[:h, :w, 2::-1]
            from .convert import convert_to_i420

            return Frame(*convert_to_i420("RGB24", _np.ascontiguousarray(rgb)))
        # synthetic "desktop": window rectangles + moving cursor block
        self._i += 1
        y = np.full((h, w), 235, np.uint8)
        y[: h // 12, :] = 60  # title bar
        y[h // 3 : h // 3 + h // 2, w // 8 : w // 8 + w // 2] = 180
        cx = (self._i * 7) % (w - 8)
        cy = (self._i * 3) % (h - 8)
        y[cy : cy + 8, cx : cx + 8] = 0
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        return Frame(y, u, v)
