"""Hardware auto-tuning: pick an operating point from what's available.

Parity with the reference's DefaultSettings
(/root/reference/src/ui/settings/defaultsettings.cpp:179-380: thread
budget -> "complexity points" -> resolution/framerate -> bitrate guess).
The TPU build's budget is device FLOPs instead of CPU threads: one chip
comfortably carries 1080p30 through the wavefront path, host cores bound
the CABAC side, and more mesh devices raise the ceiling via tiles/GOP
sharding (parallel/tiles.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class OperatingPoint:
    width: int
    height: int
    fps: float
    bitrate: int  # bits/s
    tiles: int  # tile columns to shard over devices
    wpp: bool


# (complexity tiers mirror defaultsettings.cpp's table shape)
_TIERS = [
    (0, OperatingPoint(640, 368, 30.0, 800_000, 1, True)),
    (2, OperatingPoint(1280, 720, 30.0, 2_000_000, 1, True)),
    (4, OperatingPoint(1920, 1088, 30.0, 4_000_000, 1, True)),
    (12, OperatingPoint(1920, 1088, 60.0, 6_000_000, 2, True)),
    (24, OperatingPoint(3840, 2176, 30.0, 12_000_000, 4, True)),
    (48, OperatingPoint(3840, 2176, 60.0, 20_000_000, 8, True)),
]


def complexity_points(n_devices: int | None = None, host_threads: int | None = None) -> int:
    """Budget: 4 points per accelerator chip + 1 per 2 host threads
    (CABAC rows scale with host cores; device work with chips)."""
    if n_devices is None:
        try:
            import jax

            n_devices = len(jax.devices())
        except Exception:
            n_devices = 1
    if host_threads is None:
        host_threads = os.cpu_count() or 4
    return 4 * n_devices + host_threads // 2


def default_operating_point(points: int | None = None) -> OperatingPoint:
    if points is None:
        points = complexity_points()
    best = _TIERS[0][1]
    for need, op in _TIERS:
        if points >= need:
            best = op
    return best
