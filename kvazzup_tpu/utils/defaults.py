"""Hardware auto-tuning: pick default call settings from the machine.

The DefaultSettings analogue (/root/reference/src/ui/settings/
defaultsettings.cpp:179-380): the reference converts a CPU thread budget
into "complexity points", then walks resolution/format tiers until the
point budget covers capture + conversion + encode, and guesses a bitrate
from the chosen tier.  Here the budget comes from the accelerator tier
(TPU devices run the codec core) with host cores as the fallback, and the
output is a StreamConfig-shaped dict the controller/settings layer can
apply as initial values.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


# (height, width, fps, complexity points needed) — points mirror the
# reference's pixels-per-second tiers (defaultsettings.cpp:265-331)
_TIERS = (
    (2160, 3840, 30, 64),
    (1440, 2560, 30, 32),
    (1080, 1920, 30, 16),
    (720, 1280, 30, 8),
    (480, 640, 30, 4),
    (288, 352, 30, 2),
    (144, 176, 30, 1),
)


@dataclass(frozen=True)
class AutoSettings:
    width: int
    height: int
    fps: int
    bitrate: int          # initial target, bit/s
    wpp: bool
    owf: int              # pipelined encode depth
    intra_period: int
    complexity_points: int
    tier_source: str      # "tpu" | "cpu"


def _device_points() -> tuple[int, str]:
    """Complexity budget: TPU chips carry the codec core (one chip
    sustains ≥1080p30 on the device path), host cores otherwise."""
    try:
        import jax

        devs = jax.devices()
        if devs and devs[0].platform not in ("cpu",):
            return 16 * len(devs), "tpu"
    except Exception:
        pass
    ncpu = os.cpu_count() or 1
    # the reference grants ~1 point per hardware thread after overheads
    return max(1, ncpu - 1), "cpu"


def _bitrate_guess(width: int, height: int, fps: int) -> int:
    """The reference's bitrate heuristic shape: ~0.1 bit/pixel at 30 fps
    scaled by framerate (defaultsettings.cpp:333-366)."""
    return int(0.1 * width * height * (fps / 30.0) * 30.0)


def auto_settings(max_height: int | None = None) -> AutoSettings:
    """Pick default resolution/fps/bitrate/tooling for this machine."""
    points, source = _device_points()
    for h, w, fps, need in _TIERS:
        if max_height is not None and h > max_height:
            continue
        if points >= need:
            return AutoSettings(
                width=w, height=h, fps=fps,
                bitrate=_bitrate_guess(w, h, fps),
                wpp=points >= 4,
                owf=3 if points >= 8 else 2,
                intra_period=64,
                complexity_points=points,
                tier_source=source,
            )
    h, w, fps, _ = _TIERS[-1]
    return AutoSettings(width=w, height=h, fps=fps,
                        bitrate=_bitrate_guess(w, h, fps), wpp=False, owf=1,
                        intra_period=64, complexity_points=points,
                        tier_source=source)


@dataclass(frozen=True)
class OperatingPoint:
    width: int
    height: int
    fps: int
    bitrate: int
    wpp: bool
    tiles: int  # suggested tile-column shards across the device budget


def complexity_points(n_devices: int = 0, host_threads: int | None = None) -> int:
    """Explicit-budget variant of _device_points: accelerator chips carry
    the codec core (4 points each — one chip sustains ≥1080p30 on the
    device path), host threads contribute half a point each (capture,
    conversion, CABAC — defaultsettings.cpp:179-263's thread budget)."""
    if host_threads is None:
        host_threads = os.cpu_count() or 1
    return 4 * n_devices + host_threads // 2


def default_operating_point(points: int, max_height: int | None = None) -> OperatingPoint:
    """Resolution/bitrate/tool tier for a given complexity budget (the
    reference's tier walk, defaultsettings.cpp:265-331), plus a suggested
    tile-shard count for the parallel encoder."""
    tiles = min(8, max(1, points // 12))
    for h, w, fps, need in _TIERS:
        if max_height is not None and h > max_height:
            continue
        if points >= need:
            return OperatingPoint(width=w, height=h, fps=fps,
                                  bitrate=_bitrate_guess(w, h, fps),
                                  wpp=points >= 4, tiles=tiles)
    h, w, fps, _ = _TIERS[-1]
    return OperatingPoint(width=w, height=h, fps=fps,
                          bitrate=_bitrate_guess(w, h, fps), wpp=False,
                          tiles=1)


def apply_defaults(settings) -> AutoSettings:
    """Write the auto-tuned values into a utils.settings.Settings registry
    (only keys not already set by the user)."""
    a = auto_settings()
    for key, val in (("video/width", a.width), ("video/height", a.height),
                     ("video/fps", a.fps), ("video/bitrate", a.bitrate),
                     ("video/wpp", a.wpp), ("video/owf", a.owf),
                     ("video/intra_period", a.intra_period)):
        if settings.value(key) is None:
            settings.set(key, val)
    return a
