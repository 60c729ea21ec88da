"""Device enumeration: cameras, screens, audio — headless analogues of the
reference's camerainfo.cpp / microphoneinfo.cpp / screeninfo.cpp, plus the
accelerator inventory the TPU build adds."""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class DeviceInfo:
    kind: str     # "camera" | "screen" | "audio-in" | "audio-out" | "accelerator"
    index: int
    name: str
    path: str = ""


def list_cameras() -> list[DeviceInfo]:
    """V4L2 capture nodes (/dev/video*); name from sysfs when present."""
    out = []
    for i, dev in enumerate(sorted(glob.glob("/dev/video*"))):
        name = dev
        sys_name = f"/sys/class/video4linux/{os.path.basename(dev)}/name"
        try:
            name = open(sys_name).read().strip()
        except OSError:
            pass
        out.append(DeviceInfo("camera", i, name, dev))
    return out


def list_screens() -> list[DeviceInfo]:
    """X/Wayland displays from the environment (headless: none)."""
    out = []
    disp = os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
    if disp:
        out.append(DeviceInfo("screen", 0, f"display {disp}", disp))
    return out


def list_audio() -> list[DeviceInfo]:
    """ALSA cards from /proc/asound (capture + playback not distinguished
    without opening them; the AudioOutput/Capture filters probe on use)."""
    out = []
    try:
        for line in open("/proc/asound/cards"):
            line = line.strip()
            if line and line[0].isdigit():
                idx = int(line.split()[0])
                name = line.split(":", 1)[-1].strip()
                out.append(DeviceInfo("audio-in", idx, name))
                out.append(DeviceInfo("audio-out", idx, name))
    except OSError:
        pass
    return out


def list_accelerators() -> list[DeviceInfo]:
    """JAX devices (the codec core's compute budget; feeds
    utils.defaults.auto_settings)."""
    try:
        import jax

        return [DeviceInfo("accelerator", i, f"{d.platform}:{d.device_kind}")
                for i, d in enumerate(jax.devices())]
    except Exception:
        return []


def list_devices() -> list[DeviceInfo]:
    return (list_cameras() + list_screens() + list_audio()
            + list_accelerators())
