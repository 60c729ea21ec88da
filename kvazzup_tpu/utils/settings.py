"""Typed settings registry with INI persistence.

Parity: the reference's QSettings-based config with a central key registry
(/root/reference/src/settingskeys.h — ~90 keys across gui/video/kvazaar/
audio/sip/roi groups) and helpers settingEnabled/settingValue/settingString
(/root/reference/src/common.h:22-25).  Two-tier contract preserved: static
encoder config here, the live control loop in pipeline/resource_allocator.
"""

from __future__ import annotations

import configparser
import os
import threading
from dataclasses import dataclass, field
from typing import Any

# central key registry — typo-proof constant names, grouped like the reference
class SettingsKey:
    # video / encoder
    VIDEO_QP = "video/QP"
    VIDEO_PRESET = "video/Preset"
    VIDEO_RESOLUTION_WIDTH = "video/ResolutionWidth"
    VIDEO_RESOLUTION_HEIGHT = "video/ResolutionHeight"
    VIDEO_FRAMERATE = "video/Framerate"
    VIDEO_WPP = "video/WPP"
    VIDEO_OWF = "video/OWF"
    VIDEO_TILES = "video/Tiles"
    VIDEO_TILE_DIMENSIONS = "video/TileDimensions"
    VIDEO_SLICES = "video/Slices"
    VIDEO_INTRA_PERIOD = "video/IntraPeriod"
    VIDEO_VPS_PERIOD = "video/VPSPeriod"
    VIDEO_BITRATE = "video/Bitrate"
    VIDEO_RC_ALGORITHM = "video/RCAlgorithm"
    VIDEO_OBA_CLIP_NEIGHBOURS = "video/OBAClipNeighbours"
    VIDEO_SCALING_LIST = "video/ScalingList"
    VIDEO_LOSSLESS = "video/Lossless"
    VIDEO_MV_CONSTRAINT = "video/MVConstraint"
    VIDEO_QP_IN_CU = "video/QPInCU"
    VIDEO_VAQ = "video/VAQ"
    VIDEO_GOP = "video/GOP"
    # roi
    ROI_ENABLED = "roi/Enabled"
    ROI_QP_DELTA = "roi/QPDelta"
    # audio
    AUDIO_BITRATE = "audio/Bitrate"
    AUDIO_COMPLEXITY = "audio/Complexity"
    AUDIO_ECHO_CANCELLATION = "audio/EchoCancellation"
    AUDIO_DENOISE = "audio/Denoise"
    AUDIO_AGC = "audio/AGC"
    # sip
    SIP_SERVER_ADDRESS = "sip/ServerAddress"
    SIP_AUTO_CONNECT = "sip/AutoConnect"
    SIP_USERNAME = "sip/Username"
    # parallel
    PARALLEL_GOP_DEVICES = "parallel/GOPDevices"
    PARALLEL_TILE_DEVICES = "parallel/TileDevices"


_DEFAULTS: dict[str, Any] = {
    SettingsKey.VIDEO_QP: 27,
    SettingsKey.VIDEO_PRESET: "ultrafast",
    SettingsKey.VIDEO_RESOLUTION_WIDTH: 1280,
    SettingsKey.VIDEO_RESOLUTION_HEIGHT: 720,
    SettingsKey.VIDEO_FRAMERATE: 30,
    SettingsKey.VIDEO_WPP: 1,
    SettingsKey.VIDEO_OWF: 1,
    SettingsKey.VIDEO_TILES: 0,
    SettingsKey.VIDEO_TILE_DIMENSIONS: "2x2",
    SettingsKey.VIDEO_SLICES: 0,
    SettingsKey.VIDEO_INTRA_PERIOD: 64,
    SettingsKey.VIDEO_VPS_PERIOD: 1,
    SettingsKey.VIDEO_BITRATE: 0,
    SettingsKey.VIDEO_RC_ALGORITHM: "oba",
    SettingsKey.VIDEO_GOP: "lp-g4d3t1",
    SettingsKey.ROI_ENABLED: 0,
    SettingsKey.ROI_QP_DELTA: -10,
    SettingsKey.AUDIO_BITRATE: 24000,
    SettingsKey.AUDIO_COMPLEXITY: 10,
    SettingsKey.AUDIO_ECHO_CANCELLATION: 1,
    SettingsKey.AUDIO_DENOISE: 1,
    SettingsKey.AUDIO_AGC: 1,
    SettingsKey.SIP_AUTO_CONNECT: 0,
    SettingsKey.PARALLEL_GOP_DEVICES: 1,
    SettingsKey.PARALLEL_TILE_DEVICES: 1,
}


class Settings:
    """INI-backed settings store (thread-safe)."""

    _subscribers: list

    def __init__(self, path: str | None = None) -> None:
        self._subscribers = []
        self._path = path
        self._lock = threading.Lock()
        self._values: dict[str, Any] = dict(_DEFAULTS)
        if path and os.path.exists(path):
            self.load()

    def value(self, key: str, default: Any = None) -> Any:
        with self._lock:
            return self._values.get(key, default if default is not None else _DEFAULTS.get(key))

    def enabled(self, key: str) -> bool:
        v = self.value(key, 0)
        return str(v) not in ("0", "false", "False", "", "None")

    def subscribe(self, callback) -> None:
        """Change notification (the reference's settingsChanged signal wiring
        that triggers filter-graph rebuilds, SURVEY §3.5)."""
        self._subscribers.append(callback)

    def set(self, key: str, value: Any) -> None:
        with self._lock:
            self._values[key] = value
            subs = list(self._subscribers)
        for cb in subs:
            cb(key, value)

    def load(self) -> None:
        cp = configparser.ConfigParser()
        cp.read(self._path)
        with self._lock:
            for section in cp.sections():
                for opt, val in cp.items(section):
                    self._values[f"{section}/{opt}"] = val

    def save(self) -> None:
        if not self._path:
            return
        cp = configparser.ConfigParser()
        with self._lock:
            for key, val in self._values.items():
                if "/" not in key:
                    continue
                section, opt = key.split("/", 1)
                if not cp.has_section(section):
                    cp.add_section(section)
                cp.set(section, opt, str(val))
        with open(self._path, "w") as f:
            cp.write(f)
