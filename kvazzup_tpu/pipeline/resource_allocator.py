"""Runtime bitrate/QP adaptation — the live control loop.

Parity: the reference's ResourceAllocator
(/root/reference/src/media/resourceallocator.cpp): HEVC bitrate operating
range 150 kbit/s..10 Mbit/s, Opus 16..24 kbit/s (:9-12), AIMD adaptation
driven by RTCP receiver reports — halve on loss, x0.9 on jitter, x1.1
otherwise (:67-104).  Here the same loop also emits a QP suggestion for the
traced-QP encoder (the device side recompiles for nothing).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

MIN_VIDEO_BITRATE = 150_000
MAX_VIDEO_BITRATE = 10_000_000
MIN_AUDIO_BITRATE = 16_000
MAX_AUDIO_BITRATE = 24_000


@dataclass
class ReceiverReport:
    fraction_lost: float  # 0..1
    jitter_ms: float
    round_trip_ms: float = 0.0


class ResourceAllocator:
    """AIMD video-bitrate controller + QP mapper."""

    def __init__(self, initial_bitrate: int = 3_000_000, jitter_threshold_ms: float = 30.0):
        self._lock = threading.Lock()
        self._bitrate = initial_bitrate
        self._audio_bitrate = MAX_AUDIO_BITRATE
        self._jitter_threshold = jitter_threshold_ms

    @property
    def video_bitrate(self) -> int:
        with self._lock:
            return self._bitrate

    @property
    def audio_bitrate(self) -> int:
        with self._lock:
            return self._audio_bitrate

    def handle_receiver_report(self, rr: ReceiverReport) -> int:
        """AIMD update (resourceallocator.cpp:67-104 semantics)."""
        with self._lock:
            if rr.fraction_lost > 0.0:
                self._bitrate = int(self._bitrate * 0.5)
            elif rr.jitter_ms > self._jitter_threshold:
                self._bitrate = int(self._bitrate * 0.9)
            else:
                self._bitrate = int(self._bitrate * 1.1)
            self._bitrate = max(MIN_VIDEO_BITRATE, min(MAX_VIDEO_BITRATE, self._bitrate))
            if rr.fraction_lost > 0.0:
                self._audio_bitrate = MIN_AUDIO_BITRATE
            else:
                self._audio_bitrate = min(MAX_AUDIO_BITRATE, self._audio_bitrate + 1000)
            return self._bitrate

    def suggest_qp(self, width: int, height: int, fps: float) -> int:
        """Map target bitrate to a constant QP via a bits-per-pixel model.

        First-order rate model: bpp roughly halves per +6 QP.  Anchored at
        QP 32 ~ 0.05 bpp for natural content (refined by the real rate
        controller milestone).
        """
        import math

        with self._lock:
            bitrate = self._bitrate
        bpp = bitrate / (width * height * max(1.0, fps))
        qp = 32 - 6.0 * math.log2(max(bpp, 1e-6) / 0.05)
        return int(max(0, min(51, round(qp))))
