"""Observability sink: per-stage delays, bitrates, buffer levels, session log.

Parity: the reference's StatisticsInterface
(/root/reference/src/statisticsinterface.h:25-90 — 20 pure virtuals covering
sessions, codec delays, bitrates, RTCP values, filter buffer levels, SIP
messages) — here one concrete thread-safe aggregator any component can feed
and any frontend (CLI, tracing, tests) can read.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field


@dataclass
class SessionInfo:
    session_id: int
    address: str = ""
    video_enabled: bool = True
    audio_enabled: bool = True


class Statistics:
    """Thread-safe statistics aggregator (StatisticsInterface parity)."""

    WINDOW = 240

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._sessions: dict[int, SessionInfo] = {}
        self._delays: dict[str, deque] = defaultdict(lambda: deque(maxlen=self.WINDOW))
        self._bitrate_samples: dict[str, deque] = defaultdict(lambda: deque(maxlen=self.WINDOW))
        self._buffer_levels: dict[str, tuple[int, int]] = {}
        self._counters: dict[str, int] = defaultdict(int)
        self._sip_log: deque = deque(maxlen=256)
        self._values: dict[str, float] = {}

    # sessions -----------------------------------------------------------
    def add_session(self, info: SessionInfo) -> None:
        with self._lock:
            self._sessions[info.session_id] = info

    def remove_session(self, session_id: int) -> None:
        with self._lock:
            self._sessions.pop(session_id, None)

    def sessions(self) -> list[SessionInfo]:
        with self._lock:
            return list(self._sessions.values())

    # media path ---------------------------------------------------------
    def record_delay(self, stage: str, seconds: float) -> None:
        with self._lock:
            self._delays[stage].append(seconds)

    def record_bytes(self, stream: str, nbytes: int) -> None:
        with self._lock:
            self._bitrate_samples[stream].append((time.monotonic(), nbytes))

    def update_buffer_level(self, filter_name: str, level: int, size: int) -> None:
        with self._lock:
            self._buffer_levels[filter_name] = (level, size)

    def increment(self, counter: str, by: int = 1) -> None:
        with self._lock:
            self._counters[counter] += by

    def set_value(self, key: str, value: float) -> None:
        with self._lock:
            self._values[key] = value

    def add_sip_message(self, direction: str, first_line: str, body: str = "") -> None:
        with self._lock:
            self._sip_log.append((time.monotonic(), direction, first_line, body))

    # views --------------------------------------------------------------
    def mean_delay(self, stage: str) -> float:
        with self._lock:
            d = self._delays.get(stage)
            return sum(d) / len(d) if d else 0.0

    def bitrate(self, stream: str) -> float:
        """Mean bitrate (bit/s) over the sample window."""
        with self._lock:
            s = self._bitrate_samples.get(stream)
            if not s or len(s) < 2:
                return 0.0
            dt = s[-1][0] - s[0][0]
            total = sum(n for _, n in s)
            return 8.0 * total / dt if dt > 0 else 0.0

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "sessions": len(self._sessions),
                "delays_ms": {k: 1e3 * sum(v) / len(v) for k, v in self._delays.items() if v},
                "buffers": dict(self._buffer_levels),
                "counters": dict(self._counters),
                "values": dict(self._values),
            }
