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


def _spark(values, width: int = 24) -> str:
    """chartpainter.cpp's line chart, reduced to a terminal sparkline."""
    if not values:
        return ""
    vals = list(values)[-width:]
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    blocks = "▁▂▃▄▅▆▇█"
    return "".join(blocks[int((v - lo) / span * 7)] for v in vals)


def render_dashboard(stats: "Statistics") -> str:
    """Text rendering of the reference's StatisticsWindow tabs
    (statisticswindow.h:18-234): sessions, per-stage delays, stream
    bitrates, buffer levels, counters, recent SIP log."""
    with stats._lock:
        sessions = list(stats._sessions.values())
        delays = {k: list(v) for k, v in stats._delays.items() if v}
        streams = list(stats._bitrate_samples.keys())
        buffers = dict(stats._buffer_levels)
        counters = dict(stats._counters)
        sip_log = list(stats._sip_log)[-8:]
    lines = ["=== kvazzup_tpu statistics ==="]
    if sessions:
        lines.append("-- sessions")
        for s in sessions:
            lines.append(f"  #{s.session_id} {getattr(s, 'address', '')}")
    if delays:
        lines.append("-- stage delays (ms, mean | recent)")
        for stage, hist in delays.items():
            mean = 1e3 * sum(hist) / len(hist)
            lines.append(f"  {stage:<12} {mean:7.1f}  {_spark([v * 1000 for v in hist])}")
    if streams:
        lines.append("-- streams (kbit/s)")
        for stream in streams:
            lines.append(f"  {stream:<12} {stats.bitrate(stream) / 1000:9.1f}")
    if buffers:
        lines.append("-- buffer levels")
        for name, (level, size) in buffers.items():
            lines.append(f"  {name:<12} {level}/{size}")
    if counters:
        lines.append("-- counters")
        for k, v in sorted(counters.items()):
            lines.append(f"  {k:<28} {v}")
    if sip_log:
        lines.append("-- SIP (last 8)")
        for _t, d, first, _body in sip_log:
            lines.append(f"  {d:<3} {first}")
    return "\n".join(lines)
