"""Severity-tagged singleton logger.

Parity: the reference's Logger (/root/reference/src/logger.{h,cpp}:
severity levels DEBUG_NORMAL..DEBUG_PROGRAM_ERROR, mutex-guarded singleton,
console + file sink, uniform name/value formatting).
"""

from __future__ import annotations

import enum
import sys
import threading
import time
from typing import Any


class Severity(enum.IntEnum):
    NORMAL = 0
    IMPORTANT = 1
    WARNING = 2
    ERROR = 3
    PROGRAM_ERROR = 4


class Logger:
    _instance: "Logger | None" = None
    _ilock = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._file = None
        self._min_severity = Severity.NORMAL
        self._t0 = time.monotonic()

    @classmethod
    def get(cls) -> "Logger":
        with cls._ilock:
            if cls._instance is None:
                cls._instance = Logger()
            return cls._instance

    def set_file(self, path: str | None) -> None:
        with self._lock:
            if self._file:
                self._file.close()
                self._file = None
            if path:
                self._file = open(path, "a")

    def set_min_severity(self, sev: Severity) -> None:
        self._min_severity = sev

    def log(self, sev: Severity, component: str, message: str, **values: Any) -> None:
        if sev < self._min_severity:
            return
        t = time.monotonic() - self._t0
        kv = ", ".join(f"{k}={v}" for k, v in values.items())
        line = f"[{t:10.3f}] [{sev.name:<13}] {component}: {message}" + (f" ({kv})" if kv else "")
        with self._lock:
            print(line, file=sys.stderr)
            if self._file:
                self._file.write(line + "\n")
                self._file.flush()

    def debug(self, component: str, message: str, **values: Any) -> None:
        self.log(Severity.NORMAL, component, message, **values)

    def warning(self, component: str, message: str, **values: Any) -> None:
        self.log(Severity.WARNING, component, message, **values)

    def error(self, component: str, message: str, **values: Any) -> None:
        self.log(Severity.ERROR, component, message, **values)
