"""Profiling hooks: per-stage delay accounting + device tracing.

The reference's observability is StatisticsInterface delay metrics
(statisticsinterface.h:40-49); the TPU-side equivalent adds the XLA
profiler (jax.profiler) behind one switch — set KVAZZUP_TRACE_DIR (or
call start_trace) and every jitted stage lands in an xprof trace.
"""

from __future__ import annotations

import contextlib
import os
import time


def start_trace(log_dir: str | None = None) -> bool:
    """Begin a device trace (view with xprof/tensorboard)."""
    log_dir = log_dir or os.environ.get("KVAZZUP_TRACE_DIR")
    if not log_dir:
        return False
    import jax

    jax.profiler.start_trace(log_dir)
    return True


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


@contextlib.contextmanager
def stage(stats, name: str):
    """Time one pipeline stage into Statistics (and the device trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        t0 = time.monotonic()
        try:
            yield
        finally:
            if stats is not None:
                stats.record_delay(name, time.monotonic() - t0)
