"""Concurrency stress: the race-detection analogue (SURVEY §5 — the
reference relies on upstream TSan runs; a Python/C stack gets determinism
checks instead).  Hammers every thread-bearing component — the
frame-parallel decoder, the shared native library, and the statistics
aggregator — and asserts byte-identical, loss-free results across
scheduling orders."""

import os
import subprocess
import threading

import numpy as np
import pytest

from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420
from kvazzup_tpu.utils.stats import SessionInfo, Statistics

from test_e2e_intra import _ensure_oracle


def _b_stream(tmp_path, n=18, w=192, h=128):
    tool = _ensure_oracle()
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), synthetic_frames(w, h, n, seed=13))
    out = tmp_path / "out.265"
    r = subprocess.run(
        [tool, "encode", str(src), f"{w}x{h}", "30", str(out),
         "no-scenecut=1:repeat-headers=1:frame-threads=1:keyint=8"],
        capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-200:]}")
    return out.read_bytes()


def _digest(frames):
    import hashlib

    h = hashlib.sha256()
    for f in frames:
        for p in f:
            h.update(np.asarray(p).tobytes())
    return h.hexdigest()


def test_frame_parallel_decode_deterministic(tmp_path):
    """The frame scheduler must produce byte-identical output across
    runs (any scheduling-order dependence would show as flaky bytes)
    and match the single-threaded decode exactly."""
    stream = _b_stream(tmp_path)
    os.environ["KVZ_TPU_DECODE_THREADS"] = "1"
    try:
        ref = _digest(Decoder().decode(stream))
    finally:
        del os.environ["KVZ_TPU_DECODE_THREADS"]
    for _ in range(4):
        assert _digest(Decoder().decode(stream)) == ref


def test_concurrent_decoders_share_native_lib(tmp_path):
    """N decoders over the one shared C library concurrently: the
    library must be reentrant (all state on the stack / caller buffers)."""
    stream = _b_stream(tmp_path, n=10)
    ref = _digest(Decoder().decode(stream))
    results = [None] * 4
    errors = []

    def run(i):
        try:
            results[i] = _digest(Decoder().decode(stream))
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r == ref for r in results)


def test_statistics_thread_hammer():
    """Statistics is written from every pipeline thread: hammer all
    mutators while a reader renders, assert totals are loss-free."""
    st = Statistics()
    st.add_session(SessionInfo(session_id=1))
    N, T = 2000, 6
    stop = threading.Event()

    def writer(tid):
        for i in range(N):
            st.increment("ops")
            st.record_delay(f"stage{tid % 3}", 0.001 * (i % 7))
            st.record_bytes(f"s{tid % 2}", 100)
            st.update_buffer_level("q", i % 10, 10)

    def reader():
        from kvazzup_tpu.utils.charts import render_html
        from kvazzup_tpu.utils.stats import render_dashboard

        while not stop.is_set():
            render_dashboard(st)
            render_html(st)

    rt = threading.Thread(target=reader)
    rt.start()
    threads = [threading.Thread(target=writer, args=(i,)) for i in range(T)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join()
    assert st.snapshot()["counters"]["ops"] == N * T
