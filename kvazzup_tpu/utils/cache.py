"""Persistent XLA compilation cache setup (kills multi-minute recompiles)."""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Host-CPU feature fingerprint for the cache path.

    XLA:CPU persists AOT-compiled kernels into the cache; loading an entry
    compiled on a host with different CPU features executes foreign machine
    code (observed: SIGABRT/SIGILL mid-suite after the 'machine type used
    for XLA:CPU compilation doesn't match' warning).  Keying the directory
    on the feature set makes stale entries unreachable instead of fatal.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # Key the directory on the active backend as well: a process holding
    # the axon (TPU tunnel) plugin compiles its CPU executables with
    # different LLVM pseudo-features (+prefer-no-scatter/+prefer-no-gather
    # observed) than a plain CPU-only process on the same host, and
    # cross-loading those AOT entries aborts the process.
    backend = jax.default_backend()
    cache_dir = path or os.environ.get(
        "KVZ_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"kvazzup_tpu_xla_{_host_fingerprint()}_{backend}"),
    )
    os.makedirs(cache_dir, exist_ok=True)

    # Serialize persistent-cache writes: jaxlib's executable.serialize()
    # segfaults when two threads hit it concurrently (observed: simultaneous
    # SIGSEGV in libjax_common.so from the pipelined-encoder worker thread
    # and the main thread during the test suite).  One process-wide lock
    # around the put path removes the race; reads go through it too since
    # deserialize shares the underlying proto machinery.
    import threading

    from jax._src import compilation_cache as _cc

    if not getattr(_cc, "_kvz_tpu_locked", False):
        _lock = threading.Lock()
        # Per-process compile-cache operation budget: jaxlib's executable
        # serialize/deserialize null-derefs after ~200 compiles in ONE
        # process (see pytest.ini).  After the budget the wrappers stop
        # entering the crashy serialize path entirely — later compiles
        # just skip the persistent cache (slower, alive).  The budget
        # counts puts and HITS only; misses are cheap and common.
        # 48: a gop8 byte-identity test (two full RA engine sets + vmap
        # variants) still segfaulted in a put at <=120 ops; 48 keeps the
        # serialize call count well below the observed crash region while
        # caching every first-tier engine compile
        used = [0]

        def _budget() -> int:
            return int(os.environ.get("KVZ_TPU_CACHE_BUDGET", "48"))

        def _locked(fn, miss_value=None, is_put=False):
            def wrap(*a, **k):
                with _lock:
                    if used[0] >= _budget():
                        return miss_value
                    if is_put and os.environ.get("KVZ_TPU_CACHE_NO_PUT"):
                        # executable.serialize() is the abort site; tests
                        # whose compile mix triggers it opt out of WRITES
                        # while keeping reads (entries written by other
                        # processes still accelerate them)
                        return miss_value
                    out = fn(*a, **k)
                    if not (isinstance(out, tuple) and out[0] is None):
                        used[0] += 1
                    return out
            return wrap

        _cc.put_executable_and_time = _locked(_cc.put_executable_and_time,
                                              is_put=True)
        _cc.get_executable_and_time = _locked(
            _cc.get_executable_and_time, miss_value=(None, None))
        _cc._kvz_tpu_locked = True
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
