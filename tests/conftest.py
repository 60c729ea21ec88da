"""Test configuration: force CPU backend with a virtual 8-device mesh.

Real-TPU benchmarking happens in bench.py; tests validate correctness and
multi-device sharding semantics on the host (SURVEY.md §4: the reference
lacks a loopback transport for CI — we build one in from the start).

Note: this environment pins JAX_PLATFORMS=axon (TPU tunnel);
JAX_PLATFORM_NAME is the override that reliably wins, so set both.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The axon sitecustomize imports AND initializes jax's backend at interpreter
# startup — before this file runs — so env vars alone are too late (and the
# first client init already consumed XLA_FLAGS, so the host-device-count flag
# can't take effect post-hoc either).  Re-select cpu + 8 virtual devices via
# jax.config and rebuild the backend; nothing has created device arrays yet
# at collection time, so this is safe.
import jax

# Do NOT query jax.devices() before the config updates — the query itself
# marks backends initialized and jax_num_cpu_devices then refuses to change.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # already 8 from a previous conftest import in this process
import jax.extend.backend as _jeb

_jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh required for tests"

# Persistent XLA compilation cache: first-compiles of the larger kernels
# (32x32 intra sweep / transforms) take tens of seconds; cache them across
# test sessions like cli.py/bench.py do.
#
# Suite posture (r5): READ-ONLY with an effectively unlimited hit budget.
# jaxlib's serialize path (cache puts) is the documented abort site and
# the old combined 48-op budget ALSO cut off hits, so late-session
# compiles that could have been cheap deserializes became real compiles
# — pushing long-lived workers over the ~200-compile crash threshold
# (r5: repeated tail-of-suite worker segfaults in
# backend_compile_and_load; every crashed file passes alone).  Reads
# are kept unlimited, writes off; non-pytest processes (CLI, bench,
# dryrun) populate the cache.
os.environ.setdefault("KVZ_TPU_CACHE_NO_PUT", "1")
os.environ.setdefault("KVZ_TPU_CACHE_BUDGET", "1000000")
from kvazzup_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# Serialize the HEAVY engine compiles across xdist workers: concurrent
# multi-GB LLVM compiles on this 4-core rig crash jaxlib's
# backend_compile_and_load probabilistically (r5: seven different heavy
# codec files crashed workers under full-suite concurrency, while every
# one of them passes when its file runs with the rig to itself).  One
# cross-process flock around big-module compiles removes the overlap;
# small jits and cache hits stay fully parallel.
import fcntl as _fcntl

from jax._src import compiler as _compiler

_BIG_MARKERS = ("encode_frame", "reconstruct_frame", "_fast", "wave",
                "shard", "b64", "_step")
_orig_bcl = _compiler.backend_compile_and_load
_COMPILE_LOCK = os.path.join(os.path.dirname(__file__), ".compile.lock")


def _locked_bcl(backend, module, executable_devices, options,
                host_callbacks):
    try:
        from jax._src.lib.mlir import ir as _ir

        name = _ir.StringAttr(
            module.operation.attributes["sym_name"]).value
    except Exception:
        name = ""
    if any(m in name for m in _BIG_MARKERS):
        with open(_COMPILE_LOCK, "w") as lk:
            _fcntl.flock(lk, _fcntl.LOCK_EX)
            return _orig_bcl(backend, module, executable_devices, options,
                             host_callbacks)
    return _orig_bcl(backend, module, executable_devices, options,
                     host_callbacks)


_compiler.backend_compile_and_load = _locked_bcl


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-resolution / multi-process tests")
