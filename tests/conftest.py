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
from kvazzup_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-resolution / multi-process tests")
