"""Test configuration: force CPU backend with a virtual 8-device mesh.

Real-TPU benchmarking happens in bench.py; tests validate correctness and
multi-device sharding semantics on the host (SURVEY.md §4: the reference
lacks a loopback transport for CI — we build one in from the start).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
