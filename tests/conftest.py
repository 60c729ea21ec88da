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
