"""Import-first helper for standalone scripts: force the CPU backend.

The environment's sitecustomize initializes the axon (TPU tunnel) backend
at interpreter startup, so JAX_PLATFORMS=cpu alone is too late — tiny
reference-path computations would silently run over the tunnel at ~100x
the latency.  `import cpu_env` before anything else re-selects CPU
(mirrors tests/conftest.py) and enables the persistent compile cache.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

import jax.extend.backend as _jeb

_jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"

from kvazzup_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
