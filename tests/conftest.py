"""Test configuration.

All tests run on CPU with float64 enabled (gradient checks need f64 — the
reference's test strategy is torch gradcheck in double precision) and 8
virtual devices so multi-chip sharding is exercised without a TPU pod,
exactly as recommended for JAX multi-host code.

Note: this environment registers a TPU PJRT plugin from ``sitecustomize``
before pytest starts, so ``JAX_PLATFORMS`` env tricks don't work — the
platform must be forced through ``jax.config`` here, before any backend
is initialized by test code.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite is XLA-compile dominated (the heavy TRG/CTMRG and shard_map
# tests spend 20-30 s each tracing+compiling); persist compiled
# executables across runs so only the first run after a code change pays
# full price.  Safe under pytest-xdist: the cache is file-per-key with
# atomic writes.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
