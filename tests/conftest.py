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
