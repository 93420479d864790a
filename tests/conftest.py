"""Test configuration: force a virtual 8-device CPU mesh with x64 available.

Tests run on CPU so they work everywhere (the real chip is reserved for
bench.py); sharding tests use the 8 virtual devices.

NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var is not enough — jax.config.update('jax_platforms', ...) is authoritative.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
