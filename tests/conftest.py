"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host testing strategy from SURVEY.md §4: sharding code paths
are exercised with ``xla_force_host_platform_device_count`` instead of real
chips.

Note: this environment preloads jax and registers a TPU plugin via
sitecustomize, and sets JAX_PLATFORMS in the ambient environment — so we must
override through jax.config (which wins as long as no backend has been
initialized yet) rather than via os.environ.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
