"""Test harness: force an 8-device virtual CPU mesh so distributed code paths
(shard_map/psum) run in CI on one host — SURVEY.md §4 'distributed tests
without a cluster'.

Note: this environment registers a TPU PJRT plugin via sitecustomize *before*
conftest runs and pins JAX_PLATFORMS=axon, so plain env-var defaults are not
enough — we must both inject the XLA host-device flag before the first
backend init and override the platform through jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
