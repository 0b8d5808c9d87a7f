"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4).

Note: this container's sitecustomize registers the axon TPU plugin and
monkeypatches jax's backend resolution before pytest starts, so setting
``JAX_PLATFORMS`` via the environment here is too late — use
``jax.config.update``, which also skips the plugin's multi-minute TPU-claim
handshake for CPU-only test runs.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
