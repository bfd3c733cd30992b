"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware (the driver's multi-chip dry-run uses the same mechanism)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
