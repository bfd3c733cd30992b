"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware (the driver's multi-chip dry-run uses the same mechanism)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Dedicated compile-cache dir for the CPU test suite: JAX's default
# persistent cache is shared machine-wide, and concurrent processes (e.g. a
# TPU bench running beside the suite) racing the same cache files segfault
# inside the cache deserializer (observed twice in round 3: crashes in
# compilation_cache.get_executable_and_time / _compile_and_write_cache).
# The suite runs single-process, so a suite-only dir is race-free while
# still caching across runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "qwen_tts_tpu",
                 "xla_cpu_tests"),
)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
