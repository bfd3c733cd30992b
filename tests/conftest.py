"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware (the driver's multi-chip dry-run uses the same mechanism)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep transformers from importing TensorFlow (installed in this image):
# libtensorflow_cc bundles its own XLA/LLVM/absl, and once it is loaded into
# a jax process, later jaxlib CPU compiles eventually SEGFAULT inside
# backend_compile_and_load (deterministic at ~test #145 of the full suite,
# moving with the compile mix; core dump shows libtensorflow_cc.so.2 mapped
# via transformers' Mimi/feature-extractor paths). USE_TF=0 makes
# transformers report TF unavailable, so it is never imported.
os.environ.setdefault("USE_TF", "0")
# Disable JAX's persistent compilation cache for the suite: the serving
# tests compile from engine worker threads concurrently with the main
# thread, and that combination segfaults inside the cache deserializer
# (observed 3× in round 3 — compilation_cache.get_executable_and_time /
# _compile_and_write_cache; an isolated per-suite cache dir did NOT fix it,
# so it is an in-process race, not cross-process). CPU test programs are
# small; correctness beats the cache's seconds.
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# On a 1-CPU host the 8 per-device executor threads time-share one core and
# XLA's CPU collective rendezvous aborts the process after 40 s if any
# participant is late (this killed the round-3 multichip dryrun). Raise the
# fuse for the TP/DP tests.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
os.environ["XLA_FLAGS"] = _flags

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module():
    """Release jit caches at each test module's teardown.

    The full 219-test suite accumulates hundreds of live CPU executables
    (every module's jitted decode loops, engines, oracles); past ~140 tests
    the NEXT big compile segfaults inside jaxlib's
    backend_compile_and_load — deterministically, independent of which test
    is there, of TensorFlow presence, and of codegen parallelism (the crash
    point only creeps when those change). Dropping the caches per module
    keeps the live-executable set bounded; module-scoped fixtures recompile
    lazily if a later module reuses them (rare — fixtures are per-module)."""
    yield
    jax.clear_caches()
