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


# Modules whose tests compile from ENGINE/SERVER worker threads. The
# round-3 segfault in the persistent-cache deserializer was an IN-process
# multi-thread race (compilation_cache.get_executable_and_time /
# _compile_and_write_cache racing between an engine thread and the main
# thread); for these modules the cache stays disabled. Everything else
# compiles only from the main thread, where the disk cache is safe — and
# it turns the per-module recompiles forced by the clear_caches teardown
# below (plus whole-suite reruns) into cheap deserializations.
_THREADED_COMPILE_MODULES = {
    "test_continuous", "test_continuous_cancel", "test_continuous_soak",
    "test_continuous_streaming", "test_continuous_inflight",
    "test_serving", "test_server_clone", "test_server_stream",
    "test_multi_bucket", "test_kv_int8", "test_cli_clone",
}


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module(request):
    """Per-module compile-cache hygiene, two halves:

    1. Enable the persistent compilation cache for single-threaded modules
       (see _THREADED_COMPILE_MODULES above for why not all).
    2. Release jit caches at each module's teardown: the full suite
       accumulates hundreds of live CPU executables (every module's jitted
       decode loops, engines, oracles); past ~140 tests the NEXT big
       compile segfaults inside jaxlib's backend_compile_and_load —
       deterministically, independent of which test is there, of
       TensorFlow presence, and of codegen parallelism (the crash point
       only creeps when those change). Dropping the caches per module
       keeps the live-executable set bounded."""
    import os as _os

    mod = request.module.__name__.rsplit(".", 1)[-1]
    enabled = mod not in _THREADED_COMPILE_MODULES
    if enabled:
        from qwen_tts_tpu.utils import _host_cache_key

        path = _os.path.join(_os.path.expanduser("~"), ".cache",
                             "qwen_tts_tpu", f"xla-suite-{_host_cache_key()}")
        _os.makedirs(path, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_enable_compilation_cache", True)
        except Exception:
            enabled = False
    yield
    if enabled:
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:
            pass
    jax.clear_caches()
