"""Small shared utilities."""

from __future__ import annotations

import hashlib
import os
import platform


def _host_cache_key() -> str:
    """A short key identifying the host CPU microarchitecture.

    XLA's persistent-cache key does NOT include the host's CPU features for
    CPU AOT results; an executable compiled on one machine can be loaded on
    another and abort/SIGILL ("Machine type used for XLA:CPU compilation
    doesn't match the machine type for execution", cpu_aot_loader.cc).
    Observed in round 3 when the build host changed shape mid-round: the
    8-device CPU dryrun loaded avx512/amx executables from the previous host
    and died with SIGABRT. Scoping the cache dir by a hash of the CPU flag
    set makes a machine change land in a fresh, empty cache instead.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        flags = platform.processor()
    h = hashlib.sha256(f"{platform.machine()}|{flags}".encode()).hexdigest()[:12]
    return h


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated CLI/benchmark
    invocations skip the multi-minute XLA compile of the decode loop
    (compiles are keyed by program shape; the cache makes them one-time
    per machine). The cache dir is scoped by a host-CPU key (see
    ``_host_cache_key``). Respects ``JAX_ENABLE_COMPILATION_CACHE=false``
    (the test suite sets it; a stray in-process enable must not override)."""
    import jax

    if os.environ.get("JAX_ENABLE_COMPILATION_CACHE", "").lower() in (
        "false",
        "0",
    ):
        return
    if path is None:
        path = os.environ.get("QWEN_TTS_COMPILE_CACHE")
    if path is None:
        path = os.path.join(
            os.path.expanduser("~"),
            ".cache",
            "qwen_tts_tpu",
            f"xla-{_host_cache_key()}",
        )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless


def profile_trace(trace_dir: str | None):
    """Context manager: capture a JAX/XLA profiler trace into ``trace_dir``
    (TensorBoard / XProf format; works on TPU and CPU). The TPU-native
    analog of the reference's per-phase `-v -v` timers and Metal
    `QWEN_TTS_LAYER_TRACE=1` per-layer tracing (SURVEY §5): instead of
    host-side timers around kernels, the XLA runtime records every
    compiled-program and op-level span on-device. No-op when ``trace_dir``
    is falsy."""
    import contextlib

    if not trace_dir:
        return contextlib.nullcontext()
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    return jax.profiler.trace(trace_dir)
