"""Small shared utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated CLI/benchmark
    invocations skip the multi-minute XLA compile of the decode loop
    (compiles are keyed by program shape; the cache makes them one-time
    per machine)."""
    import jax

    if path is None:
        path = os.environ.get(
            "QWEN_TTS_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "qwen_tts_tpu", "xla"),
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
