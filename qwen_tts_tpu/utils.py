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
