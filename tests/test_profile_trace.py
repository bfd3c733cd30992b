"""profile_trace captures an XLA profiler trace (SURVEY §5 tracing analog
of the reference's `-v -v` timers / Metal QWEN_TTS_LAYER_TRACE)."""

import os

import jax
import jax.numpy as jnp

from qwen_tts_tpu.utils import profile_trace


def test_profile_trace_writes_xplane(tmp_path):
    d = str(tmp_path / "trace")
    with profile_trace(d):
        f = jax.jit(lambda x: jnp.sin(x) @ x)
        jax.block_until_ready(f(jnp.ones((64, 64))))
    found = [
        os.path.join(r, fn)
        for r, _dirs, fns in os.walk(d)
        for fn in fns
        if fn.endswith((".xplane.pb", ".trace.json.gz", ".json.gz"))
    ]
    assert found, f"no profiler artifacts under {d}"


def test_profile_trace_none_is_noop(tmp_path):
    with profile_trace(None):
        pass
    with profile_trace(""):
        pass
