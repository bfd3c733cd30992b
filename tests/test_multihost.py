"""Multi-host init wrapper: single-process no-op, explicit 1-process
bring-up of the real jax.distributed runtime, idempotence."""

import jax
import pytest

from qwen_tts_tpu.parallel.multihost import init_multihost


def test_single_process_is_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        pytest.skip("distributed runtime already active in this process")
    assert init_multihost() is False


def test_explicit_single_process_bringup_and_idempotence():
    """num_processes=1 exercises the real coordinator + client wiring.

    Runs in a fresh subprocess: jax.distributed.initialize must precede any
    backend creation, and this pytest process has long since created one."""
    import subprocess
    import sys

    script = """
import jax
jax.config.update("jax_platforms", "cpu")
from qwen_tts_tpu.parallel.multihost import init_multihost, process_info
assert init_multihost(
    coordinator_address="localhost:51963", num_processes=1, process_id=0,
) is True
info = process_info()
assert info["process_index"] == 0
assert info["process_count"] == 1
assert info["global_devices"] == info["local_devices"] > 0
assert init_multihost() is True  # already-initialized fast path
import numpy as np
assert float(jax.jit(lambda v: v.sum())(np.arange(8.0))) == 28.0
print("MULTIHOST-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST-OK" in out.stdout
