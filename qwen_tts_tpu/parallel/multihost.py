"""Multi-host (DCN) initialization.

The reference has no distributed communication backend at inference — the
only collective code is the training-era torch.distributed EMA update in
vq/core_vq.py:334-533 (SURVEY §2.5). For multi-host serving on TPU pods the
entire analog of an NCCL/MPI bring-up is ``jax.distributed.initialize``:
after it, ``jax.devices()`` spans every host's chips, the (dp, tp) mesh in
parallel/mesh.py lays dp over DCN-connected hosts and tp over each host's
ICI, and XLA inserts the cross-host collectives.

On Cloud TPU pods ``jax.distributed.initialize()`` auto-discovers the
coordinator from the TPU metadata; elsewhere pass coordinator_address /
num_processes / process_id (or set the standard JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID env vars, which JAX reads itself).
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when this is (or may be) a
    multi-process run; no-op for plain single-process use.

    Returns True when the distributed runtime is active after the call.
    Explicit args win over env vars; with neither present — the
    single-process laptop/CI case — nothing is initialized and False is
    returned. Safe to call twice (the second call is a no-op)."""
    import jax

    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return True  # already initialized

    env = os.environ
    configured = (
        coordinator_address is not None
        or "JAX_COORDINATOR_ADDRESS" in env
        # Standard Cloud TPU pod env — initialize() auto-discovers peers.
        or "TPU_WORKER_HOSTNAMES" in env
        or "MEGASCALE_COORDINATOR_ADDRESS" in env
    )
    if not configured:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> dict:
    """Host/process topology summary (serving /healthz, logs)."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
