"""Training-state checkpoint / resume.

The reference has NO training resume at all — its SFT loop
(finetuning/sft_12hz.py:126-158) only exports finished model checkpoints, so
an interrupted run starts over. For long multi-host TPU runs that is not
acceptable; this module adds the TPU-native answer: the full train state
(params + optimizer state + step/epoch counters) snapshotted with **Orbax**,
the JAX-ecosystem checkpointer that writes sharded arrays directly from a
``jax.sharding``-annotated pytree (each host stores only its addressable
shards) and restores them to the same mesh layout.

Layout: ``<dir>/state.step<N>`` (Orbax pytree of {params, opt_state}) plus
``<dir>/meta.json`` ({step, epoch, state_dir, ...}).  The PAIR commits
atomically: each snapshot lands in a fresh step-suffixed directory (Orbax
itself writes to a tmp dir and renames), and only the final ``meta.json``
rename makes it current — a crash anywhere mid-save leaves ``meta.json``
pointing at the previous, untouched snapshot (new params can never pair with
an old step counter).  Superseded state dirs are pruned after the commit.
Snapshots from the old fixed ``<dir>/state`` layout still restore.

Restore needs the *structure* of the optimizer state (optax states are
NamedTuples, which JSON-ish checkpoint formats cannot reinvent) — so
``load_train_state`` takes the freshly-built ``params``/``tx`` and restores
INTO ``tx.init(params)``'s structure, which also hard-fails on any
architecture/optimizer mismatch instead of silently mixing states.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def save_train_state(
    ckpt_dir: str,
    params: Any,
    opt_state: Any,
    *,
    step: int,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Snapshot the full train state; returns the checkpoint directory."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    state_name = f"state.step{int(step)}"
    state_dir = os.path.join(ckpt_dir, state_name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(state_dir, {"params": params, "opt_state": opt_state},
                   force=True)
    meta = {"step": int(step), "epoch": int(epoch), "state_dir": state_name}
    if extra:
        meta.update(extra)
    tmp = os.path.join(ckpt_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(ckpt_dir, "meta.json"))  # the commit point
    # Prune superseded snapshots (best effort — never part of the commit).
    import shutil

    for name in os.listdir(ckpt_dir):
        if name != state_name and (name == "state"
                                   or name.startswith("state.step")):
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
    return ckpt_dir


def load_train_state(
    ckpt_dir: str,
    params_template: Any,
    tx,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore (params, opt_state, meta) from :func:`save_train_state`.

    ``params_template`` is the freshly-initialized (or freshly-loaded base)
    params pytree — shapes/dtypes/shardings are taken from it, so a restore
    onto a sharded mesh places every leaf per its ``NamedSharding``.  The
    optimizer state structure comes from ``tx.init(params_template)``."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    # meta.json names the committed snapshot; "state" is the pre-round-4
    # fixed layout.
    state_dir = os.path.join(ckpt_dir, meta.get("state_dir", "state"))
    target = {"params": params_template, "opt_state": tx.init(params_template)}
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(state_dir, abstract)
    return restored["params"], restored["opt_state"], meta
