"""Device mesh + parameter shardings.

The reference declares (but never exercises) HF tensor-parallel and
pipeline-parallel plans (configuration_qwen3_tts.py:171-185, 353-367). Here
the same plan is realized the TPU way: a ``jax.sharding.Mesh`` over
("dp", "tp") axes with ``NamedSharding`` annotations — XLA inserts the
collectives over ICI (SURVEY.md §2.5).

Mapping of the reference TP plan onto the stacked [L, in, out] layouts:

* colwise (q/k/v/gate/up) → shard the **out** dim on "tp"
* rowwise (o/down)        → shard the **in** dim on "tp"
* norms / embeddings / heads → replicated (embeddings are gather-bound, the
  codec head is the "colwise_rep" plan entry)
* batch axes of activations and KV caches → "dp"

KV caches also shard their KV-head axis on "tp" when it divides evenly, so
decode attention stays local to each TP shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_tts_tpu.config import TalkerConfig


def make_mesh(
    n_devices: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def trunk_shardings(mesh: Mesh) -> dict:
    """Shardings for a stacked trunk pytree ([L, ...] leading axis)."""
    col = _ns(mesh, None, None, "tp")   # [L, in, out] shard out
    row = _ns(mesh, None, "tp", None)   # [L, in, out] shard in
    rep2 = _ns(mesh, None, None)
    out = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "gate": col, "up": col, "down": row,
        "input_norm": rep2, "post_attn_norm": rep2,
    }
    return out


def talker_shardings(mesh: Mesh, params: dict) -> dict:
    rep = lambda x: _ns(mesh, *([None] * x.ndim))  # noqa: E731
    sh = jax.tree_util.tree_map(rep, params)
    trunk = trunk_shardings(mesh)
    for k, v in trunk.items():
        if k in sh["trunk"]:
            sh["trunk"][k] = v
    # q/k norms are per-head-dim vectors — replicated.
    return sh


def subtalker_shardings(mesh: Mesh, params: dict) -> dict:
    rep = lambda x: _ns(mesh, *([None] * x.ndim))  # noqa: E731
    sh = jax.tree_util.tree_map(rep, params)
    trunk = trunk_shardings(mesh)
    for k, v in trunk.items():
        if k in sh["trunk"]:
            sh["trunk"][k] = v
    # Stacked LM heads [G-1, D, V]: colwise on the vocab dim.
    sh["lm_heads"] = _ns(mesh, None, None, "tp")
    return sh


def shard_params(mesh: Mesh, talker_params: dict, st_params: dict):
    t_sh = talker_shardings(mesh, talker_params)
    s_sh = subtalker_shardings(mesh, st_params)
    talker = jax.device_put(talker_params, t_sh)
    st = jax.device_put(st_params, s_sh)
    return talker, st


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch axis over dp."""
    return _ns(mesh, "dp", *([None] * (ndim - 1)))


def kv_cache_sharding(mesh: Mesh, cfg: TalkerConfig) -> NamedSharding:
    """[L, B, S, KV, hd]: batch over dp; KV heads over tp when divisible."""
    tp = mesh.shape["tp"]
    if tp > 1 and cfg.num_key_value_heads % tp == 0:
        return _ns(mesh, None, "dp", None, "tp", None)
    return _ns(mesh, None, "dp", None, None, None)
