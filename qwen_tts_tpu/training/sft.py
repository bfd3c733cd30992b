"""Supervised finetuning (SFT): Base → CustomVoice, the reference's
``finetuning/sft_12hz.py`` reworked as a pjit-shardable JAX train step.

Loss = talker cross-entropy on codebook-0 labels + 0.3 × sub-talker
cross-entropy on groups 1..G-1 (sft_12hz.py:114). The sub-talker term is the
teacher-forced micro-decode run as ONE batched full-sequence forward over all
labeled frames ([B*S, G] sequences) instead of a per-frame loop — on TPU this
turns 31 tiny matvecs per frame into large MXU matmuls.

The train step is a pure function over a {"talker", "subtalker"} param tree,
jittable under a ("dp","tp") mesh: batch axes shard over dp, the TP plan in
parallel/mesh.py shards the projections, and XLA inserts the psum for the
gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from qwen_tts_tpu.config import TalkerConfig
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.models.trunk import trunk_prefill
from qwen_tts_tpu.ops.norms import rms_norm
from qwen_tts_tpu.ops.rope import rope_cos_sin


class SFTBatch(NamedTuple):
    """One training batch. ``codec0_labels[b, t]`` is the target for the
    talker logits at position t (already shifted by the data prep);
    -100 = ignored. ``group_labels[b, t, :]`` holds the G codec ids of the
    frame whose codebook-0 token is at position t."""

    inputs_embeds: jnp.ndarray   # [B, S, D]
    pad_mask: jnp.ndarray        # [B, S] bool
    codec0_labels: jnp.ndarray   # [B, S] int32, -100 = ignore
    group_labels: jnp.ndarray    # [B, S, G] int32
    frame_mask: jnp.ndarray      # [B, S] bool — positions with codec frames


def _ce(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1
    )[..., 0]
    mask = mask.astype(jnp.float32)
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sft_loss(
    params: dict, cfg: TalkerConfig, batch: SFTBatch, remat: bool = False
) -> Tuple[jnp.ndarray, dict]:
    tp, sp = params["talker"], params["subtalker"]
    b, s, d = batch.inputs_embeds.shape
    g = cfg.num_code_groups

    # ---- talker CE ---------------------------------------------------------
    positions = jnp.maximum(jnp.cumsum(batch.pad_mask.astype(jnp.int32), -1) - 1, 0)
    cos, sin = talker_mod._mrope_cos_sin(cfg, positions)
    hidden, _, _ = trunk_prefill(
        tp["trunk"], talker_mod.talker_dims(cfg), batch.inputs_embeds, cos, sin,
        pad_mask=batch.pad_mask, remat=remat,
    )
    hidden = rms_norm(hidden, tp["norm"], cfg.rms_norm_eps)
    logits = hidden @ tp["codec_head"]
    talker_mask = (batch.codec0_labels != -100) & batch.pad_mask
    talker_ce = _ce(logits, batch.codec0_labels, talker_mask)

    # ---- sub-talker CE (teacher-forced, all frames batched) ---------------
    cp = cfg.code_predictor
    flat_hidden = hidden.reshape(b * s, d)
    flat_groups = batch.group_labels.reshape(b * s, g)

    seq = [flat_hidden[:, None, :]]                                   # pos 0
    seq.append(tp["codec_embedding"][flat_groups[:, 0]][:, None, :])  # pos 1
    if g > 2:
        ids = jnp.arange(g - 2)
        gathered = sp["embeds"][ids[:, None], flat_groups[:, 1 : g - 1].T]  # [G-2, N, D]
        seq.append(jnp.transpose(gathered, (1, 0, 2)))
    st_in = jnp.concatenate(seq, axis=1)                               # [N, G, D]
    st_in = st_mod._project_input(sp, st_in)

    st_pos = jnp.broadcast_to(jnp.arange(g)[None], (b * s, g))
    st_cos, st_sin = rope_cos_sin(st_pos, cp.head_dim, cp.rope_theta)
    st_hidden, _, _ = trunk_prefill(
        sp["trunk"], st_mod.subtalker_dims(cp), st_in, st_cos, st_sin,
        remat=remat,
    )
    st_hidden = rms_norm(st_hidden, sp["norm"], cp.rms_norm_eps)
    # Position i (1..G-1) predicts group i via lm_head[i-1]
    # (modeling_qwen3_tts.py:1235-1238).
    st_logits = jnp.einsum("nid,idv->niv", st_hidden[:, 1:], sp["lm_heads"])
    st_labels = flat_groups[:, 1:]
    st_mask = jnp.broadcast_to(
        batch.frame_mask.reshape(b * s)[:, None], st_labels.shape
    )
    st_ce = _ce(st_logits, st_labels, st_mask)

    loss = talker_ce + 0.3 * st_ce  # sft_12hz.py:114
    return loss, {"talker_ce": talker_ce, "subtalker_ce": st_ce}


def make_train_step(cfg: TalkerConfig, tx: optax.GradientTransformation,
                    remat: bool = False):
    """``remat`` checkpoints every trunk layer in the backward pass
    (models/trunk.py): peak activation memory drops from O(L × S × D ×
    per-layer intermediates) to O(L × S × D) at ~1/3 extra forward FLOPs —
    the standard memory-for-FLOPs trade for long-sequence / large-batch
    SFT. Same math; values agree within float reassociation (the
    checkpointed backward is a different fused program — measured ~5e-8
    relative on the loss; pinned by test)."""
    @jax.jit
    def train_step(params: dict, opt_state, batch: SFTBatch):
        (loss, aux), grads = jax.value_and_grad(sft_loss, has_aux=True)(
            params, cfg, batch, remat
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return train_step
