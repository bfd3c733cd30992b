"""Talker: the autoregressive codec-token LM (stage 1).

Functional forward passes over a parameter pytree; semantics match
Qwen3TTSTalkerForConditionalGeneration (modeling_qwen3_tts.py:1564-1744):

* separate codec/text embedding tables; text embeddings pass through a
  2-layer SiLU "ResizeMLP" text projection (modeling_qwen3_tts.py:808-816)
* GQA trunk with per-head QK-RMSNorm and 3-section M-RoPE
  (all three position streams are identical for text-only TTS;
  modeling_qwen3_tts.py:660-724)
* final RMSNorm + codec head; the post-norm last hidden state feeds the
  sub-talker at the next step (modeling_qwen3_tts.py:1740).

Prefill is one jitted full-sequence forward writing a preallocated KV cache;
decode is a single-token step designed to live inside ``lax.while_loop``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import TalkerConfig
from qwen_tts_tpu.models.trunk import (
    TrunkDims,
    init_trunk_params,
    trunk_decode_step,
    trunk_prefill,
)
from qwen_tts_tpu.ops.norms import rms_norm
from qwen_tts_tpu.ops.rope import merge_mrope_sections, rope_cos_sin


def talker_dims(cfg: TalkerConfig) -> TrunkDims:
    return TrunkDims(
        num_layers=cfg.num_hidden_layers,
        hidden=cfg.hidden_size,
        heads=cfg.num_attention_heads,
        kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        intermediate=cfg.intermediate_size,
        eps=cfg.rms_norm_eps,
        qk_norm=True,
    )


def init_talker_params(rng: jax.Array, cfg: TalkerConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 8)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    d, td = cfg.hidden_size, cfg.text_hidden_size
    return {
        "codec_embedding": w(keys[0], (cfg.vocab_size, d), d),
        "text_embedding": w(keys[1], (cfg.text_vocab_size, td), td),
        "text_proj_fc1": w(keys[2], (td, td), td),
        "text_proj_fc1_b": jnp.zeros((td,), dtype),
        "text_proj_fc2": w(keys[3], (td, d), td),
        "text_proj_fc2_b": jnp.zeros((d,), dtype),
        "trunk": init_trunk_params(keys[4], talker_dims(cfg), dtype),
        "norm": jnp.ones((d,), dtype),
        "codec_head": w(keys[5], (d, cfg.vocab_size), d),
    }


def text_project(params: dict, text_hidden: jnp.ndarray) -> jnp.ndarray:
    """ResizeMLP: fc2(silu(fc1(x))) with biases (modeling_qwen3_tts.py:808-816)."""
    h = jax.nn.silu(text_hidden @ params["text_proj_fc1"] + params["text_proj_fc1_b"])
    return h @ params["text_proj_fc2"] + params["text_proj_fc2_b"]


def embed_text(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    """text_projection(text_embedding(ids)) — the text-track embedding."""
    return text_project(params, params["text_embedding"][token_ids])


def embed_codec(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    return params["codec_embedding"][token_ids]


def _mrope_cos_sin(cfg: TalkerConfig, positions: jnp.ndarray):
    """positions: [...]; returns merged cos/sin [..., head_dim].

    Text-only TTS carries identical temporal/height/width streams, so we build
    the 3-stream table from the same positions and run the full section merge
    (exercises the same code path a multimodal variant would use).
    """
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos3 = jnp.broadcast_to(cos[None], (3,) + cos.shape)
    sin3 = jnp.broadcast_to(sin[None], (3,) + sin.shape)
    return merge_mrope_sections(cos3, sin3, cfg.mrope_section,
                                interleaved=cfg.mrope_interleaved)


class TalkerPrefillOut(NamedTuple):
    logits: jnp.ndarray        # [B, V] at the last position
    last_hidden: jnp.ndarray   # [B, D] post-final-norm
    k_cache: jnp.ndarray       # [L, B, S_max, KV, hd]
    v_cache: jnp.ndarray


def talker_prefill(
    params: dict,
    cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D], left-padded
    pad_mask: jnp.ndarray,       # [B, S] True = real token
    k_cache: jnp.ndarray,        # [L, B, S_max, KV, hd] preallocated
    v_cache: jnp.ndarray,
) -> TalkerPrefillOut:
    b, s, _ = inputs_embeds.shape
    # Reference rope positions: cumsum(mask) - 1 (masked slots get a dummy
    # value; they are excluded by the pad mask) — modeling_qwen3_tts.py:1794-1795.
    positions = jnp.cumsum(pad_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    cos, sin = _mrope_cos_sin(cfg, positions)

    hidden, ks, vs = trunk_prefill(
        params["trunk"], talker_dims(cfg), inputs_embeds, cos, sin,
        pad_mask=pad_mask, layer_windows=cfg.layer_windows(),
    )
    hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    last_hidden = hidden[:, -1, :]
    logits = (last_hidden @ params["codec_head"]).astype(jnp.float32)

    k_cache = _prefill_cache_write(k_cache, ks)
    v_cache = _prefill_cache_write(v_cache, vs)
    return TalkerPrefillOut(logits, last_hidden, k_cache, v_cache)


def _prefill_cache_write(cache, new):  # new: [L, B, S, KV, hd]
    """Write the prefill's K or V block at position 0 (int8-dict aware)."""
    if isinstance(cache, dict):
        from qwen_tts_tpu.ops.attention import quantize_kv

        q8, s = quantize_kv(new)
        return {
            "i8": jax.lax.dynamic_update_slice(
                cache["i8"], q8, (0, 0, 0, 0, 0)
            ),
            "s": jax.lax.dynamic_update_slice(
                cache["s"], s.astype(cache["s"].dtype), (0, 0, 0, 0)
            ),
        }
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (0, 0, 0, 0, 0)
    )


def talker_decode_step(
    params: dict,
    cfg: TalkerConfig,
    input_embed: jnp.ndarray,  # [B, D]
    rope_pos: jnp.ndarray,     # [B] rotary position of this token
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cur_len: jnp.ndarray,      # scalar int32, includes this token
    valid_from: jnp.ndarray,   # [B] first valid cache index (left-pad count)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (logits [B,V] f32, last_hidden [B,D] post-norm, k_cache, v_cache)."""
    cos, sin = _mrope_cos_sin(cfg, rope_pos)
    hidden, k_cache, v_cache = trunk_decode_step(
        params["trunk"], talker_dims(cfg), input_embed, cos, sin,
        k_cache, v_cache, cur_len, valid_from=valid_from,
        layer_windows=cfg.layer_windows(),
    )
    hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    logits = (hidden @ params["codec_head"]).astype(jnp.float32)
    return logits, hidden, k_cache, v_cache


def alloc_kv_cache(
    cfg: TalkerConfig, batch: int, max_len: int, dtype=jnp.float32,
    *, kv_int8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Preallocate the fixed-shape talker KV cache.

    ``kv_int8`` switches to the quantized dict form (ops/attention.KVCache):
    int8 payload + f32 per-token per-head scales ≈ 0.52× the bf16 bytes —
    the cache is the serving-batch HBM ceiling (b96 OOMs bf16 at flagship
    dims), so this is the capacity *and* bandwidth lever.
    """
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    if kv_int8:
        def one():
            return {
                "i8": jnp.zeros(shape, jnp.int8),
                "s": jnp.full(shape[:-1], 1e-8, jnp.float32),
            }
        return one(), one()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
