"""Attention primitives: batched prefill and single-token cached decode.

TPU-first design notes:

* GQA is expressed as einsums over a [B, S, KV, G, hd] query layout so XLA
  lowers directly to MXU matmuls — no `repeat_kv` materialization (the
  reference materializes repeated K/V, modeling_qwen3_tts.py:622-631; on TPU
  that would waste HBM bandwidth).
* The decode step attends over a **preallocated fixed-shape KV cache** with a
  position mask instead of a growing cache (the reference C engine reallocs
  +2048, c/qwen_tts_talker.c:489-496 — dynamic shapes would force XLA
  recompiles, so we mask instead).
* Scores and softmax are computed in float32; values can stay bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)

# A KV cache is either a raw array [..., S, KV, hd] or an int8-quantized dict
# {"i8": int8[..., S, KV, hd], "s": f32[..., S, KV]} with per-token per-head
# symmetric scales. The dict form halves cache HBM bytes (capacity AND decode
# bandwidth); dequant algebra folds into the attention dots so int8 bytes are
# all that streams (see ``attention_decode_step``). Serving-mode numerics —
# the TPU analog of breaking the reference C engine's unbounded bf16 cache
# growth (c/qwen_tts_talker.c:489-496) at the memory wall.
KVCache = Union[jnp.ndarray, dict]


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vector symmetric int8 quantization over the last (head_dim) axis.

    x: [..., hd] → (int8 [..., hd], scale f32 [...]). int8 values are exactly
    representable in bf16, so the dequant-in-dot path loses nothing beyond
    the quantization itself.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def attention_prefill(
    q: jnp.ndarray,  # [B, S, H, hd] (post-RoPE, post-QK-norm)
    k: jnp.ndarray,  # [B, S, KV, hd]
    v: jnp.ndarray,  # [B, S, KV, hd]
    *,
    pad_mask: Optional[jnp.ndarray] = None,  # [B, S] True = real token
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal self-attention over a full (left-padded) sequence.

    Returns [B, S, H, hd]. With ``sliding_window`` w, position i attends to
    j in (i-w, i] (HF sliding-window convention used by the codec
    pre-transformer, modeling_qwen3_tts_tokenizer_v2.py:309-348).
    """
    b, s, h, hd = q.shape
    kv = k.shape[2]
    groups = h // kv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(b, s, kv, groups, hd)
    # scores: [B, KV, G, S, S]
    scores = jnp.einsum(
        "bikgd,bjkd->bkgij", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    i_idx = jnp.arange(s)[:, None]
    j_idx = jnp.arange(s)[None, :]
    allowed = j_idx <= i_idx
    if sliding_window is not None:
        allowed &= j_idx > (i_idx - sliding_window)
    mask = allowed[None, None, None, :, :]
    if pad_mask is not None:
        mask = mask & pad_mask[:, None, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)

    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bkgij,bjkd->bikgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, s, h, hd).astype(q.dtype)


def attention_decode_step(
    q: jnp.ndarray,        # [B, H, hd] single new token (post-RoPE)
    k_cache: KVCache,      # [B, S_max, KV, hd] (already contains the new k)
    v_cache: KVCache,      # [B, S_max, KV, hd]
    *,
    cur_len: jnp.ndarray,  # int32 scalar or [B]: row b's valid region is [0, cur_len_b)
    valid_from: Optional[jnp.ndarray] = None,  # [B] first real position (left pad)
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-token GQA attention against a fixed-shape cache. Returns [B, H, hd].

    This is the TPU analogue of the Metal fused decode-attention kernel
    (metal/qwen_tts_metal_kernels.metal:596-672): one pass over the cache,
    masked by position rather than sliced, so the jitted shape never changes.
    Per-row ``cur_len`` supports continuous batching (slots at different
    sequence positions share one program).

    With int8 dict caches the per-token scales fold into the dots exactly:
    ``q·k = (q·k_i8)·k_s`` and ``Σ_j p_j v_j = Σ_j (p_j v_s_j) v_i8_j`` — no
    dequantized cache copy ever materializes in HBM.
    """
    kv_int8 = isinstance(k_cache, dict)
    k_raw = k_cache["i8"] if kv_int8 else k_cache
    b, h, hd = q.shape
    s_max = k_raw.shape[1]
    kv = k_raw.shape[2]
    groups = h // kv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(b, kv, groups, hd)
    scores = jnp.einsum(
        "bkgd,bjkd->bkgj", qg, k_raw.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    if kv_int8:
        # k_s: [B, S, KV] → [B, KV, 1, S] (broadcast over query groups).
        k_s = jnp.transpose(k_cache["s"], (0, 2, 1))[:, :, None, :]
        scores = scores * k_s

    cur_len_b = jnp.broadcast_to(jnp.asarray(cur_len), (b,))
    j_idx = jnp.arange(s_max)
    mask = j_idx[None, :] < cur_len_b[:, None]
    if valid_from is not None:
        mask = mask & (j_idx[None, :] >= valid_from[:, None])
    if sliding_window is not None:
        mask = mask & (j_idx[None, :] > cur_len_b[:, None] - 1 - sliding_window)
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)

    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    if kv_int8:
        v_s = jnp.transpose(v_cache["s"], (0, 2, 1))[:, :, None, :]
        out = jnp.einsum(
            "bkgj,bjkd->bkgd", (probs * v_s).astype(q.dtype),
            v_cache["i8"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum(
            "bkgj,bjkd->bkgd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(b, h, hd).astype(q.dtype)


def update_kv_cache(
    k_cache: jnp.ndarray,  # [B, S_max, KV, hd]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,    # [B, T, KV, hd]
    v_new: jnp.ndarray,
    start: jnp.ndarray,    # scalar int32 write offset
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write new K/V at [start, start+T) via in-place dynamic update (XLA
    donates the buffers under jit, so this is a true in-place HBM write)."""
    import jax

    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new.astype(k_cache.dtype), start, axis=1
    )
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new.astype(v_cache.dtype), start, axis=1
    )
    return k_cache, v_cache
