"""Normalization ops.

TPU notes: both norms compute statistics in float32 regardless of the input
dtype (the reference does the same — modeling_qwen3_tts.py:605-610) and cast
back before applying the learned scale, so bf16 activations stay numerically
faithful. These are plain jnp expressions: XLA fuses them into the surrounding
matmuls, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5-style RMSNorm over the last axis.

    Matches Qwen3TTSRMSNorm (modeling_qwen3_tts.py:595-610): normalize in f32,
    cast back to the input dtype, then multiply by the weight.
    """
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = (x32 * lax.rsqrt(var + eps)).astype(x.dtype)
    return weight.astype(x.dtype) * normed


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """LayerNorm over the last axis (ConvNeXt block norm,
    modeling_qwen3_tts_tokenizer_v2.py:221)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
