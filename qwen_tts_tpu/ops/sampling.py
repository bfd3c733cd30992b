"""Logits processing and sampling.

Pure functions over logits, mirroring the generation controls the reference
applies (HF processors in modeling_qwen3_tts.py:2044-2066 and the C kernels in
c/qwen_tts_kernels.c:395-558):

* suppress-token masking (vocab tail except EOS)
* min-new-tokens EOS ban
* repetition penalty over the generated-token history (applied once per
  distinct token, HF semantics; tracked as a vocab presence mask so the jitted
  decode step needs no dynamic-length history)
* temperature / top-k / top-p warpers, counter-based PRNG (jax.random).

Sampled traces are not bit-equal to the C engine's xorshift sampler; the
parity contract is greedy decoding (SURVEY.md §4), where these reduce to an
argmax over identically-processed logits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    do_sample: bool = True
    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 1.0
    repetition_penalty: float = 1.05
    min_new_tokens: int = 0

    def greedy(self) -> "SamplingConfig":
        return dataclasses.replace(self, do_sample=False)


def apply_suppress_mask(logits: jnp.ndarray, suppress: jnp.ndarray) -> jnp.ndarray:
    """suppress: [V] bool, True = banned (set to -inf)."""
    return jnp.where(suppress, NEG_INF, logits)


def apply_repetition_penalty(
    logits: jnp.ndarray,      # [B, V] float32
    presence: jnp.ndarray,    # [B, V] bool — token seen in generated history
    penalty: float,
) -> jnp.ndarray:
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def _top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens while the cumulative mass *before* them is < top_p
    # (HF TopPLogitsWarper semantics; always keeps at least the top token).
    keep_sorted = (cum - probs) < top_p
    kept = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, kept - 1, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def sample_token(
    logits: jnp.ndarray,  # [B, V] float32, already suppress/penalty-processed
    cfg: SamplingConfig,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """Returns [B] int32 token ids."""
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = logits / jnp.float32(max(cfg.temperature, 1e-5))
    warped = _top_k_filter(warped, cfg.top_k)
    warped = _top_p_filter(warped, cfg.top_p)
    return jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)


def build_suppress_mask(vocab_size: int, eos_id: int, tail: int = 1024) -> jnp.ndarray:
    """The reference bans the last ``tail`` vocab entries except EOS
    (modeling_qwen3_tts.py:2059-2063, c/qwen_tts.c:1272-1278)."""
    ids = jnp.arange(vocab_size)
    return (ids >= vocab_size - tail) & (ids != eos_id)
