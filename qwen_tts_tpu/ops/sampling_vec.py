"""Vectorized (per-row) sampling controls for continuous batching.

The static `SamplingConfig` path (ops/sampling.py) pins one set of generation
controls per compiled program — fine for one-shot batches (the reference's
batched generate shares kwargs the same way), but a continuous-batching slot
pool serves requests with *different* controls concurrently. Here every knob
is a [B] array riding the decode state, so one compiled program serves
heterogeneous requests:

  temperature / top_k / top_p / repetition_penalty / min_new_tokens /
  do_sample — all per row.

Per-row top-k uses a full descending sort and a per-row k-th threshold
(gather), which costs one [B, V] sort per step — V is 2-3k here, negligible
next to the transformer step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)


class VecSampling(NamedTuple):
    """Per-row sampling controls (all [B])."""

    do_sample: jnp.ndarray          # bool
    temperature: jnp.ndarray        # f32
    top_k: jnp.ndarray              # int32 (0 = disabled)
    top_p: jnp.ndarray              # f32 (>= 1 = disabled)
    repetition_penalty: jnp.ndarray # f32
    min_new_tokens: jnp.ndarray     # int32

    @classmethod
    def broadcast(cls, cfg, b: int) -> "VecSampling":
        """Lift a static SamplingConfig to per-row arrays."""
        return cls(
            do_sample=jnp.full((b,), bool(cfg.do_sample)),
            temperature=jnp.full((b,), float(cfg.temperature), jnp.float32),
            top_k=jnp.full((b,), int(cfg.top_k), jnp.int32),
            top_p=jnp.full((b,), float(cfg.top_p), jnp.float32),
            repetition_penalty=jnp.full(
                (b,), float(cfg.repetition_penalty), jnp.float32
            ),
            min_new_tokens=jnp.full((b,), int(cfg.min_new_tokens), jnp.int32),
        )

    def set_row(self, row, cfg) -> "VecSampling":
        return VecSampling(
            do_sample=self.do_sample.at[row].set(bool(cfg.do_sample)),
            temperature=self.temperature.at[row].set(float(cfg.temperature)),
            top_k=self.top_k.at[row].set(int(cfg.top_k)),
            top_p=self.top_p.at[row].set(float(cfg.top_p)),
            repetition_penalty=self.repetition_penalty.at[row].set(
                float(cfg.repetition_penalty)
            ),
            min_new_tokens=self.min_new_tokens.at[row].set(
                int(cfg.min_new_tokens)
            ),
        )

    @classmethod
    def host_row(cls, cfg) -> "VecSampling":
        """Batch-1 VecSampling of HOST (numpy) arrays — builds with zero
        device dispatches, for callers that splice it into a pool inside an
        already-jitted program (continuous admission: eager .at[].set chains
        cost one ~25 ms device round trip EACH over the axon tunnel)."""
        import numpy as np

        return cls(
            do_sample=np.full((1,), bool(cfg.do_sample)),
            temperature=np.full((1,), float(cfg.temperature), np.float32),
            top_k=np.full((1,), int(cfg.top_k), np.int32),
            top_p=np.full((1,), float(cfg.top_p), np.float32),
            repetition_penalty=np.full(
                (1,), float(cfg.repetition_penalty), np.float32
            ),
            min_new_tokens=np.full((1,), int(cfg.min_new_tokens), np.int32),
        )


def apply_repetition_penalty_vec(
    logits: jnp.ndarray, presence: jnp.ndarray, penalty: jnp.ndarray
) -> jnp.ndarray:
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(presence, penalized, logits)


def sample_token_vec(
    logits: jnp.ndarray,  # [B, V] f32, suppress/penalty already applied
    vs: VecSampling,
    rng: jax.Array,
) -> jnp.ndarray:
    b, v = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(vs.temperature, 1e-5)[:, None]
    warped = logits / temp

    order = jnp.argsort(warped, axis=-1)[:, ::-1]
    sorted_logits = jnp.take_along_axis(warped, order, axis=-1)

    # Per-row top-k threshold.
    k = jnp.where((vs.top_k > 0) & (vs.top_k < v), vs.top_k, v)
    kth = jnp.take_along_axis(
        sorted_logits, (k - 1)[:, None], axis=-1
    )
    warped = jnp.where(warped < kth, NEG_INF, warped)

    # Per-row top-p AFTER the top-k mask — the HF-warper chain the static
    # path (ops/sampling.py sample_token) implements: the top-p softmax runs
    # over the top-k-filtered distribution, so one-shot and continuous
    # serving sample identically when both knobs are set.
    sorted_k = jnp.where(
        jnp.arange(v)[None, :] < k[:, None], sorted_logits, NEG_INF
    )
    probs = jax.nn.softmax(sorted_k, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < vs.top_p[:, None]
    kept = jnp.maximum(jnp.sum(keep_sorted, axis=-1, keepdims=True), 1)
    cutoff = jnp.take_along_axis(sorted_k, kept - 1, axis=-1)
    apply_p = (vs.top_p < 1.0)[:, None]
    warped = jnp.where(apply_p & (warped < cutoff), NEG_INF, warped)

    sampled = jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)
    return jnp.where(vs.do_sample, sampled, greedy)
