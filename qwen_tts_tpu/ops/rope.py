"""Rotary position embeddings (1D RoPE and 3-section M-RoPE).

Semantics match the reference (modeling_qwen3_tts.py:526-559, 660-724):
``freqs = pos * inv_freq``, ``emb = concat(freqs, freqs)``, rotate-half
convention. M-RoPE merges three position streams (temporal/height/width) by
interleaving channel sections; for text-only TTS all streams carry identical
positions so the merge reduces to 1D RoPE — we implement the full merge and
test the reduction (SURVEY.md §7 risk list).

Everything here is computed in float32 (the reference forces f32 for the
trig) and cast to the activation dtype at application time.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """[head_dim // 2] inverse frequencies."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    positions: any shape [...]; returns cos/sin of shape [..., head_dim]
    laid out as concat(freqs, freqs) per the reference rotate-half convention.
    """
    inv_freq = rope_inv_freq(head_dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding. x: [..., head_dim]; cos/sin broadcastable to x."""
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    out = x32 * cos + _rotate_half(x32) * sin
    return out.astype(x.dtype)


def merge_mrope_sections(
    cos3: jnp.ndarray, sin3: jnp.ndarray, sections: Sequence[int],
    interleaved: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge 3-stream cos/sin into a single table by channel sections.

    cos3/sin3: [3, ..., head_dim]; sections sum to head_dim // 2.

    Non-interleaved (default): chunk i of the doubled section list takes
    stream i % 3 (modeling_qwen3_tts.py:713-720).

    Interleaved: within the half-dim, channel c belongs to stream c % 3 up to
    per-stream extents n_s * 3 (modeling_qwen3_tts.py:692-712) — stream 0 is
    the base, streams 1/2 overwrite their strided slices
    ``[s : sections[s]*3 : 3]``.
    """
    if interleaved:
        half = cos3.shape[-1] // 2
        modality_num = len(sections)

        def merge(t: jnp.ndarray) -> jnp.ndarray:
            th = t[..., :half]
            out = th[0]
            idx = jnp.arange(half)
            for s in range(1, modality_num):
                sel = (idx % modality_num == s % modality_num) & (
                    idx >= s) & (idx < sections[s] * modality_num)
                out = jnp.where(sel, th[s], out)
            return jnp.concatenate([out, out], axis=-1)

        return merge(cos3), merge(sin3)

    doubled = list(sections) + list(sections)

    def merge(t: jnp.ndarray) -> jnp.ndarray:
        pieces = []
        offset = 0
        for i, size in enumerate(doubled):
            pieces.append(t[i % 3, ..., offset : offset + size])
            offset += size
        return jnp.concatenate(pieces, axis=-1)

    return merge(cos3), merge(sin3)
