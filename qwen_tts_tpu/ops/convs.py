"""Causal 1-D convolutions for the codec decoder.

Layout is **channels-last** ([B, T, C]) throughout: the channel axis lands on
the TPU lane dimension so XLA tiles the conv contractions onto the MXU, and
elementwise ops (SnakeBeta, GELU) fuse along it. The reference C engine uses
channels-first with hand-rolled per-tap GEMMs (c/qwen_tts_kernels.c:678-946);
on TPU the compiler does that scheduling.

Padding semantics match the reference exactly (waveform parity depends on it,
SURVEY.md §7):

* ``causal_conv1d``: left-pad ``k_eff - stride`` plus the "extra" right pad of
  Qwen3TTSTokenizerV2CausalConvNet._get_extra_padding_for_conv1d
  (modeling_qwen3_tts_tokenizer_v2.py:183-192). For stride 1 (every conv in
  the decoder) the extra pad is 0.
* ``causal_conv_transpose1d``: full transposed conv then trim
  ``kernel - stride`` samples from the right
  (modeling_qwen3_tts_tokenizer_v2.py:195-208).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from jax import lax


def causal_conv1d(
    x: jnp.ndarray,       # [B, T, C_in]
    weight: jnp.ndarray,  # [K, C_in // groups, C_out]
    bias: Optional[jnp.ndarray] = None,  # [C_out]
    *,
    dilation: int = 1,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    k = weight.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride

    length = x.shape[1]
    n_frames = (length - k_eff + pad_left) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_left)
    pad_right = max(ideal_length - length, 0)

    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(stride,),
        padding=[(pad_left, pad_right)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def causal_conv_transpose1d(
    x: jnp.ndarray,       # [B, T, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out] — flipped-tap layout, see below
    bias: Optional[jnp.ndarray] = None,  # [C_out]
    *,
    stride: int,
) -> jnp.ndarray:
    """Causal transposed conv: output length T * stride.

    Implemented as an input-dilated regular convolution (lhs_dilation inserts
    ``stride - 1`` zeros between samples), which XLA lowers to strided MXU
    matmuls. ``weight`` must already be prepared: torch's ConvTranspose1d
    weight [C_in, C_out, K] becomes W'[j, i, o] = W_torch[i, o, K-1-j]
    (tap axis reversed, moved to the front) — then this input-dilated conv is
    exactly torch's transposed conv (verified in tests/test_convs.py).
    """
    k = weight.shape[0]
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    # Full output length is (T-1)*stride + k; causal right-trim of
    # (k - stride) leaves exactly T * stride samples.
    trim = k - stride
    if trim > 0:
        out = out[:, : out.shape[1] - trim, :]
    return out.astype(x.dtype)
