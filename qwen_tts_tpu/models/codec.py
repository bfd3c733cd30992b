"""12 Hz codec decoder (stage 2): [T, Q] codes → 24 kHz waveform.

Pipeline matches Qwen3TTSTokenizerV2Decoder
(modeling_qwen3_tts_tokenizer_v2.py:824-896, C port c/qwen_tts_codec.c:581-749):

1. SplitResidualVectorQuantizer dequantize — here a single gather-sum per
   branch: the (bias-free) per-branch ``output_proj`` is **folded into the
   codebooks at load time** (eff[k] = (embedding_sum/usage) @ W_out), turning
   the whole RVQ into Q embedding lookups + a sum. Mathematically identical
   (linear map distributes over the residual sum); the C port precomputes the
   division only (c/qwen_tts.c:577-594) — on TPU folding also removes two
   pointwise convs.
2. Causal pre-conv (codebook_dim → latent, k=3).
3. 8-layer sliding-window (72) pre-transformer with LayerScale and
   latent↔hidden input/output projections.
4. 2 upsample stages: causal transposed conv (×2) + ConvNeXt block.
5. BigVGAN-style vocoder: initial conv, 4 decoder blocks
   (SnakeBeta → transposed conv → 3 residual units, dilations 1/3/9),
   final SnakeBeta + conv to 1 channel, clamp [-1, 1].

Everything runs channels-last ([B, T, C]); ``chunked_decode`` mirrors the
reference's 300-frame chunks with 25 frames of re-decoded left context
(modeling_qwen3_tts_tokenizer_v2.py:886-896) so memory stays bounded and
streaming emission is possible.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import CodecDecoderConfig
from qwen_tts_tpu.models.trunk import TrunkDims, init_trunk_params, trunk_prefill
from qwen_tts_tpu.ops.convs import causal_conv1d, causal_conv_transpose1d
from qwen_tts_tpu.ops.norms import layer_norm, rms_norm
from qwen_tts_tpu.ops.rope import rope_cos_sin
from qwen_tts_tpu.ops.snake import snake_beta


def codec_transformer_dims(cfg: CodecDecoderConfig) -> TrunkDims:
    return TrunkDims(
        num_layers=cfg.num_hidden_layers,
        hidden=cfg.hidden_size,
        heads=cfg.num_attention_heads,
        kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        intermediate=cfg.intermediate_size,
        eps=cfg.rms_norm_eps,
        qk_norm=False,
    )


# --------------------------------------------------------------------------
# Random init (tests / benchmarks without a checkpoint)
# --------------------------------------------------------------------------

def _w(key, shape, fan_in, dtype):
    return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)


def _init_convnext(key, dim, dtype):
    ks = jax.random.split(key, 3)
    return {
        "dw_w": _w(ks[0], (7, 1, dim), 7.0, dtype),
        "dw_b": jnp.zeros((dim,), dtype),
        "ln_w": jnp.ones((dim,), dtype),
        "ln_b": jnp.zeros((dim,), dtype),
        "pw1_w": _w(ks[1], (dim, 4 * dim), dim, dtype),
        "pw1_b": jnp.zeros((4 * dim,), dtype),
        "pw2_w": _w(ks[2], (4 * dim, dim), 4 * dim, dtype),
        "pw2_b": jnp.zeros((dim,), dtype),
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def _init_resunit(key, dim, dtype):
    ks = jax.random.split(key, 2)
    return {
        "alpha1": jnp.ones((dim,), dtype),
        "beta1": jnp.ones((dim,), dtype),
        "conv1_w": _w(ks[0], (7, dim, dim), 7 * dim, dtype),
        "conv1_b": jnp.zeros((dim,), dtype),
        "alpha2": jnp.ones((dim,), dtype),
        "beta2": jnp.ones((dim,), dtype),
        "conv2_w": _w(ks[1], (1, dim, dim), dim, dtype),
        "conv2_b": jnp.zeros((dim,), dtype),
    }


def init_codec_params(rng: jax.Array, cfg: CodecDecoderConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))
    q = cfg.num_quantizers
    cbd, lat, dec = cfg.codebook_dim, cfg.latent_dim, cfg.decoder_dim

    trunk = init_trunk_params(next(keys), codec_transformer_dims(cfg), dtype)
    trunk["attn_scale"] = jnp.full(
        (cfg.num_hidden_layers, cfg.hidden_size), cfg.layer_scale_initial_scale, dtype
    )
    trunk["mlp_scale"] = jnp.full(
        (cfg.num_hidden_layers, cfg.hidden_size), cfg.layer_scale_initial_scale, dtype
    )

    upsample = []
    for factor in cfg.upsampling_ratios:
        upsample.append({
            "tconv_w": _w(next(keys), (factor, lat, lat), lat * factor, dtype),
            "tconv_b": jnp.zeros((lat,), dtype),
            "convnext": _init_convnext(next(keys), lat, dtype),
        })

    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        in_dim = dec // (2 ** i)
        out_dim = dec // (2 ** (i + 1))
        blocks.append({
            "alpha": jnp.ones((in_dim,), dtype),
            "beta": jnp.ones((in_dim,), dtype),
            "tconv_w": _w(next(keys), (2 * rate, in_dim, out_dim), in_dim * rate, dtype),
            "tconv_b": jnp.zeros((out_dim,), dtype),
            "resunits": [_init_resunit(next(keys), out_dim, dtype) for _ in range(3)],
        })

    out_dim = dec // (2 ** len(cfg.upsample_rates))
    return {
        # Folded effective codebooks: [Q, codebook_size, codebook_dim]
        "codebooks": _w(next(keys), (q, cfg.codebook_size, cbd), cbd, dtype),
        "pre_conv_w": _w(next(keys), (3, cbd, lat), 3 * cbd, dtype),
        "pre_conv_b": jnp.zeros((lat,), dtype),
        "transformer": {
            "input_proj_w": _w(next(keys), (lat, cfg.hidden_size), lat, dtype),
            "input_proj_b": jnp.zeros((cfg.hidden_size,), dtype),
            "trunk": trunk,
            "norm": jnp.ones((cfg.hidden_size,), dtype),
            "output_proj_w": _w(next(keys), (cfg.hidden_size, lat), cfg.hidden_size, dtype),
            "output_proj_b": jnp.zeros((lat,), dtype),
        },
        "upsample": upsample,
        "vocoder_pre_w": _w(next(keys), (7, lat, dec), 7 * lat, dtype),
        "vocoder_pre_b": jnp.zeros((dec,), dtype),
        "blocks": blocks,
        "final_alpha": jnp.ones((out_dim,), dtype),
        "final_beta": jnp.ones((out_dim,), dtype),
        "final_conv_w": _w(next(keys), (7, out_dim, 1), 7 * out_dim, dtype),
        "final_conv_b": jnp.zeros((1,), dtype),
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def rvq_dequantize(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T, Q] int32 (clamped >= 0) → latent [B, T, codebook_dim].

    One gather per quantizer into the proj-folded codebooks, summed
    (semantic branch is quantizer 0; the semantic/acoustic split is already
    baked into the folded tables)."""
    q = params["codebooks"].shape[0]
    gathered = params["codebooks"][jnp.arange(q)[:, None, None],
                                   jnp.transpose(codes, (2, 0, 1))]  # [Q, B, T, D]
    return jnp.sum(gathered, axis=0)


def codec_transformer(params: dict, cfg: CodecDecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Sliding-window pre-transformer with latent↔hidden projections.
    x: [B, T, latent] → [B, T, latent]."""
    t = params
    h = x @ t["input_proj_w"] + t["input_proj_b"]
    positions = jnp.broadcast_to(
        jnp.arange(h.shape[1], dtype=jnp.int32)[None], h.shape[:2]
    )
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    h, _, _ = trunk_prefill(
        t["trunk"], codec_transformer_dims(cfg), h, cos, sin,
        sliding_window=cfg.sliding_window,
    )
    h = rms_norm(h, t["norm"], cfg.rms_norm_eps)
    return h @ t["output_proj_w"] + t["output_proj_b"]


def _convnext_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """ConvNeXt block (modeling_qwen3_tts_tokenizer_v2.py:211-243), channels-last."""
    dim = x.shape[-1]
    h = causal_conv1d(x, p["dw_w"], p["dw_b"], groups=dim)
    h = layer_norm(h, p["ln_w"], p["ln_b"], eps=1e-6)
    h = h @ p["pw1_w"] + p["pw1_b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pw2_w"] + p["pw2_b"]
    return x + p["gamma"].astype(h.dtype) * h


def _resunit(p: dict, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    h = snake_beta(x, p["alpha1"], p["beta1"])
    h = causal_conv1d(h, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = snake_beta(h, p["alpha2"], p["beta2"])
    h = causal_conv1d(h, p["conv2_w"], p["conv2_b"])
    return x + h


def codec_decode(params: dict, cfg: CodecDecoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T, Q] int32 → waveform [B, T * total_upsample] float32."""
    codes = jnp.maximum(codes, 0)
    h = rvq_dequantize(params, codes)
    h = causal_conv1d(h, params["pre_conv_w"], params["pre_conv_b"])
    h = codec_transformer(params["transformer"], cfg, h)

    for stage, factor in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_conv_transpose1d(h, stage["tconv_w"], stage["tconv_b"], stride=factor)
        h = _convnext_block(stage["convnext"], h)

    h = causal_conv1d(h, params["vocoder_pre_w"], params["vocoder_pre_b"])
    for block, rate in zip(params["blocks"], cfg.upsample_rates):
        h = snake_beta(h, block["alpha"], block["beta"])
        h = causal_conv_transpose1d(h, block["tconv_w"], block["tconv_b"], stride=rate)
        for unit, dilation in zip(block["resunits"], (1, 3, 9)):
            h = _resunit(unit, h, dilation)

    h = snake_beta(h, params["final_alpha"], params["final_beta"])
    wav = causal_conv1d(h, params["final_conv_w"], params["final_conv_b"])
    return jnp.clip(wav[..., 0].astype(jnp.float32), -1.0, 1.0)


def chunked_decode(
    params: dict,
    cfg: CodecDecoderConfig,
    codes: jnp.ndarray,  # [B, T, Q]
    chunk_size: int = 300,
    left_context_size: int = 25,
    decode_fn=None,
    max_batch: int = 0,
) -> jnp.ndarray:
    """Reference chunking (modeling_qwen3_tts_tokenizer_v2.py:886-896): decode
    ``chunk_size`` frames at a time, re-decoding ``left_context_size`` frames
    of context whose audio is discarded. Chunk shapes are static per
    (context, chunk) pair so XLA compiles at most two program shapes.

    ``max_batch`` > 0 additionally splits the batch axis into slices of at
    most that size decoded sequentially. Vocoder activations are the
    large-batch HBM peak (~3 live [B, T·1920, C_last] buffers — b96×128f is
    ~13 GiB, the round-2 serving-batch OOM), and unlike shorter chunks a
    batch split costs ZERO redundant compute (no re-decoded left context) and
    reuses a single compiled program when slices divide evenly."""
    if decode_fn is None:
        decode_fn = jax.jit(codec_decode, static_argnums=1)
    b = codes.shape[0]
    if max_batch and b > max_batch:
        parts = [
            chunked_decode(params, cfg, codes[i : i + max_batch],
                           chunk_size, left_context_size, decode_fn)
            for i in range(0, b, max_batch)
        ]
        return jnp.concatenate(parts, axis=0)
    total_upsample = cfg.total_upsample
    t = codes.shape[1]
    wavs = []
    start = 0
    while start < t:
        end = min(start + chunk_size, t)
        ctx = left_context_size if start - left_context_size > 0 else start
        wav = decode_fn(params, cfg, codes[:, start - ctx : end])
        wavs.append(wav[:, ctx * total_upsample :])
        start = end
    return jnp.concatenate(wavs, axis=-1)
