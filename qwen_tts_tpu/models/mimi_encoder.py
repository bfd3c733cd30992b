"""JAX port of the Mimi *encoder* (the 12 Hz speech-tokenizer encode path).

The reference's 12 Hz encoder is the public HuggingFace Mimi model with its
decoder halves nulled out (modeling_qwen3_tts_tokenizer_v2.py:899-908). This
module re-implements the encode pipeline natively:

  SEANet conv encoder (causal convs + ELU ResNet blocks, stride downsampling)
  → causal sliding-window transformer (LayerNorm + LayerScale + GELU MLP,
    standard RoPE)
  → stride-2 downsample conv (replicate padding) to the 12.5 Hz frame rate
  → SplitResidualVectorQuantizer encode (semantic VQ + iterative acoustic
    residual VQ, nearest-neighbour against EMA codebooks).

Validated bit-for-bit against `transformers.MimiModel.encode` on shared
weights (tests/test_mimi_encoder.py). Channels-last layout throughout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.ops.attention import attention_prefill
from qwen_tts_tpu.ops.norms import layer_norm
from qwen_tts_tpu.ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class MimiEncoderConfig:
    """The MimiConfig fields the encode path consumes."""

    num_filters: int = 64
    audio_channels: int = 1
    kernel_size: int = 7
    residual_kernel_size: int = 3
    last_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 6, 5, 4)
    compress: int = 2
    use_conv_shortcut: bool = False
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    codebook_size: int = 2048
    codebook_dim: int = 256
    vector_quantization_hidden_dimension: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    frame_rate: float = 12.5
    encodec_frame_rate: float = 25.0
    sampling_rate: int = 24000

    @classmethod
    def from_dict(cls, d) -> "MimiEncoderConfig":
        d = dict(d)
        if "upsampling_ratios" in d:
            d["upsampling_ratios"] = tuple(d["upsampling_ratios"])
        keys = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in keys})

    @property
    def encodec_downsample(self) -> int:
        total = 1
        for r in self.upsampling_ratios:
            total *= r
        return total


def _mimi_causal_conv(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], *,
    stride: int = 1, dilation: int = 1, pad_mode: str = "constant",
) -> jnp.ndarray:
    """MimiConv1d causal forward: left pad (k_eff − stride), extra right pad
    to the ideal length (modeling_mimi MimiConv1d). x: [B, T, C]."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    padding_total = k_eff - stride
    length = x.shape[1]
    n_frames = (length - k_eff + padding_total) / stride + 1
    n_frames = math.ceil(n_frames) - 1
    ideal_length = n_frames * stride + k_eff - padding_total
    extra = max(ideal_length - length, 0)

    mode = {"constant": "constant", "replicate": "edge", "reflect": "reflect"}[pad_mode]
    x = jnp.pad(x, ((0, 0), (padding_total, extra), (0, 0)), mode=mode)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def seanet_encode(params: dict, cfg: MimiEncoderConfig, x: jnp.ndarray
                  ) -> jnp.ndarray:
    """x: [B, T, 1] waveform → [B, T', hidden_size].

    Strides/dilations are derived from ``cfg`` (stride = the stage's
    downsampling ratio; dilation = growth_rate**block_index, second conv
    always 1) rather than read from the params pytree — the loader stores
    them redundantly, but under ``jax.jit`` pytree int leaves become
    tracers and padding arithmetic needs concrete values."""
    h = _mimi_causal_conv(x, params["init_w"], params["init_b"])
    ratios = tuple(reversed(cfg.upsampling_ratios))
    for si, stage in enumerate(params["stages"]):
        for j, block in enumerate(stage["blocks"]):
            residual = h
            r = h
            for ci, conv in enumerate(block):
                dil = cfg.dilation_growth_rate ** j if ci == 0 else 1
                r = jax.nn.elu(r)
                r = _mimi_causal_conv(r, conv["w"], conv["b"], dilation=dil)
            h = residual + r
        h = jax.nn.elu(h)
        h = _mimi_causal_conv(h, stage["down_w"], stage["down_b"],
                              stride=ratios[si])
    h = jax.nn.elu(h)
    return _mimi_causal_conv(h, params["final_w"], params["final_b"])


def mimi_transformer(params: dict, cfg: MimiEncoderConfig, x: jnp.ndarray
                     ) -> jnp.ndarray:
    """Causal sliding-window transformer, LayerNorm/LayerScale/GELU
    (MimiTransformerLayer). x: [B, T, D]."""
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    h = x
    for layer in params["layers"]:
        normed = layer_norm(h, layer["ln1_w"], layer["ln1_b"], cfg.norm_eps)
        q = (normed @ layer["wq"]).reshape(b, t, cfg.num_attention_heads,
                                           cfg.head_dim)
        k = (normed @ layer["wk"]).reshape(b, t, cfg.num_key_value_heads,
                                           cfg.head_dim)
        v = (normed @ layer["wv"]).reshape(b, t, cfg.num_key_value_heads,
                                           cfg.head_dim)
        q = apply_rope(q, cos[:, :, None], sin[:, :, None])
        k = apply_rope(k, cos[:, :, None], sin[:, :, None])
        attn = attention_prefill(q, k, v, sliding_window=cfg.sliding_window)
        attn = attn.reshape(b, t, -1) @ layer["wo"]
        h = h + attn * layer["attn_scale"].astype(h.dtype)
        normed = layer_norm(h, layer["ln2_w"], layer["ln2_b"], cfg.norm_eps)
        mlp = jax.nn.gelu(normed @ layer["fc1"], approximate=False) @ layer["fc2"]
        h = h + mlp * layer["mlp_scale"].astype(h.dtype)
    return h


def _rvq_encode(proj_w: Optional[jnp.ndarray], codebooks: jnp.ndarray,
                x: jnp.ndarray) -> jnp.ndarray:
    """Iterative residual VQ encode. x: [B, T, D_hidden]; codebooks
    [Q, size, vq_dim] (effective embeds). Returns [Q, B, T] indices."""
    if proj_w is not None:
        x = x @ proj_w
    residual = x
    out = []
    for q in range(codebooks.shape[0]):
        embed = codebooks[q]
        dist = (
            jnp.sum(residual * residual, -1, keepdims=True)
            - 2.0 * residual @ embed.T
            + jnp.sum(embed * embed, -1)[None, None]
        )
        idx = jnp.argmin(dist, axis=-1)
        out.append(idx)
        residual = residual - embed[idx]
    return jnp.stack(out)


def mimi_encode(
    params: dict, cfg: MimiEncoderConfig, wav: jnp.ndarray,
    num_quantizers: Optional[int] = None,
) -> jnp.ndarray:
    """wav: [B, T] → codes [B, Q, T_frames] (matching MimiModel.encode)."""
    nq = num_quantizers or cfg.num_quantizers
    h = seanet_encode(params, cfg, wav[..., None])
    h = mimi_transformer(params["transformer"], cfg, h)
    if "down_w" in params:
        h = _mimi_causal_conv(h, params["down_w"], None, stride=2,
                              pad_mode="replicate")
    sem = _rvq_encode(params["semantic_proj"], params["semantic_books"], h)
    codes = sem
    if nq > cfg.num_semantic_quantizers:
        ac = _rvq_encode(params["acoustic_proj"], params["acoustic_books"], h)
        codes = jnp.concatenate(
            [sem, ac[: nq - cfg.num_semantic_quantizers]], axis=0
        )
    return jnp.transpose(codes, (1, 0, 2)).astype(jnp.int32)  # [B, Q, T]


# --------------------------------------------------------------------------
# Loading (from the reference checkpoint layout: tensors under "encoder.")
# --------------------------------------------------------------------------

def load_mimi_encoder(st, cfg: MimiEncoderConfig, dtype=jnp.float32,
                      prefix: str = "encoder.") -> dict:
    import numpy as np

    def conv(name, bias=True):
        w = jnp.asarray(
            np.ascontiguousarray(st.get_f32(prefix + name + ".weight")
                                 .transpose(2, 1, 0)), dtype)
        b = (jnp.asarray(st.get_f32(prefix + name + ".bias"), dtype)
             if bias and (prefix + name + ".bias") in st else None)
        return w, b

    def lin(name):
        return jnp.asarray(
            np.ascontiguousarray(st.get_f32(prefix + name).T), dtype)

    # ---- SEANet stack (MimiEncoder layer indexing) ------------------------
    idx = 0
    init_w, init_b = conv(f"encoder.layers.{idx}.conv")
    idx += 1
    stages = []
    for ratio in reversed(cfg.upsampling_ratios):
        blocks = []
        for j in range(cfg.num_residual_layers):
            convs = []
            for bi, dilation in ((1, cfg.dilation_growth_rate ** j), (3, 1)):
                w, b = conv(f"encoder.layers.{idx}.block.{bi}.conv")
                convs.append({"w": w, "b": b, "dilation": dilation})
            blocks.append(convs)
            idx += 1
        idx += 1  # ELU
        down_w, down_b = conv(f"encoder.layers.{idx}.conv")
        idx += 1
        stages.append({"blocks": blocks, "down_w": down_w, "down_b": down_b,
                       "stride": ratio})
    idx += 1  # ELU
    final_w, final_b = conv(f"encoder.layers.{idx}.conv")

    # ---- transformer -------------------------------------------------------
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder_transformer.layers.{i}."
        layers.append({
            "ln1_w": jnp.asarray(st.get_f32(prefix + b + "input_layernorm.weight"), dtype),
            "ln1_b": jnp.asarray(st.get_f32(prefix + b + "input_layernorm.bias"), dtype),
            "wq": lin(b + "self_attn.q_proj.weight"),
            "wk": lin(b + "self_attn.k_proj.weight"),
            "wv": lin(b + "self_attn.v_proj.weight"),
            "wo": lin(b + "self_attn.o_proj.weight"),
            "ln2_w": jnp.asarray(st.get_f32(prefix + b + "post_attention_layernorm.weight"), dtype),
            "ln2_b": jnp.asarray(st.get_f32(prefix + b + "post_attention_layernorm.bias"), dtype),
            "fc1": lin(b + "mlp.fc1.weight"),
            "fc2": lin(b + "mlp.fc2.weight"),
            "attn_scale": jnp.asarray(st.get_f32(prefix + b + "self_attn_layer_scale.scale"), dtype),
            "mlp_scale": jnp.asarray(st.get_f32(prefix + b + "mlp_layer_scale.scale"), dtype),
        })

    params = {
        "init_w": init_w, "init_b": init_b,
        "stages": stages,
        "final_w": final_w, "final_b": final_b,
        "transformer": {"layers": layers},
    }
    if (prefix + "downsample.conv.weight") in st:
        params["down_w"], _ = conv("downsample.conv", bias=False)

    # ---- quantizer ---------------------------------------------------------
    def books(branch: str, n: int):
        eff = []
        for q in range(n):
            usage = st.get_f32(
                f"{prefix}quantizer.{branch}.layers.{q}.codebook.cluster_usage")
            esum = st.get_f32(
                f"{prefix}quantizer.{branch}.layers.{q}.codebook.embed_sum")
            eff.append(esum / np.clip(usage, 1e-5, None)[:, None])
        return jnp.asarray(np.stack(eff), dtype)

    def in_proj(branch: str):
        name = f"{prefix}quantizer.{branch}.input_proj.weight"
        if name in st:
            return jnp.asarray(
                np.ascontiguousarray(st.get_f32(name)[:, :, 0].T), dtype)
        return None

    params["semantic_books"] = books("semantic_residual_vector_quantizer",
                                     cfg.num_semantic_quantizers)
    params["semantic_proj"] = in_proj("semantic_residual_vector_quantizer")
    n_acoustic = cfg.num_quantizers - cfg.num_semantic_quantizers
    params["acoustic_books"] = books("acoustic_residual_vector_quantizer",
                                     n_acoustic)
    params["acoustic_proj"] = in_proj("acoustic_residual_vector_quantizer")
    return params
