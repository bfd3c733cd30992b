"""Checkpoint → parameter-pytree loader.

Maps the reference checkpoint tensor names (see c/qwen_tts.c:433-769 for the
authoritative list) onto this framework's stacked, matmul-oriented layouts:

* Linear weights transpose [out, in] → [in, out] (x @ w on the MXU).
* Per-layer tensors stack into a leading [L, ...] axis (scan/fori over layers).
* Sub-talker's 31 embedding tables / LM heads stack into [G-1, ...] tensors.
* Load-time precomputes, same policy as the C engine:
  - VQ codebooks: embedding_sum / clamp(cluster_usage) folded **through the
    bias-free output projections** into [Q, size, codebook_dim] effective
    tables (c/qwen_tts.c:577-594 does the division; the fold is exact because
    the projections are linear).
  - SnakeBeta alpha/beta pre-exponentiated (c/qwen_tts.c:596-602).
  - Conv weights pre-transposed to [K, Cin, Cout]; transposed-conv weights
    pre-flipped (see ops/convs.py).

Dtype policy mirrors the reference: talker/sub-talker in bf16 (zero-copy
semantics preserved end-to-end: mmap view → device_put), codec in f32
(c/qwen_tts.c:362-364). Shapes are validated against the config with hard
failures, like the C loader's checks (c/qwen_tts.c:381-427).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import CodecDecoderConfig, TalkerConfig, TTSConfig
from qwen_tts_tpu.io.safetensors import MultiSafeTensors


def _lin(st, name: str, dtype, expect: Optional[Tuple[int, int]] = None):
    """Load a Linear weight and transpose to [in, out]."""
    w = st.get(name)
    if expect is not None and tuple(w.shape) != expect:
        raise ValueError(f"{name}: expected shape {expect}, got {tuple(w.shape)}")
    return jnp.asarray(np.ascontiguousarray(w.T), dtype=dtype)


def _vec(st, name: str, dtype):
    return jnp.asarray(st.get(name), dtype=dtype)


def _stack_layers(st, fmt: str, num_layers: int, loader):
    return jnp.stack([loader(fmt % l) for l in range(num_layers)])


def load_talker(st: MultiSafeTensors, cfg: TalkerConfig, dtype=jnp.bfloat16) -> dict:
    d, td = cfg.hidden_size, cfg.text_hidden_size
    qd, kvd, inter = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    L = cfg.num_hidden_layers
    pre = "talker.model.layers.%d."

    def lin(name, expect):
        return lambda n: _lin(st, n, dtype, expect)

    trunk = {
        "wq": _stack_layers(st, pre + "self_attn.q_proj.weight", L, lin("q", (qd, d))),
        "wk": _stack_layers(st, pre + "self_attn.k_proj.weight", L, lin("k", (kvd, d))),
        "wv": _stack_layers(st, pre + "self_attn.v_proj.weight", L, lin("v", (kvd, d))),
        "wo": _stack_layers(st, pre + "self_attn.o_proj.weight", L, lin("o", (d, qd))),
        "q_norm": _stack_layers(st, pre + "self_attn.q_norm.weight", L,
                                lambda n: _vec(st, n, dtype)),
        "k_norm": _stack_layers(st, pre + "self_attn.k_norm.weight", L,
                                lambda n: _vec(st, n, dtype)),
        "input_norm": _stack_layers(st, pre + "input_layernorm.weight", L,
                                    lambda n: _vec(st, n, dtype)),
        "post_attn_norm": _stack_layers(st, pre + "post_attention_layernorm.weight", L,
                                        lambda n: _vec(st, n, dtype)),
        "gate": _stack_layers(st, pre + "mlp.gate_proj.weight", L, lin("g", (inter, d))),
        "up": _stack_layers(st, pre + "mlp.up_proj.weight", L, lin("u", (inter, d))),
        "down": _stack_layers(st, pre + "mlp.down_proj.weight", L, lin("d", (d, inter))),
    }
    return {
        "codec_embedding": jnp.asarray(st.get("talker.model.codec_embedding.weight"), dtype),
        "text_embedding": jnp.asarray(st.get("talker.model.text_embedding.weight"), dtype),
        "text_proj_fc1": _lin(st, "talker.text_projection.linear_fc1.weight", dtype, (td, td)),
        "text_proj_fc1_b": _vec(st, "talker.text_projection.linear_fc1.bias", dtype),
        "text_proj_fc2": _lin(st, "talker.text_projection.linear_fc2.weight", dtype, (d, td)),
        "text_proj_fc2_b": _vec(st, "talker.text_projection.linear_fc2.bias", dtype),
        "trunk": trunk,
        "norm": _vec(st, "talker.model.norm.weight", dtype),
        "codec_head": _lin(st, "talker.codec_head.weight", dtype, (cfg.vocab_size, d)),
    }


def load_subtalker(st: MultiSafeTensors, cfg: TalkerConfig, dtype=jnp.bfloat16) -> dict:
    cp = cfg.code_predictor
    d, inter = cp.hidden_size, cp.intermediate_size
    qd = cp.num_attention_heads * cp.head_dim
    kvd = cp.num_key_value_heads * cp.head_dim
    L = cp.num_hidden_layers
    g1 = cp.num_code_groups - 1
    pre = "talker.code_predictor.model.layers.%d."

    trunk = {
        "wq": _stack_layers(st, pre + "self_attn.q_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (qd, d))),
        "wk": _stack_layers(st, pre + "self_attn.k_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (kvd, d))),
        "wv": _stack_layers(st, pre + "self_attn.v_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (kvd, d))),
        "wo": _stack_layers(st, pre + "self_attn.o_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (d, qd))),
        "q_norm": _stack_layers(st, pre + "self_attn.q_norm.weight", L,
                                lambda n: _vec(st, n, dtype)),
        "k_norm": _stack_layers(st, pre + "self_attn.k_norm.weight", L,
                                lambda n: _vec(st, n, dtype)),
        "input_norm": _stack_layers(st, pre + "input_layernorm.weight", L,
                                    lambda n: _vec(st, n, dtype)),
        "post_attn_norm": _stack_layers(st, pre + "post_attention_layernorm.weight", L,
                                        lambda n: _vec(st, n, dtype)),
        "gate": _stack_layers(st, pre + "mlp.gate_proj.weight", L,
                              lambda n: _lin(st, n, dtype, (inter, d))),
        "up": _stack_layers(st, pre + "mlp.up_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (inter, d))),
        "down": _stack_layers(st, pre + "mlp.down_proj.weight", L,
                              lambda n: _lin(st, n, dtype, (d, inter))),
    }
    params = {
        "embeds": jnp.stack([
            jnp.asarray(
                st.get(f"talker.code_predictor.model.codec_embedding.{i}.weight"), dtype
            )
            for i in range(g1)
        ]),
        "trunk": trunk,
        "norm": _vec(st, "talker.code_predictor.model.norm.weight", dtype),
        "lm_heads": jnp.stack([
            _lin(st, f"talker.code_predictor.lm_head.{i}.weight", dtype,
                 (cp.vocab_size, d))
            for i in range(g1)
        ]),
    }
    proj_name = "talker.code_predictor.small_to_mtp_projection.weight"
    if proj_name in st:
        params["input_proj"] = _lin(st, proj_name, dtype, (d, cfg.hidden_size))
        params["input_proj_b"] = _vec(
            st, "talker.code_predictor.small_to_mtp_projection.bias", dtype
        )
    return params


# --------------------------------------------------------------------------
# Codec decoder
# --------------------------------------------------------------------------

def _conv_w(st, name: str, dtype):
    """torch Conv1d [out, in/groups, K] → [K, in/groups, out]."""
    return jnp.asarray(np.ascontiguousarray(st.get_f32(name).transpose(2, 1, 0)), dtype)


def _tconv_w(st, name: str, dtype):
    """torch ConvTranspose1d [in, out, K] → flipped-tap [K, in, out]."""
    w = st.get_f32(name)
    return jnp.asarray(
        np.ascontiguousarray(np.flip(w.transpose(2, 0, 1), axis=0)), dtype
    )


def _snake(st, prefix: str, dtype):
    """Pre-exponentiated SnakeBeta params (c/qwen_tts.c:596-602)."""
    return (
        jnp.asarray(np.exp(st.get_f32(prefix + "alpha")), dtype),
        jnp.asarray(np.exp(st.get_f32(prefix + "beta")), dtype),
    )


def load_codec(st: MultiSafeTensors, cfg: CodecDecoderConfig, dtype=jnp.float32) -> dict:
    q = cfg.num_quantizers

    # ---- RVQ: fold output projections into effective codebooks -----------
    def folded(prefix: str, idx: int, proj: np.ndarray) -> np.ndarray:
        usage = st.get_f32(f"{prefix}.vq.layers.{idx}._codebook.cluster_usage")
        emb_sum = st.get_f32(f"{prefix}.vq.layers.{idx}._codebook.embedding_sum")
        emb = emb_sum / np.clip(usage, cfg.vq_epsilon, None)[:, None]
        return emb @ proj.T  # [size, vq_dim] @ [vq_dim, out_dim]T

    sem_proj = st.get_f32("decoder.quantizer.rvq_first.output_proj.weight")[:, :, 0]
    ac_proj = st.get_f32("decoder.quantizer.rvq_rest.output_proj.weight")[:, :, 0]
    books = [folded("decoder.quantizer.rvq_first", 0, sem_proj)]
    for i in range(q - 1):
        books.append(folded("decoder.quantizer.rvq_rest", i, ac_proj))
    codebooks = jnp.asarray(np.stack(books), dtype)

    # ---- pre-transformer ---------------------------------------------------
    L = cfg.num_hidden_layers
    d, inter = cfg.hidden_size, cfg.intermediate_size
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    pre = "decoder.pre_transformer.layers.%d."
    trunk = {
        "wq": _stack_layers(st, pre + "self_attn.q_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (qd, d))),
        "wk": _stack_layers(st, pre + "self_attn.k_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (kvd, d))),
        "wv": _stack_layers(st, pre + "self_attn.v_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (kvd, d))),
        "wo": _stack_layers(st, pre + "self_attn.o_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (d, qd))),
        "input_norm": _stack_layers(st, pre + "input_layernorm.weight", L,
                                    lambda n: _vec(st, n, dtype)),
        "post_attn_norm": _stack_layers(st, pre + "post_attention_layernorm.weight", L,
                                        lambda n: _vec(st, n, dtype)),
        "gate": _stack_layers(st, pre + "mlp.gate_proj.weight", L,
                              lambda n: _lin(st, n, dtype, (inter, d))),
        "up": _stack_layers(st, pre + "mlp.up_proj.weight", L,
                            lambda n: _lin(st, n, dtype, (inter, d))),
        "down": _stack_layers(st, pre + "mlp.down_proj.weight", L,
                              lambda n: _lin(st, n, dtype, (d, inter))),
        "attn_scale": _stack_layers(st, pre + "self_attn_layer_scale.scale", L,
                                    lambda n: _vec(st, n, dtype)),
        "mlp_scale": _stack_layers(st, pre + "mlp_layer_scale.scale", L,
                                   lambda n: _vec(st, n, dtype)),
    }
    transformer = {
        "input_proj_w": _lin(st, "decoder.pre_transformer.input_proj.weight", dtype,
                             (d, cfg.latent_dim)),
        "input_proj_b": _vec(st, "decoder.pre_transformer.input_proj.bias", dtype),
        "trunk": trunk,
        "norm": _vec(st, "decoder.pre_transformer.norm.weight", dtype),
        "output_proj_w": _lin(st, "decoder.pre_transformer.output_proj.weight", dtype,
                              (cfg.latent_dim, d)),
        "output_proj_b": _vec(st, "decoder.pre_transformer.output_proj.bias", dtype),
    }

    # ---- upsample stages ---------------------------------------------------
    upsample = []
    for i in range(len(cfg.upsampling_ratios)):
        b = f"decoder.upsample.{i}."
        upsample.append({
            "tconv_w": _tconv_w(st, b + "0.conv.weight", dtype),
            "tconv_b": _vec(st, b + "0.conv.bias", dtype),
            "convnext": {
                "dw_w": _conv_w(st, b + "1.dwconv.conv.weight", dtype),
                "dw_b": _vec(st, b + "1.dwconv.conv.bias", dtype),
                "ln_w": _vec(st, b + "1.norm.weight", dtype),
                "ln_b": _vec(st, b + "1.norm.bias", dtype),
                "pw1_w": _lin(st, b + "1.pwconv1.weight", dtype),
                "pw1_b": _vec(st, b + "1.pwconv1.bias", dtype),
                "pw2_w": _lin(st, b + "1.pwconv2.weight", dtype),
                "pw2_b": _vec(st, b + "1.pwconv2.bias", dtype),
                "gamma": _vec(st, b + "1.gamma", dtype),
            },
        })

    # ---- vocoder -------------------------------------------------------------
    # decoder.decoder.0 = initial conv; .1-.4 = blocks; .5 = final snake;
    # .6 = final conv (c/qwen_tts.c vocoder loading).
    blocks = []
    for i in range(len(cfg.upsample_rates)):
        b = f"decoder.decoder.{i + 1}.block."
        alpha, beta = _snake(st, b + "0.", dtype)
        resunits = []
        for r in range(3):
            u = f"{b}{r + 2}."
            a1, b1 = _snake(st, u + "act1.", dtype)
            a2, b2 = _snake(st, u + "act2.", dtype)
            resunits.append({
                "alpha1": a1, "beta1": b1,
                "conv1_w": _conv_w(st, u + "conv1.conv.weight", dtype),
                "conv1_b": _vec(st, u + "conv1.conv.bias", dtype),
                "alpha2": a2, "beta2": b2,
                "conv2_w": _conv_w(st, u + "conv2.conv.weight", dtype),
                "conv2_b": _vec(st, u + "conv2.conv.bias", dtype),
            })
        blocks.append({
            "alpha": alpha, "beta": beta,
            "tconv_w": _tconv_w(st, b + "1.conv.weight", dtype),
            "tconv_b": _vec(st, b + "1.conv.bias", dtype),
            "resunits": resunits,
        })

    n_blocks = len(cfg.upsample_rates)
    final_alpha, final_beta = _snake(st, f"decoder.decoder.{n_blocks + 1}.", dtype)
    return {
        "codebooks": codebooks,
        "pre_conv_w": _conv_w(st, "decoder.pre_conv.conv.weight", dtype),
        "pre_conv_b": _vec(st, "decoder.pre_conv.conv.bias", dtype),
        "transformer": transformer,
        "upsample": upsample,
        "vocoder_pre_w": _conv_w(st, "decoder.decoder.0.conv.weight", dtype),
        "vocoder_pre_b": _vec(st, "decoder.decoder.0.conv.bias", dtype),
        "blocks": blocks,
        "final_alpha": final_alpha,
        "final_beta": final_beta,
        "final_conv_w": _conv_w(st, f"decoder.decoder.{n_blocks + 2}.conv.weight", dtype),
        "final_conv_b": _vec(st, f"decoder.decoder.{n_blocks + 2}.conv.bias", dtype),
    }


def load_checkpoint(
    model_dir: str,
    cfg: Optional[TTSConfig] = None,
    *,
    talker_dtype=jnp.bfloat16,
    codec_dtype=jnp.float32,
):
    """Load a full checkpoint directory.

    Returns (cfg, talker, subtalker, codec, speaker_encoder) — the codec lives
    under ``speech_tokenizer/`` as in the reference layout
    (c/qwen_tts.c:771-815); a missing codec is tolerated (talker-only use),
    matching the reference's graceful degradation (c/qwen_tts.c:904-907). The
    speaker encoder is present on Base checkpoints only
    (modeling_qwen3_tts.py:1822-1825).
    """
    if cfg is None:
        cfg = TTSConfig.from_pretrained(model_dir)
    st = MultiSafeTensors(model_dir)
    talker = load_talker(st, cfg.talker, talker_dtype)
    subtalker = load_subtalker(st, cfg.talker, talker_dtype)
    speaker = None
    if "speaker_encoder.blocks.0.conv.weight" in st:
        from qwen_tts_tpu.models.speaker import load_speaker_encoder

        speaker = load_speaker_encoder(st, cfg.speaker_encoder)
    codec = None
    codec_dir = os.path.join(model_dir, "speech_tokenizer")
    if os.path.isdir(codec_dir):
        try:
            st_codec = MultiSafeTensors(codec_dir)
        except FileNotFoundError:
            st_codec = None
        if st_codec is not None:
            codec = load_codec(st_codec, cfg.codec.decoder, codec_dtype)
            st_codec.close()
    st.close()
    return cfg, talker, subtalker, codec, speaker
