"""25 Hz (V1) codec decoder weight loading.

Maps the reference state-dict names (Qwen3TTSTokenizerV1Model → decoder.dit.* /
decoder.bigvgan.*) onto the channels-last pytrees of models/codec_v1.py. Same
layout conventions as io/loader.py: [in, out] linears, [K, Cin, Cout] convs
(flipped taps for transposed convs), SnakeBeta pre-exponentiation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qwen_tts_tpu.config import BigVGANConfig, CodecV1Config, DiTConfig
from qwen_tts_tpu.io.safetensors import MultiSafeTensors
from qwen_tts_tpu.models.codec_v1 import make_aa_filters
from qwen_tts_tpu.models.speaker import load_speaker_encoder


def _lin(st, name, dtype):
    return jnp.asarray(np.ascontiguousarray(st.get_f32(name).T), dtype)


def _vec(st, name, dtype):
    return jnp.asarray(st.get_f32(name), dtype)


def _conv_w(st, name, dtype):
    return jnp.asarray(
        np.ascontiguousarray(st.get_f32(name).transpose(2, 1, 0)), dtype
    )


def _tconv_w(st, name, dtype):
    w = st.get_f32(name)  # [in, out, k]
    return jnp.asarray(
        np.ascontiguousarray(np.flip(w.transpose(2, 0, 1), axis=0)), dtype
    )


def _snake(st, prefix, dtype):
    return (
        jnp.asarray(np.exp(st.get_f32(prefix + "alpha")), dtype),
        jnp.asarray(np.exp(st.get_f32(prefix + "beta")), dtype),
    )


def load_dit(st: MultiSafeTensors, cfg: DiTConfig, dtype=jnp.float32) -> dict:
    p = "decoder.dit."
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"{p}transformer_blocks.{i}."
        layers.append({
            "ada_w": _lin(st, b + "attn_norm.linear.weight", dtype),
            "ada_b": _vec(st, b + "attn_norm.linear.bias", dtype),
            "wq": _lin(st, b + "attn.to_q.weight", dtype),
            "bq": _vec(st, b + "attn.to_q.bias", dtype),
            "wk": _lin(st, b + "attn.to_k.weight", dtype),
            "bk": _vec(st, b + "attn.to_k.bias", dtype),
            "wv": _lin(st, b + "attn.to_v.weight", dtype),
            "bv": _vec(st, b + "attn.to_v.bias", dtype),
            "wo": _lin(st, b + "attn.to_out.0.weight", dtype),
            "bo": _vec(st, b + "attn.to_out.0.bias", dtype),
            "ff1_w": _lin(st, b + "ff.ff.0.weight", dtype),
            "ff1_b": _vec(st, b + "ff.ff.0.bias", dtype),
            "ff2_w": _lin(st, b + "ff.ff.3.weight", dtype),
            "ff2_b": _vec(st, b + "ff.ff.3.bias", dtype),
        })
    return {
        "time_w1": _lin(st, p + "time_embed.time_mlp.0.weight", dtype),
        "time_b1": _vec(st, p + "time_embed.time_mlp.0.bias", dtype),
        "time_w2": _lin(st, p + "time_embed.time_mlp.2.weight", dtype),
        "time_b2": _vec(st, p + "time_embed.time_mlp.2.bias", dtype),
        "codec_embed": jnp.asarray(
            st.get_f32(p + "text_embed.codec_embed.weight"), dtype
        ),
        "in_proj_w": _lin(st, p + "input_embed.proj.weight", dtype),
        "in_proj_b": _vec(st, p + "input_embed.proj.bias", dtype),
        "spk_encoder": load_speaker_encoder(
            st, cfg.spk_encoder_config(), dtype,
            prefix=p + "input_embed.spk_encoder.",
        ),
        "layers": layers,
        "out_ada_w": _lin(st, p + "norm_out.linear.weight", dtype),
        "out_ada_b": _vec(st, p + "norm_out.linear.bias", dtype),
        "out_proj_w": _lin(st, p + "proj_out.weight", dtype),
        "out_proj_b": _vec(st, p + "proj_out.bias", dtype),
    }


def load_bigvgan(st: MultiSafeTensors, cfg: BigVGANConfig, dtype=jnp.float32) -> dict:
    p = "decoder.bigvgan."
    n_res = len(cfg.resblock_kernel_sizes)
    ups_w, ups_b, resblocks = [], [], []
    for li, _rate in enumerate(cfg.upsample_rates):
        ups_w.append(_tconv_w(st, f"{p}ups.{li}.0.weight", dtype))
        ups_b.append(_vec(st, f"{p}ups.{li}.0.bias", dtype))
        for bi in range(n_res):
            rb = f"{p}resblocks.{li * n_res + bi}."
            dil = cfg.resblock_dilation_sizes[bi]
            alphas, betas = [], []
            for j in range(2 * len(dil)):
                a, bta = _snake(st, rb + f"activations.{j}.act.", dtype)
                alphas.append(a)
                betas.append(bta)
            blk = {
                "conv1_w": jnp.stack([
                    _conv_w(st, rb + f"convs1.{j}.weight", dtype)
                    for j in range(len(dil))
                ]),
                "conv1_b": jnp.stack([
                    _vec(st, rb + f"convs1.{j}.bias", dtype)
                    for j in range(len(dil))
                ]),
                "conv2_w": jnp.stack([
                    _conv_w(st, rb + f"convs2.{j}.weight", dtype)
                    for j in range(len(dil))
                ]),
                "conv2_b": jnp.stack([
                    _vec(st, rb + f"convs2.{j}.bias", dtype)
                    for j in range(len(dil))
                ]),
                "act_alpha": jnp.stack(alphas),
                "act_beta": jnp.stack(betas),
            }
            if li <= 1:  # causal_type '2' blocks carry a pre-conv + pre-act
                blk["pre_conv_w"] = _conv_w(st, rb + "pre_conv.weight", dtype)
                blk["pre_conv_b"] = _vec(st, rb + "pre_conv.bias", dtype)
                pa, pb = _snake(st, rb + "pre_act.act.", dtype)
                blk["pre_alpha"], blk["pre_beta"] = pa, pb
            resblocks.append(blk)
    post_alpha, post_beta = _snake(st, p + "activation_post.act.", dtype)
    return {
        "pre_w": _conv_w(st, p + "conv_pre.weight", dtype),
        "pre_b": _vec(st, p + "conv_pre.bias", dtype),
        "ups_w": ups_w,
        "ups_b": ups_b,
        "resblocks": resblocks,
        "post_alpha": post_alpha,
        "post_beta": post_beta,
        "post_w": _conv_w(st, p + "conv_post.weight", dtype),
        "_filters": make_aa_filters(),
    }


def load_codec_v1(model_dir: str, cfg: CodecV1Config, dtype=jnp.float32) -> dict:
    st = MultiSafeTensors(model_dir)
    params = {
        "dit": load_dit(st, cfg.dit, dtype),
        "bigvgan": load_bigvgan(st, cfg.bigvgan, dtype),
    }
    st.close()
    return params
