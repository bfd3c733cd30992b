"""Synthesize a tiny 25 Hz (V1) speech-tokenizer checkpoint in the reference
on-disk format (torch layouts + reference tensor names)."""

from __future__ import annotations

import json
import os

import numpy as np
from safetensors.numpy import save_file

from qwen_tts_tpu.config import CodecV1Config


def _w(rng, *shape):
    return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)


def _encoder_tensors(rng, enc_cfg) -> dict:
    """Whisper-VQ encoder tensors under the reference encoder.tokenizer.* names."""
    t = {}
    p = "encoder.tokenizer."
    d = enc_cfg.n_state
    t[p + "conv1.weight"] = _w(rng, d, enc_cfg.n_mels, 3)
    t[p + "conv1.bias"] = _w(rng, d)
    t[p + "conv2.weight"] = _w(rng, d, d, 3)
    t[p + "conv2.bias"] = _w(rng, d)
    half = d // 2
    inc = np.log(10000) / (half - 1)
    scaled = np.arange(enc_cfg.n_ctx)[:, None] * np.exp(-inc * np.arange(half))[None, :]
    t[p + "positional_embedding"] = np.concatenate(
        [np.sin(scaled), np.cos(scaled)], axis=1
    ).astype(np.float32)
    for i in range(enc_cfg.n_layer):
        b = f"{p}blocks.{i}."
        t[b + "attn_ln.weight"] = np.ones(d, np.float32)
        t[b + "attn_ln.bias"] = np.zeros(d, np.float32)
        for proj, bias in (("query", True), ("key", False), ("value", True),
                           ("out", True)):
            t[b + f"attn.{proj}.weight"] = _w(rng, d, d)
            if bias:
                t[b + f"attn.{proj}.bias"] = _w(rng, d)
        t[b + "mlp_ln.weight"] = np.ones(d, np.float32)
        t[b + "mlp_ln.bias"] = np.zeros(d, np.float32)
        t[b + "mlp.0.weight"] = _w(rng, 4 * d, d)
        t[b + "mlp.0.bias"] = _w(rng, 4 * d)
        t[b + "mlp.2.weight"] = _w(rng, d, 4 * d)
        t[b + "mlp.2.bias"] = _w(rng, d)
    ds = enc_cfg.audio_vq_ds_rate
    if ds > 1:
        t[p + "audio_vq_downsample.weight"] = _w(rng, d, d, ds)
        t[p + "audio_vq_downsample.bias"] = _w(rng, d)
    t[p + "audio_quantizer.rvqs.0.embed"] = _w(
        rng, 1, enc_cfg.audio_vq_codebook_size, enc_cfg.audio_vq_codebook_dim
    )
    if enc_cfg.audio_vq_codebook_dim != d:
        t[p + "audio_quantizer.rvqs.0.layers.0.project_in.weight"] = _w(
            rng, enc_cfg.audio_vq_codebook_dim, d
        )
        t[p + "audio_quantizer.rvqs.0.layers.0.project_in.bias"] = _w(
            rng, enc_cfg.audio_vq_codebook_dim
        )
    return t


def make_v1_checkpoint(model_dir: str, cfg: CodecV1Config, enc_cfg=None) -> None:
    dit, bv = cfg.dit, cfg.bigvgan
    rng = np.random.default_rng(7)
    t = {}
    p = "decoder.dit."

    t[p + "time_embed.time_mlp.0.weight"] = _w(rng, dit.hidden_size, 256)
    t[p + "time_embed.time_mlp.0.bias"] = _w(rng, dit.hidden_size)
    t[p + "time_embed.time_mlp.2.weight"] = _w(rng, dit.hidden_size, dit.hidden_size)
    t[p + "time_embed.time_mlp.2.bias"] = _w(rng, dit.hidden_size)
    t[p + "text_embed.codec_embed.weight"] = _w(rng, dit.num_embeds + 1, dit.emb_dim)
    in_dim = dit.mel_dim + dit.enc_dim + dit.enc_emb_dim + dit.emb_dim
    t[p + "input_embed.proj.weight"] = _w(rng, dit.hidden_size, in_dim)
    t[p + "input_embed.proj.bias"] = _w(rng, dit.hidden_size)

    # ECAPA spk encoder inside the DiT input embedding.
    se = dit.spk_encoder_config()
    sp = p + "input_embed.spk_encoder."

    def conv(name, cin, cout, k):
        t[sp + name + ".weight"] = _w(rng, cout, cin, k)
        t[sp + name + ".bias"] = _w(rng, cout)

    ch, ks = se.enc_channels, se.enc_kernel_sizes
    conv("blocks.0.conv", se.mel_dim, ch[0], ks[0])
    for i in range(1, len(ch) - 1):
        conv(f"blocks.{i}.tdnn1.conv", ch[i - 1], ch[i], 1)
        for j in range(se.enc_res2net_scale - 1):
            conv(f"blocks.{i}.res2net_block.blocks.{j}.conv",
                 ch[i] // se.enc_res2net_scale, ch[i] // se.enc_res2net_scale, ks[i])
        conv(f"blocks.{i}.tdnn2.conv", ch[i], ch[i], 1)
        conv(f"blocks.{i}.se_block.conv1", ch[i], se.enc_se_channels, 1)
        conv(f"blocks.{i}.se_block.conv2", se.enc_se_channels, ch[i], 1)
    conv("mfa.conv", sum(ch[1:-1]), ch[-1], ks[-1])
    conv("asp.tdnn.conv", ch[-1] * 3, se.enc_attention_channels, 1)
    conv("asp.conv", se.enc_attention_channels, ch[-1], 1)
    conv("fc", ch[-1] * 2, se.enc_dim, 1)

    qd = dit.num_attention_heads * dit.head_dim
    for i in range(dit.num_hidden_layers):
        b = f"{p}transformer_blocks.{i}."
        t[b + "attn_norm.linear.weight"] = _w(rng, 6 * dit.hidden_size, dit.hidden_size)
        t[b + "attn_norm.linear.bias"] = _w(rng, 6 * dit.hidden_size)
        for proj in ("to_q", "to_k", "to_v"):
            t[b + f"attn.{proj}.weight"] = _w(rng, qd, dit.hidden_size)
            t[b + f"attn.{proj}.bias"] = _w(rng, qd)
        t[b + "attn.to_out.0.weight"] = _w(rng, dit.hidden_size, qd)
        t[b + "attn.to_out.0.bias"] = _w(rng, dit.hidden_size)
        t[b + "ff.ff.0.weight"] = _w(rng, dit.hidden_size * dit.ff_mult, dit.hidden_size)
        t[b + "ff.ff.0.bias"] = _w(rng, dit.hidden_size * dit.ff_mult)
        t[b + "ff.ff.3.weight"] = _w(rng, dit.hidden_size, dit.hidden_size * dit.ff_mult)
        t[b + "ff.ff.3.bias"] = _w(rng, dit.hidden_size)
    t[p + "norm_out.linear.weight"] = _w(rng, 2 * dit.hidden_size, dit.hidden_size)
    t[p + "norm_out.linear.bias"] = _w(rng, 2 * dit.hidden_size)
    t[p + "proj_out.weight"] = _w(rng, dit.mel_dim, dit.hidden_size)
    t[p + "proj_out.bias"] = _w(rng, dit.mel_dim)

    # BigVGAN
    g = "decoder.bigvgan."
    c0 = bv.upsample_initial_channel
    t[g + "conv_pre.weight"] = _w(rng, c0, bv.mel_dim, 5)
    t[g + "conv_pre.bias"] = _w(rng, c0)
    n_res = len(bv.resblock_kernel_sizes)
    for li, (rate, k) in enumerate(zip(bv.upsample_rates, bv.upsample_kernel_sizes)):
        cin, cout = c0 // (2 ** li), c0 // (2 ** (li + 1))
        t[g + f"ups.{li}.0.weight"] = _w(rng, cin, cout, k)
        t[g + f"ups.{li}.0.bias"] = _w(rng, cout)
        for bi in range(n_res):
            rb = f"{g}resblocks.{li * n_res + bi}."
            ksz = bv.resblock_kernel_sizes[bi]
            dil = bv.resblock_dilation_sizes[bi]
            for j in range(len(dil)):
                t[rb + f"convs1.{j}.weight"] = _w(rng, cout, cout, ksz)
                t[rb + f"convs1.{j}.bias"] = _w(rng, cout)
                t[rb + f"convs2.{j}.weight"] = _w(rng, cout, cout, ksz)
                t[rb + f"convs2.{j}.bias"] = _w(rng, cout)
            for j in range(2 * len(dil)):
                t[rb + f"activations.{j}.act.alpha"] = (
                    0.1 * rng.standard_normal(cout)).astype(np.float32)
                t[rb + f"activations.{j}.act.beta"] = (
                    0.1 * rng.standard_normal(cout)).astype(np.float32)
            if li <= 1:
                t[rb + "pre_conv.weight"] = _w(rng, cout, cout, ksz)
                t[rb + "pre_conv.bias"] = _w(rng, cout)
                t[rb + "pre_act.act.alpha"] = (
                    0.1 * rng.standard_normal(cout)).astype(np.float32)
                t[rb + "pre_act.act.beta"] = (
                    0.1 * rng.standard_normal(cout)).astype(np.float32)
    c_last = c0 // (2 ** len(bv.upsample_rates))
    t[g + "activation_post.act.alpha"] = (0.1 * rng.standard_normal(c_last)).astype(np.float32)
    t[g + "activation_post.act.beta"] = (0.1 * rng.standard_normal(c_last)).astype(np.float32)
    t[g + "conv_post.weight"] = _w(rng, 1, c_last, 7)

    enc_cfg_json = None
    if enc_cfg is not None:
        t.update(_encoder_tensors(rng, enc_cfg))
        import dataclasses as _dc

        enc_cfg_json = _dc.asdict(enc_cfg)

    os.makedirs(model_dir, exist_ok=True)
    save_file(t, os.path.join(model_dir, "model.safetensors"))
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_tts_tokenizer_25hz",
            **({"encoder_config": enc_cfg_json} if enc_cfg_json else {}),
            "decoder_config": {
                "dit_config": {
                    "hidden_size": dit.hidden_size,
                    "num_hidden_layers": dit.num_hidden_layers,
                    "num_attention_heads": dit.num_attention_heads,
                    "ff_mult": dit.ff_mult,
                    "emb_dim": dit.emb_dim,
                    "head_dim": dit.head_dim,
                    "block_size": dit.block_size,
                    "look_ahead_layers": list(dit.look_ahead_layers),
                    "look_backward_layers": list(dit.look_backward_layers),
                    "repeats": dit.repeats,
                    "num_embeds": dit.num_embeds,
                    "mel_dim": dit.mel_dim,
                    "enc_emb_dim": dit.enc_emb_dim,
                    "enc_dim": dit.enc_dim,
                    "enc_channels": list(dit.enc_channels),
                    "enc_kernel_sizes": list(dit.enc_kernel_sizes),
                    "enc_dilations": list(dit.enc_dilations),
                    "enc_attention_channels": dit.enc_attention_channels,
                    "enc_res2net_scale": dit.enc_res2net_scale,
                    "enc_se_channels": dit.enc_se_channels,
                },
                "bigvgan_config": {
                    "mel_dim": bv.mel_dim,
                    "upsample_initial_channel": bv.upsample_initial_channel,
                    "resblock_kernel_sizes": list(bv.resblock_kernel_sizes),
                    "resblock_dilation_sizes": [list(d) for d in bv.resblock_dilation_sizes],
                    "upsample_rates": list(bv.upsample_rates),
                    "upsample_kernel_sizes": list(bv.upsample_kernel_sizes),
                },
            },
            "input_sample_rate": cfg.input_sample_rate,
            "output_sample_rate": cfg.output_sample_rate,
            "decode_upsample_rate": cfg.decode_upsample_rate,
            "encode_downsample_rate": cfg.encode_downsample_rate,
        }, f)
