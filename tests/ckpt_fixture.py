"""Synthesize a tiny random-weight checkpoint in the reference's on-disk
format (torch tensor layouts + reference tensor names + config.json layout),
so loader/pipeline/CLI tests run without the real model — the tiny-fixture
strategy SURVEY.md §4 calls for."""

from __future__ import annotations

import json
import os

import numpy as np
from safetensors.numpy import save_file

from qwen_tts_tpu.config import TTSConfig, tiny_tts_config


def _w(rng, *shape):
    return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)


TINY_MIMI_CONFIG = dict(
    sampling_rate=24000,
    audio_channels=1,
    hidden_size=32,
    num_filters=8,
    num_residual_layers=1,
    upsampling_ratios=[4, 3, 2],
    codebook_size=128,
    codebook_dim=16,
    num_quantizers=8,  # == tiny num_code_groups so ICL ref codes line up
    use_causal_conv=True,
    num_hidden_layers=1,
    num_attention_heads=4,
    num_key_value_heads=4,
    head_dim=8,
    intermediate_size=64,
    sliding_window=16,
    vector_quantization_hidden_dimension=16,
    num_semantic_quantizers=1,
    upsample_groups=32,
)


def _speaker_encoder_tensors(rng, cfg: TTSConfig) -> dict:
    """Tiny ECAPA-TDNN weights under the reference's speaker_encoder.* names."""
    se = cfg.speaker_encoder
    t = {}

    def conv(name, cin, cout, k):
        t[f"speaker_encoder.{name}.weight"] = _w(rng, cout, cin, k)
        t[f"speaker_encoder.{name}.bias"] = _w(rng, cout)

    ch, ks = se.enc_channels, se.enc_kernel_sizes
    conv("blocks.0.conv", se.mel_dim, ch[0], ks[0])
    for i in range(1, len(ch) - 1):
        scale = se.enc_res2net_scale
        conv(f"blocks.{i}.tdnn1.conv", ch[i - 1], ch[i], 1)
        for j in range(scale - 1):
            conv(f"blocks.{i}.res2net_block.blocks.{j}.conv",
                 ch[i] // scale, ch[i] // scale, ks[i])
        conv(f"blocks.{i}.tdnn2.conv", ch[i], ch[i], 1)
        conv(f"blocks.{i}.se_block.conv1", ch[i], se.enc_se_channels, 1)
        conv(f"blocks.{i}.se_block.conv2", se.enc_se_channels, ch[i], 1)
    conv("mfa.conv", sum(ch[1:-1]), ch[-1], ks[-1])
    conv("asp.tdnn.conv", ch[-1] * 3, se.enc_attention_channels, 1)
    conv("asp.conv", se.enc_attention_channels, ch[-1], 1)
    conv("fc", ch[-1] * 2, se.enc_dim, 1)
    return t


def make_checkpoint(
    model_dir: str, cfg: TTSConfig | None = None, *, with_encoders: bool = False
) -> TTSConfig:
    cfg = cfg or tiny_tts_config()
    tk, cp, dec = cfg.talker, cfg.talker.code_predictor, cfg.codec.decoder
    rng = np.random.default_rng(42)
    t = {}

    # ---- talker ----------------------------------------------------------
    t["talker.model.codec_embedding.weight"] = _w(rng, tk.vocab_size, tk.hidden_size)
    t["talker.model.text_embedding.weight"] = _w(rng, tk.text_vocab_size, tk.text_hidden_size)
    t["talker.text_projection.linear_fc1.weight"] = _w(rng, tk.text_hidden_size, tk.text_hidden_size)
    t["talker.text_projection.linear_fc1.bias"] = _w(rng, tk.text_hidden_size)
    t["talker.text_projection.linear_fc2.weight"] = _w(rng, tk.hidden_size, tk.text_hidden_size)
    t["talker.text_projection.linear_fc2.bias"] = _w(rng, tk.hidden_size)

    def trunk(prefix, L, d, qd, kvd, inter, hd):
        for l in range(L):
            p = f"{prefix}.layers.{l}."
            t[p + "self_attn.q_proj.weight"] = _w(rng, qd, d)
            t[p + "self_attn.k_proj.weight"] = _w(rng, kvd, d)
            t[p + "self_attn.v_proj.weight"] = _w(rng, kvd, d)
            t[p + "self_attn.o_proj.weight"] = _w(rng, d, qd)
            t[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            t[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            t[p + "input_layernorm.weight"] = np.ones(d, np.float32)
            t[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
            t[p + "mlp.gate_proj.weight"] = _w(rng, inter, d)
            t[p + "mlp.up_proj.weight"] = _w(rng, inter, d)
            t[p + "mlp.down_proj.weight"] = _w(rng, d, inter)

    trunk("talker.model", tk.num_hidden_layers, tk.hidden_size, tk.q_dim,
          tk.kv_dim, tk.intermediate_size, tk.head_dim)
    t["talker.model.norm.weight"] = np.ones(tk.hidden_size, np.float32)
    t["talker.codec_head.weight"] = _w(rng, tk.vocab_size, tk.hidden_size)

    # ---- code predictor ----------------------------------------------------
    trunk("talker.code_predictor.model", cp.num_hidden_layers, cp.hidden_size,
          cp.num_attention_heads * cp.head_dim, cp.num_key_value_heads * cp.head_dim,
          cp.intermediate_size, cp.head_dim)
    t["talker.code_predictor.model.norm.weight"] = np.ones(cp.hidden_size, np.float32)
    for i in range(cp.num_code_groups - 1):
        t[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = _w(
            rng, cp.vocab_size, tk.hidden_size
        )
        t[f"talker.code_predictor.lm_head.{i}.weight"] = _w(
            rng, cp.vocab_size, cp.hidden_size
        )

    if with_encoders:
        t.update(_speaker_encoder_tensors(rng, cfg))

    os.makedirs(model_dir, exist_ok=True)
    save_file(t, os.path.join(model_dir, "model.safetensors"))

    talker_cfg = {
        "vocab_size": tk.vocab_size,
        "hidden_size": tk.hidden_size,
        "intermediate_size": tk.intermediate_size,
        "num_hidden_layers": tk.num_hidden_layers,
        "num_attention_heads": tk.num_attention_heads,
        "num_key_value_heads": tk.num_key_value_heads,
        "head_dim": tk.head_dim,
        "rms_norm_eps": tk.rms_norm_eps,
        "rope_theta": tk.rope_theta,
        "rope_scaling": {"mrope_section": list(tk.mrope_section),
                         "interleaved": False, "rope_type": "default"},
        "num_code_groups": tk.num_code_groups,
        "text_hidden_size": tk.text_hidden_size,
        "text_vocab_size": tk.text_vocab_size,
        "codec_eos_token_id": tk.codec_eos_token_id,
        "codec_think_id": tk.codec_think_id,
        "codec_nothink_id": tk.codec_nothink_id,
        "codec_think_bos_id": tk.codec_think_bos_id,
        "codec_think_eos_id": tk.codec_think_eos_id,
        "codec_pad_id": tk.codec_pad_id,
        "codec_bos_id": tk.codec_bos_id,
        # Not a reference config key (the reference hardcodes a 1024-id ban,
        # modeling_qwen3_tts.py:2059-2063); round-trips the scaled tiny tail
        # through TTSConfig.from_pretrained. PretrainedConfig ignores it.
        "suppress_tail": tk.suppress_tail,
        "spk_id": dict(tk.spk_id),
        "spk_is_dialect": {k: (v if v else False) for k, v in tk.spk_is_dialect},
        "codec_language_id": dict(tk.codec_language_id),
        "code_predictor_config": {
            "vocab_size": cp.vocab_size,
            "hidden_size": cp.hidden_size,
            "intermediate_size": cp.intermediate_size,
            "num_hidden_layers": cp.num_hidden_layers,
            "num_attention_heads": cp.num_attention_heads,
            "num_key_value_heads": cp.num_key_value_heads,
            "head_dim": cp.head_dim,
            "num_code_groups": cp.num_code_groups,
        },
    }
    se = cfg.speaker_encoder
    speaker_cfg = {
        "mel_dim": se.mel_dim,
        "enc_dim": se.enc_dim,
        "enc_channels": list(se.enc_channels),
        "enc_kernel_sizes": list(se.enc_kernel_sizes),
        "enc_dilations": list(se.enc_dilations),
        "enc_attention_channels": se.enc_attention_channels,
        "enc_res2net_scale": se.enc_res2net_scale,
        "enc_se_channels": se.enc_se_channels,
        "sample_rate": se.sample_rate,
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_tts",
            "tts_model_type": "base" if with_encoders else cfg.tts_model_type,
            "speaker_encoder_config": speaker_cfg,
            "talker_config": talker_cfg,
            "im_start_token_id": cfg.im_start_token_id,
            "im_end_token_id": cfg.im_end_token_id,
            "tts_pad_token_id": cfg.tts_pad_token_id,
            "tts_bos_token_id": cfg.tts_bos_token_id,
            "tts_eos_token_id": cfg.tts_eos_token_id,
        }, f)
    with open(os.path.join(model_dir, "generation_config.json"), "w") as f:
        json.dump({"max_new_tokens": 16, "top_k": 2, "temperature": 0.9,
                   "repetition_penalty": 1.05, "do_sample": True}, f)

    # ---- speech tokenizer (codec) -----------------------------------------
    c = {}
    vq_dim = dec.codebook_dim // 2
    c["decoder.quantizer.rvq_first.output_proj.weight"] = _w(rng, dec.codebook_dim, vq_dim)[..., None]
    # Encode-direction projections (unused by decode but present on disk —
    # modeling_...v2.py:758-760 Conv1d(input_dim, dim, 1)).
    c["decoder.quantizer.rvq_first.input_proj.weight"] = _w(rng, vq_dim, dec.codebook_dim)[..., None]
    c["decoder.quantizer.rvq_rest.input_proj.weight"] = _w(rng, vq_dim, dec.codebook_dim)[..., None]
    c["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"] = (
        np.abs(rng.standard_normal(dec.codebook_size)) + 0.5
    ).astype(np.float32)
    c["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"] = _w(
        rng, dec.codebook_size, vq_dim
    )
    c["decoder.quantizer.rvq_rest.output_proj.weight"] = _w(rng, dec.codebook_dim, vq_dim)[..., None]
    for i in range(dec.num_quantizers - 1):
        c[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.cluster_usage"] = (
            np.abs(rng.standard_normal(dec.codebook_size)) + 0.5
        ).astype(np.float32)
        c[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding_sum"] = _w(
            rng, dec.codebook_size, vq_dim
        )

    c["decoder.pre_conv.conv.weight"] = _w(rng, dec.latent_dim, dec.codebook_dim, 3)
    c["decoder.pre_conv.conv.bias"] = _w(rng, dec.latent_dim)
    c["decoder.pre_transformer.input_proj.weight"] = _w(rng, dec.hidden_size, dec.latent_dim)
    c["decoder.pre_transformer.input_proj.bias"] = _w(rng, dec.hidden_size)
    c["decoder.pre_transformer.output_proj.weight"] = _w(rng, dec.latent_dim, dec.hidden_size)
    c["decoder.pre_transformer.output_proj.bias"] = _w(rng, dec.latent_dim)
    for l in range(dec.num_hidden_layers):
        p = f"decoder.pre_transformer.layers.{l}."
        qd = dec.num_attention_heads * dec.head_dim
        c[p + "self_attn.q_proj.weight"] = _w(rng, qd, dec.hidden_size)
        c[p + "self_attn.k_proj.weight"] = _w(rng, qd, dec.hidden_size)
        c[p + "self_attn.v_proj.weight"] = _w(rng, qd, dec.hidden_size)
        c[p + "self_attn.o_proj.weight"] = _w(rng, dec.hidden_size, qd)
        c[p + "input_layernorm.weight"] = np.ones(dec.hidden_size, np.float32)
        c[p + "post_attention_layernorm.weight"] = np.ones(dec.hidden_size, np.float32)
        c[p + "mlp.gate_proj.weight"] = _w(rng, dec.intermediate_size, dec.hidden_size)
        c[p + "mlp.up_proj.weight"] = _w(rng, dec.intermediate_size, dec.hidden_size)
        c[p + "mlp.down_proj.weight"] = _w(rng, dec.hidden_size, dec.intermediate_size)
        c[p + "self_attn_layer_scale.scale"] = np.full(dec.hidden_size, 0.01, np.float32)
        c[p + "mlp_layer_scale.scale"] = np.full(dec.hidden_size, 0.01, np.float32)
    c["decoder.pre_transformer.norm.weight"] = np.ones(dec.hidden_size, np.float32)

    for i, factor in enumerate(dec.upsampling_ratios):
        p = f"decoder.upsample.{i}."
        c[p + "0.conv.weight"] = _w(rng, dec.latent_dim, dec.latent_dim, factor)
        c[p + "0.conv.bias"] = _w(rng, dec.latent_dim)
        c[p + "1.dwconv.conv.weight"] = _w(rng, dec.latent_dim, 1, 7)
        c[p + "1.dwconv.conv.bias"] = _w(rng, dec.latent_dim)
        c[p + "1.norm.weight"] = np.ones(dec.latent_dim, np.float32)
        c[p + "1.norm.bias"] = np.zeros(dec.latent_dim, np.float32)
        c[p + "1.pwconv1.weight"] = _w(rng, 4 * dec.latent_dim, dec.latent_dim)
        c[p + "1.pwconv1.bias"] = _w(rng, 4 * dec.latent_dim)
        c[p + "1.pwconv2.weight"] = _w(rng, dec.latent_dim, 4 * dec.latent_dim)
        c[p + "1.pwconv2.bias"] = _w(rng, dec.latent_dim)
        c[p + "1.gamma"] = np.full(dec.latent_dim, 1e-6, np.float32)

    c["decoder.decoder.0.conv.weight"] = _w(rng, dec.decoder_dim, dec.latent_dim, 7)
    c["decoder.decoder.0.conv.bias"] = _w(rng, dec.decoder_dim)
    for i, rate in enumerate(dec.upsample_rates):
        in_dim = dec.decoder_dim // (2 ** i)
        out_dim = dec.decoder_dim // (2 ** (i + 1))
        p = f"decoder.decoder.{i + 1}.block."
        c[p + "0.alpha"] = (0.1 * rng.standard_normal(in_dim)).astype(np.float32)
        c[p + "0.beta"] = (0.1 * rng.standard_normal(in_dim)).astype(np.float32)
        c[p + "1.conv.weight"] = _w(rng, in_dim, out_dim, 2 * rate)
        c[p + "1.conv.bias"] = _w(rng, out_dim)
        for r in range(3):
            u = f"{p}{r + 2}."
            c[u + "act1.alpha"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
            c[u + "act1.beta"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
            c[u + "conv1.conv.weight"] = _w(rng, out_dim, out_dim, 7)
            c[u + "conv1.conv.bias"] = _w(rng, out_dim)
            c[u + "act2.alpha"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
            c[u + "act2.beta"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
            c[u + "conv2.conv.weight"] = _w(rng, out_dim, out_dim, 1)
            c[u + "conv2.conv.bias"] = _w(rng, out_dim)
    n_blocks = len(dec.upsample_rates)
    out_dim = dec.decoder_dim // (2 ** n_blocks)
    c[f"decoder.decoder.{n_blocks + 1}.alpha"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
    c[f"decoder.decoder.{n_blocks + 1}.beta"] = (0.1 * rng.standard_normal(out_dim)).astype(np.float32)
    c[f"decoder.decoder.{n_blocks + 2}.conv.weight"] = _w(rng, 1, out_dim, 7)
    c[f"decoder.decoder.{n_blocks + 2}.conv.bias"] = _w(rng, 1)

    encoder_cfg_json = None
    if with_encoders:
        import torch
        from transformers import MimiConfig, MimiModel

        mimi = MimiModel(MimiConfig(**TINY_MIMI_CONFIG))
        with torch.no_grad():
            for name, param in mimi.state_dict().items():
                c["encoder." + name] = param.numpy().astype(np.float32)
        encoder_cfg_json = TINY_MIMI_CONFIG

    st_dir = os.path.join(model_dir, "speech_tokenizer")
    os.makedirs(st_dir, exist_ok=True)
    save_file(c, os.path.join(st_dir, "model.safetensors"))
    with open(os.path.join(st_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_tts_tokenizer_12hz",
            **({"encoder_config": encoder_cfg_json} if encoder_cfg_json else {}),
            "decoder_config": {
                "codebook_size": dec.codebook_size,
                "codebook_dim": dec.codebook_dim,
                "hidden_size": dec.hidden_size,
                "latent_dim": dec.latent_dim,
                "num_attention_heads": dec.num_attention_heads,
                "num_key_value_heads": dec.num_key_value_heads,
                "sliding_window": dec.sliding_window,
                "intermediate_size": dec.intermediate_size,
                "layer_scale_initial_scale": dec.layer_scale_initial_scale,
                "rms_norm_eps": dec.rms_norm_eps,
                "num_hidden_layers": dec.num_hidden_layers,
                "num_quantizers": dec.num_quantizers,
                "upsample_rates": list(dec.upsample_rates),
                "upsampling_ratios": list(dec.upsampling_ratios),
                "decoder_dim": dec.decoder_dim,
            },
            "encoder_valid_num_quantizers": cfg.codec.encoder_valid_num_quantizers,
            "input_sample_rate": cfg.codec.input_sample_rate,
            "output_sample_rate": cfg.codec.output_sample_rate,
            "decode_upsample_rate": cfg.codec.decode_upsample_rate,
            "encode_downsample_rate": cfg.codec.encode_downsample_rate,
        }, f)
    return cfg
