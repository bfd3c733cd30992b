"""Independent torch oracle for the 25 Hz (V1) codec decoder — written from
the documented architecture equations (AdaLN-Zero DiT with block-local
attention + interleaved RoPE; anti-aliased BigVGAN), consuming the JAX-side
parameter pytrees (numpy) so both implementations share weights."""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

import torch_ref as ref2  # ECAPA oracle pieces live in the main torch_ref


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


# -- RoPE (interleaved pairs) ------------------------------------------------

def interleaved_rope_tables(seq_len, head_dim, theta):
    inv_freq = 1.0 / (theta ** (torch.arange(0, head_dim, 2).float() / head_dim))
    freqs = torch.arange(seq_len).float()[:, None] @ inv_freq[None, :]
    freqs = torch.stack([freqs, freqs], dim=-1).reshape(seq_len, head_dim)
    return freqs.cos(), freqs.sin()


def rotate_pairs(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(-1)
    return torch.stack([-x2, x1], dim=-1).reshape(*x.shape[:-2], -1)


# -- DiT ---------------------------------------------------------------------

def dit_forward(params, cfg, noisy_mel, spk_summary, code_embed, xvec, t_step):
    h = cfg.hidden_size
    half = 128
    emb = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half).float() * -emb)
    arg = 1000.0 * t(t_step)[:, None] * freqs[None, :]
    time_emb = torch.cat([arg.sin(), arg.cos()], dim=-1)
    time_emb = F.silu(time_emb @ t(params["time_w1"]) + t(params["time_b1"]))
    time_emb = time_emb @ t(params["time_w2"]) + t(params["time_b2"])

    x = torch.cat([t(noisy_mel), t(spk_summary), t(code_embed), t(xvec)], dim=-1)
    x = x @ t(params["in_proj_w"]) + t(params["in_proj_b"])

    seq = x.shape[1]
    cos, sin = interleaved_rope_tables(seq, cfg.head_dim, cfg.rope_theta)
    blocks = torch.arange(seq) // cfg.block_size
    diff = blocks[None, :] - blocks[:, None]

    for i, layer in enumerate(params["layers"]):
        look_ahead = 1 if i in cfg.look_ahead_layers else 0
        look_back = 1 if i in cfg.look_backward_layers else 0
        mask = (diff >= -look_back) & (diff <= look_ahead)

        mod = F.silu(time_emb) @ t(layer["ada_w"]) + t(layer["ada_b"])
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = mod.chunk(6, dim=-1)
        normed = F.layer_norm(x, (h,), eps=1e-6) * (1 + sc_m[:, None]) + sh_m[:, None]

        b_, s_, _ = normed.shape
        q = (normed @ t(layer["wq"]) + t(layer["bq"])).view(
            b_, s_, cfg.num_attention_heads, cfg.head_dim)
        k = (normed @ t(layer["wk"]) + t(layer["bk"])).view(
            b_, s_, cfg.num_attention_heads, cfg.head_dim)
        v = (normed @ t(layer["wv"]) + t(layer["bv"])).view(
            b_, s_, cfg.num_attention_heads, cfg.head_dim)
        q = q * cos[None, :, None] + rotate_pairs(q) * sin[None, :, None]
        k = k * cos[None, :, None] + rotate_pairs(k) * sin[None, :, None]
        scores = torch.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(cfg.head_dim)
        scores = scores.masked_fill(~mask[None, None], float("-inf"))
        attn = torch.einsum("bhij,bjhd->bihd", scores.softmax(-1), v)
        attn = attn.reshape(b_, s_, -1) @ t(layer["wo"]) + t(layer["bo"])
        x = x + g_m[:, None] * attn

        normed = F.layer_norm(x, (h,), eps=1e-6) * (1 + sc_f[:, None]) + sh_f[:, None]
        ff = normed @ t(layer["ff1_w"]) + t(layer["ff1_b"])
        ff = F.gelu(ff, approximate="tanh")
        ff = ff @ t(layer["ff2_w"]) + t(layer["ff2_b"])
        x = x + g_f[:, None] * ff

    mod = F.silu(time_emb) @ t(params["out_ada_w"]) + t(params["out_ada_b"])
    scale, shift = mod.chunk(2, dim=-1)
    x = F.layer_norm(x, (h,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    return x @ t(params["out_proj_w"]) + t(params["out_proj_b"])


# -- BigVGAN -----------------------------------------------------------------

def upsample1d(x_tc, filt, ratio=2):
    """x_tc: torch [B, C, T]. Mirrors UpSample1d (:785-807)."""
    k = filt.shape[-1]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    c = x_tc.shape[1]
    x = F.pad(x_tc, (pad, pad), mode="replicate")
    x = ratio * F.conv_transpose1d(
        x, t(filt).view(1, 1, -1).expand(c, -1, -1), stride=ratio, groups=c
    )
    return x[..., pad_left:-pad_right]


def downsample1d(x_tc, filt, ratio=2):
    k = filt.shape[-1]
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    c = x_tc.shape[1]
    x = F.pad(x_tc, (pad_left, pad_right), mode="replicate")
    return F.conv1d(x, t(filt).view(1, 1, -1).expand(c, -1, -1),
                    stride=ratio, groups=c)


def aa_snake(x_tc, alpha, beta, up_f, dn_f):
    h = upsample1d(x_tc, up_f)
    h = h + torch.sin(h * t(alpha)[None, :, None]) ** 2 / (t(beta)[None, :, None] + 1e-9)
    return downsample1d(h, dn_f)


def conv1d_same(x_tc, w_jax, b, dilation=1):
    k = w_jax.shape[0]
    pad = (k * dilation - dilation) // 2
    wt = t(w_jax).permute(2, 1, 0)
    return F.conv1d(x_tc, wt, t(b) if b is not None else None,
                    padding=pad, dilation=dilation)


def conv1d_causal(x_tc, w_jax, b, dilation=1):
    k = w_jax.shape[0]
    wt = t(w_jax).permute(2, 1, 0)
    x = F.pad(x_tc, (dilation * (k - 1), 0))
    return F.conv1d(x, wt, t(b), dilation=dilation)


def conv_transpose_same(x_tc, w_jax, b, stride):
    k = w_jax.shape[0]
    wt = t(np.flip(np.asarray(w_jax), 0).copy()).permute(1, 2, 0)  # [in,out,k]
    return F.conv_transpose1d(x_tc, wt, t(b), stride=stride,
                              padding=(k - stride) // 2)


def amp_block(p, x_tc, dilations, causal_type, filters):
    up_f, dn_f = np.asarray(filters["up"]), np.asarray(filters["down"])
    if causal_type == "2":
        h = conv1d_same(x_tc, p["pre_conv_w"], p["pre_conv_b"])
        h = aa_snake(h, p["pre_alpha"], p["pre_beta"], up_f, dn_f)
    else:
        h = x_tc
    out = x_tc
    for j, dilation in enumerate(dilations):
        h = aa_snake(h, np.asarray(p["act_alpha"])[2 * j],
                     np.asarray(p["act_beta"])[2 * j], up_f, dn_f)
        h = conv1d_causal(h, np.asarray(p["conv1_w"])[j],
                          np.asarray(p["conv1_b"])[j], dilation)
        h = aa_snake(h, np.asarray(p["act_alpha"])[2 * j + 1],
                     np.asarray(p["act_beta"])[2 * j + 1], up_f, dn_f)
        if causal_type == "1":
            h = conv1d_same(h, np.asarray(p["conv2_w"])[j],
                            np.asarray(p["conv2_b"])[j])
        else:
            h = conv1d_causal(h, np.asarray(p["conv2_w"])[j],
                              np.asarray(p["conv2_b"])[j])
        out = out + h
    return out


def bigvgan_forward(params, cfg, mel_btc):
    amplitude = torch.exp(t(mel_btc))
    min_level = math.exp(-115 / 20.0 * math.log(10))
    db = 20.0 * torch.log10(torch.clamp(amplitude, min=min_level)) - 20.0
    x = torch.clamp(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)

    x = conv1d_same(x.permute(0, 2, 1), params["pre_w"], params["pre_b"])
    n_res = len(cfg.resblock_kernel_sizes)
    for li, rate in enumerate(cfg.upsample_rates):
        x = conv_transpose_same(x, np.asarray(params["ups_w"][li]),
                                np.asarray(params["ups_b"][li]), rate)
        acc = None
        for bi in range(n_res):
            block = params["resblocks"][li * n_res + bi]
            r = amp_block(block, x, cfg.resblock_dilation_sizes[bi],
                          "1" if li > 1 else "2", params["_filters"])
            acc = r if acc is None else acc + r
        x = acc / n_res
    x = aa_snake(x, params["post_alpha"], params["post_beta"],
                 np.asarray(params["_filters"]["up"]),
                 np.asarray(params["_filters"]["down"]))
    x = conv1d_same(x, params["post_w"], None)
    return torch.clamp(x.squeeze(1), -1.0, 1.0)
