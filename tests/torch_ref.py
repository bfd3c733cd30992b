"""Independent PyTorch oracle implementations for numerics tests.

These are written directly from the architecture equations (RMSNorm, GQA with
per-head QK-norm, rotate-half RoPE, SwiGLU, LayerScale, ConvNeXt, SnakeBeta,
split-RVQ) so the JAX implementations are validated against a second,
independently written realization of the same math — the same oracle pattern
the reference uses (C validated against Python, SURVEY.md §4), with torch-CPU
standing in for the Python reference since no checkpoint ships in this repo.

Parameters come in as numpy arrays using the JAX-side layouts ([in, out]
linears, [K, Cin, Cout] convs) and are converted to torch conventions here.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def rms_norm(x: torch.Tensor, w: torch.Tensor, eps: float) -> torch.Tensor:
    var = x.pow(2).mean(-1, keepdim=True)
    return w * (x * torch.rsqrt(var + eps))


def rotate_half(x: torch.Tensor) -> torch.Tensor:
    half = x.shape[-1] // 2
    return torch.cat([-x[..., half:], x[..., :half]], dim=-1)


def rope_cos_sin(positions: torch.Tensor, head_dim: int, theta: float):
    inv_freq = 1.0 / (theta ** (torch.arange(0, head_dim, 2).float() / head_dim))
    freqs = positions.float()[..., None] * inv_freq
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
    return x * cos + rotate_half(x) * sin


def gqa_attention(q, k, v, pad_mask=None, sliding_window=None):
    """q: [B,S,H,hd]; k/v: [B,S,KV,hd]; returns [B,S,H,hd]. Causal."""
    b, s, h, hd = q.shape
    kv = k.shape[2]
    rep = h // kv
    k = k.repeat_interleave(rep, dim=2)
    v = v.repeat_interleave(rep, dim=2)
    q = q.permute(0, 2, 1, 3)
    k = k.permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3)
    scores = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
    i = torch.arange(s)[:, None]
    j = torch.arange(s)[None, :]
    allowed = j <= i
    if sliding_window is not None:
        allowed = allowed & (j > i - sliding_window)
    mask = allowed[None, None]
    if pad_mask is not None:
        mask = mask & pad_mask[:, None, None, :].bool()
    scores = scores.masked_fill(~mask, float("-inf"))
    probs = scores.softmax(-1)
    out = probs @ v
    return out.permute(0, 2, 1, 3)


def trunk_forward(params, x, cos, sin, eps, head_dim, pad_mask=None,
                  sliding_window=None, qk_norm=True):
    """Full-sequence trunk forward. params: JAX-side pytree (numpy arrays) with
    stacked [L, ...] weights. x: [B,S,D]. cos/sin: [B,S,hd]."""
    num_layers = params["wq"].shape[0]
    h = x
    for l in range(num_layers):
        lw = {k: t(v[l]) for k, v in params.items()}
        xin = rms_norm(h, lw["input_norm"], eps)
        b, s, d = xin.shape
        hd = head_dim
        q = xin @ lw["wq"]
        k = xin @ lw["wk"]
        v = xin @ lw["wv"]
        heads = q.shape[-1] // hd
        kv_heads = k.shape[-1] // hd
        q = q.view(b, s, heads, hd)
        k = k.view(b, s, kv_heads, hd)
        v = v.view(b, s, kv_heads, hd)
        if qk_norm:
            q = rms_norm(q, lw["q_norm"], eps)
            k = rms_norm(k, lw["k_norm"], eps)
        q = apply_rope(q, cos[:, :, None, :], sin[:, :, None, :])
        k = apply_rope(k, cos[:, :, None, :], sin[:, :, None, :])
        attn = gqa_attention(q, k, v, pad_mask=pad_mask, sliding_window=sliding_window)
        attn = attn.reshape(b, s, -1) @ lw["wo"]
        if "attn_scale" in lw:
            attn = attn * lw["attn_scale"]
        h = h + attn
        xm = rms_norm(h, lw["post_attn_norm"], eps)
        mlp = (F.silu(xm @ lw["gate"]) * (xm @ lw["up"])) @ lw["down"]
        if "mlp_scale" in lw:
            mlp = mlp * lw["mlp_scale"]
        h = h + mlp
    return h


def causal_conv1d(x, w, b, dilation=1, groups=1):
    """x: [B,T,C]; w: [K,Cin/groups,Cout] JAX layout."""
    wt = t(w).permute(2, 1, 0)  # [Cout, Cin/groups, K]
    k_eff = (w.shape[0] - 1) * dilation + 1
    xt = t(x).permute(0, 2, 1)
    xt = F.pad(xt, (k_eff - 1, 0))
    out = F.conv1d(xt, wt, t(b) if b is not None else None,
                   dilation=dilation, groups=groups)
    return out.permute(0, 2, 1)


def causal_conv_transpose1d(x, w_jax, b, stride):
    """w_jax: [K, Cin, Cout] flipped-tap JAX layout → torch [Cin, Cout, K]."""
    k = w_jax.shape[0]
    wt = t(w_jax[::-1].copy()).permute(1, 2, 0)  # un-flip taps
    xt = t(x).permute(0, 2, 1)
    out = F.conv_transpose1d(xt, wt, t(b) if b is not None else None, stride=stride)
    trim = k - stride
    if trim > 0:
        out = out[..., : out.shape[-1] - trim]
    return out.permute(0, 2, 1)


def snake_beta(x, alpha, beta):
    xt = t(x)
    return xt + torch.sin(xt * t(alpha)) ** 2 / (t(beta) + 1e-9)


def convnext_block(p, x):
    h = causal_conv1d(x, p["dw_w"], p["dw_b"], groups=x.shape[-1])
    h = F.layer_norm(h, (h.shape[-1],), t(p["ln_w"]), t(p["ln_b"]), eps=1e-6)
    h = h @ t(p["pw1_w"]) + t(p["pw1_b"])
    h = F.gelu(h)
    h = h @ t(p["pw2_w"]) + t(p["pw2_b"])
    return t(x) + t(p["gamma"]) * h


def codec_decode(params, cfg, codes):
    """Full codec pipeline oracle. codes: [B,T,Q] numpy int."""
    codes = np.maximum(codes, 0)
    cb = t(params["codebooks"])  # [Q, size, D]
    h = torch.zeros(codes.shape[0], codes.shape[1], cb.shape[-1])
    for qi in range(cb.shape[0]):
        h = h + cb[qi][torch.from_numpy(codes[..., qi]).long()]
    h = causal_conv1d(h.numpy(), params["pre_conv_w"], params["pre_conv_b"])

    tp = params["transformer"]
    x = h @ t(tp["input_proj_w"]) + t(tp["input_proj_b"])
    positions = torch.arange(x.shape[1])[None].expand(x.shape[0], -1)
    head_dim = cfg.head_dim
    cos, sin = rope_cos_sin(positions, head_dim, cfg.rope_theta)
    x = trunk_forward(tp["trunk"], x, cos, sin, cfg.rms_norm_eps, head_dim,
                      sliding_window=cfg.sliding_window, qk_norm=False)
    x = rms_norm(x, t(tp["norm"]), cfg.rms_norm_eps)
    h = x @ t(tp["output_proj_w"]) + t(tp["output_proj_b"])

    for stage, factor in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_conv_transpose1d(h.numpy(), stage["tconv_w"], stage["tconv_b"],
                                    stride=factor)
        h = convnext_block(stage["convnext"], h.numpy())

    h = causal_conv1d(h.numpy(), params["vocoder_pre_w"], params["vocoder_pre_b"])
    for block, rate in zip(params["blocks"], cfg.upsample_rates):
        h = snake_beta(h.numpy(), block["alpha"], block["beta"])
        h = causal_conv_transpose1d(h.numpy(), block["tconv_w"], block["tconv_b"],
                                    stride=rate)
        for unit, dilation in zip(block["resunits"], (1, 3, 9)):
            r = snake_beta(h.numpy(), unit["alpha1"], unit["beta1"])
            r = causal_conv1d(r.numpy(), unit["conv1_w"], unit["conv1_b"],
                              dilation=dilation)
            r = snake_beta(r.numpy(), unit["alpha2"], unit["beta2"])
            r = causal_conv1d(r.numpy(), unit["conv2_w"], unit["conv2_b"])
            h = h + r
    h = snake_beta(h.numpy(), params["final_alpha"], params["final_beta"])
    wav = causal_conv1d(h.numpy(), params["final_conv_w"], params["final_conv_b"])
    return wav[..., 0].clamp(-1, 1)
