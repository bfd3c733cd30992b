"""25 Hz (V1) codec decoder: flow-matching DiT → mel → BigVGAN → waveform.

Reference: qwen_tts/core/tokenizer_25hz/modeling_qwen3_tts_tokenizer_v1.py —

* **DiT** (:1071-1226): AdaLN-Zero transformer conditioned on the diffusion
  timestep; inputs fuse noisy mel + an ECAPA summary of the reference mel +
  repeated codec-token embeddings + the CAM++ x-vector. Attention is
  *block-local* (block 24) with per-layer look-ahead/backward of one block.
  RoPE uses the **interleaved-pair** rotation (rotate (x0,x1) pairs, not the
  half-split convention). Sampling: Euler ODE over sway-warped timesteps with
  classifier-free guidance ran as a doubled batch.
* **BigVGAN** (:996-1067): mel pre-processing (exp → dB → normalize), conv
  stack with anti-aliased SnakeBeta activations (2× kaiser-sinc up/downsample
  around each activation), transposed-conv upsampling, AMP residual blocks.

TPU-first: the whole Euler loop is one `lax.scan` (10 fused steps); the CFG
pair rides the batch axis; block-local attention is a static mask; the
kaiser-sinc filters are load-time numpy constants feeding depthwise convs.
Everything is channels-last.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import BigVGANConfig, CodecV1Config, DiTConfig
from qwen_tts_tpu.models.speaker import speaker_encoder_forward
from qwen_tts_tpu.ops.snake import snake_beta

NEG_INF = jnp.float32(-1e9)


# --------------------------------------------------------------------------
# DiT pieces
# --------------------------------------------------------------------------

def _interleaved_rope_tables(seq_len: int, head_dim: int, theta: float):
    """cos/sin [T, head_dim] with interleaved duplication:
    table[t, 2i] = table[t, 2i+1] = f(t * theta^(-2i/d))
    (Qwen3TTSTokenizerV1DecoderDiTRotaryEmbedding, :99-122)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(seq_len)[:, None] * inv_freq[None, :]
    t = np.stack([t, t], axis=-1).reshape(seq_len, head_dim)
    return jnp.asarray(np.cos(t), jnp.float32), jnp.asarray(np.sin(t), jnp.float32)


def _rotate_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) → (-x1, x0, -x3, x2, ...) (:556-561)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def _apply_rope_interleaved(x, cos, sin):
    return (x * cos + _rotate_pairs(x) * sin).astype(x.dtype)


# -- half-split rope (serving fast path) -------------------------------------
# The interleaved-pair rotation shuffles adjacent LANES (a cross-lane op on
# every q/k, every layer, every Euler step). Because q only meets k through
# dot products and the rope tables duplicate each frequency across the pair,
# permuting the q/k head channels (evens then odds) at load time turns the
# pair rotation into the half-split convention — two contiguous lane-block
# slices — with bit-identical attention output. v/o are untouched.

def _halfsplit_rope_tables(seq_len: int, head_dim: int, theta: float):
    """cos/sin [T, head_dim] with half-split duplication:
    table[t, i] = table[t, half + i] = f(t * theta^(-2i/d))."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(seq_len)[:, None] * inv_freq[None, :]
    t = np.concatenate([t, t], axis=-1)
    return jnp.asarray(np.cos(t), jnp.float32), jnp.asarray(np.sin(t), jnp.float32)


def _apply_rope_halfsplit(x, cos, sin):
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x * cos + rot * sin).astype(x.dtype)


def _rope_halfsplit_layer(layer: dict, heads: int, head_dim: int) -> dict:
    """Permute wq/wk output channels per head: (0,1,2,..) → (evens | odds).
    q'·k' == q·k for any shared permutation, so attention is unchanged."""
    perm = np.arange(head_dim).reshape(-1, 2).T.reshape(-1)
    full = (np.arange(heads)[:, None] * head_dim + perm[None, :]).reshape(-1)
    out = dict(layer)
    out["wq"] = layer["wq"][:, full]
    out["bq"] = layer["bq"][full]
    out["wk"] = layer["wk"][:, full]
    out["bk"] = layer["bk"][full]
    return out


def _sinus_time_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0):
    """SinusPositionEmbedding (:634-646). t: [B] → [B, dim]."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    arg = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


def _block_mask(seq_len: int, block_size: int, look_back: int, look_ahead: int):
    """[T, T] bool — True = attend (DiTDecoderLayer mask, :684-686)."""
    blocks = np.arange(seq_len) // block_size
    diff = blocks[None, :] - blocks[:, None]
    return jnp.asarray((diff >= -look_back) & (diff <= look_ahead))


def _dit_attention(layer: dict, x: jnp.ndarray, cos, sin, mask, heads, head_dim):
    """Dense masked attention (reference semantics verbatim). Kept as the
    oracle for the block-local fast path below."""
    b, t, _ = x.shape
    q = (x @ layer["wq"] + layer["bq"]).reshape(b, t, heads, head_dim)
    k = (x @ layer["wk"] + layer["bk"]).reshape(b, t, heads, head_dim)
    v = (x @ layer["wv"] + layer["bv"]).reshape(b, t, heads, head_dim)
    q = _apply_rope_interleaved(q, cos[None, :, None], sin[None, :, None])
    k = _apply_rope_interleaved(k, cos[None, :, None], sin[None, :, None])
    scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(head_dim))
    scores = jnp.where(mask[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(b, t, -1) @ layer["wo"] + layer["bo"]


def _dit_attention_local(layer: dict, x: jnp.ndarray, cos, sin,
                         look_back: int, look_ahead: int, block: int,
                         heads: int, head_dim: int, halfsplit: bool = False,
                         batch_order: bool = False):
    """Block-local attention computed block-locally (same math as the dense
    masked form — query block n attends keys in blocks [n-lb, n+la], pad
    keys masked to -1e9 — but the score tensor is [B,H,nb,block,w] instead
    of [B,H,T,T]: the dense form materializes ~T/w more scores in HBM than
    the mask keeps, which dominated DiT time at T=500)."""
    b, t, _ = x.shape
    nb = -(-t // block)
    t_pad = nb * block
    w = (look_back + 1 + look_ahead) * block

    q = (x @ layer["wq"] + layer["bq"]).reshape(b, t, heads, head_dim)
    k = (x @ layer["wk"] + layer["bk"]).reshape(b, t, heads, head_dim)
    v = (x @ layer["wv"] + layer["bv"]).reshape(b, t, heads, head_dim)
    if cos is not None:  # cos=None → rope-off (ablation attribution only)
        rope = _apply_rope_halfsplit if halfsplit else _apply_rope_interleaved
        q = rope(q, cos[None, :, None], sin[None, :, None])
        k = rope(k, cos[None, :, None], sin[None, :, None])

    def pad_t(a):
        return jnp.pad(a, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))

    qb = pad_t(q).reshape(b, nb, block, heads, head_dim)
    kb = pad_t(k).reshape(b, nb, block, heads, head_dim)
    vb = pad_t(v).reshape(b, nb, block, heads, head_dim)

    def neighbors(a):  # [B, nb, block, H, hd] -> [B, nb, w, H, hd]
        ap = jnp.pad(a, ((0, 0), (look_back, look_ahead), (0, 0), (0, 0),
                         (0, 0)))
        return jnp.concatenate(
            [ap[:, i : i + nb] for i in range(look_back + 1 + look_ahead)],
            axis=2,
        )

    kn = neighbors(kb)
    vn = neighbors(vb)

    # key validity: its global position must exist (not T-pad, not nb-pad)
    off = jax.lax.broadcasted_iota(jnp.int32, (nb, w), 1)
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb, w), 0)
    key_block = blk + off // block - look_back
    key_pos = key_block * block + off % block
    valid = (key_block >= 0) & (key_block < nb) & (key_pos < t)
    if batch_order:  # scores batch dims in INPUT order (b, n, h)
        scores = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, kn,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim))
        scores = jnp.where(valid[None, :, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(vn.dtype)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, vn,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        scores = jnp.einsum("bnqhd,bnkhd->bhnqk", qb, kn,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim))
        scores = jnp.where(valid[None, None, :, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(vn.dtype)
        out = jnp.einsum("bhnqk,bnkhd->bnqhd", probs, vn,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, t_pad, heads * head_dim)[:, :t]
    return out @ layer["wo"] + layer["bo"]


def _dit_attention_chunked(layer: dict, x: jnp.ndarray, cos, sin,
                           look_back: int, look_ahead: int, block: int,
                           heads: int, head_dim: int, chunk_blocks: int = 5,
                           halfsplit: bool = False):
    """Block-local attention packed into lane-dense MXU tiles.

    Same math as `_dit_attention_local` / the dense oracle, but queries are
    tiled in CHUNKS of `chunk_blocks` blocks (5×24 = 120 rows ≈ a full MXU
    tile) instead of single 24-row blocks: the score matmuls go from
    [24×64]·[64×w] (19% M-utilization) to [120×64]·[64×(120..168)]. The
    superset scores are masked back to the exact block window, so the
    result is identical. With lb = la = 0 (19 of 22 DiT layers) the key
    windows are a pure reshape; windowed layers gather `chunk+lb+la` blocks
    via strided slices. `halfsplit` expects `_rope_halfsplit_layer` weights
    and half-split tables (bit-identical attention, cheaper rotation)."""
    b, t, _ = x.shape
    nb = -(-t // block)
    g = chunk_blocks
    nc = -(-nb // g)
    t_pad = nc * g * block
    p = g + look_back + look_ahead
    w = p * block
    qlen = g * block

    q = (x @ layer["wq"] + layer["bq"]).reshape(b, t, heads, head_dim)
    k = (x @ layer["wk"] + layer["bk"]).reshape(b, t, heads, head_dim)
    v = (x @ layer["wv"] + layer["bv"]).reshape(b, t, heads, head_dim)
    rope = _apply_rope_halfsplit if halfsplit else _apply_rope_interleaved
    q = rope(q, cos[None, :, None], sin[None, :, None])
    k = rope(k, cos[None, :, None], sin[None, :, None])

    def pad_t(a):
        return jnp.pad(a, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))

    qc = pad_t(q).reshape(b, nc, qlen, heads, head_dim)
    if look_back == 0 and look_ahead == 0:
        kw = pad_t(k).reshape(b, nc, w, heads, head_dim)
        vw = pad_t(v).reshape(b, nc, w, heads, head_dim)
    else:
        kb = pad_t(k).reshape(b, nc * g, block, heads, head_dim)
        vb = pad_t(v).reshape(b, nc * g, block, heads, head_dim)

        def windows(a):  # [B, nc*g, blk, H, hd] → [B, nc, p*blk, H, hd]
            ap = jnp.pad(a, ((0, 0), (look_back, look_ahead), (0, 0),
                             (0, 0), (0, 0)))
            cols = [ap[:, j : j + (nc - 1) * g + 1 : g] for j in range(p)]
            return jnp.concatenate(cols, axis=2)

        kw = windows(kb)
        vw = windows(vb)

    scores = jnp.einsum("bnqhd,bnkhd->bhnqk", qc, kw,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(head_dim))
    # exact window mask in (chunk, q-row, k-col) coordinates
    qq = jax.lax.broadcasted_iota(jnp.int32, (nc, qlen, w), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (nc, qlen, w), 2)
    cc = jax.lax.broadcasted_iota(jnp.int32, (nc, qlen, w), 0)
    q_block = cc * g + qq // block
    k_block = cc * g - look_back + kk // block
    k_pos = k_block * block + kk % block
    diff = k_block - q_block
    valid = ((k_block >= 0) & (k_block < nb) & (k_pos < t)
             & (diff >= -look_back) & (diff <= look_ahead))
    scores = jnp.where(valid[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(vw.dtype)
    out = jnp.einsum("bhnqk,bnkhd->bnqhd", probs, vw,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, t_pad, heads * head_dim)[:, :t]
    return out @ layer["wo"] + layer["bo"]


def _dit_layer(layer: dict, x: jnp.ndarray, time_emb: jnp.ndarray,
               cos, sin, mask, cfg: DiTConfig, attn_impl: str = "chunked"):
    # AdaLN-Zero (:477-491): 6-way modulation from silu(time_emb).
    mod = jax.nn.silu(time_emb) @ layer["ada_w"] + layer["ada_b"]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
        mod, 6, axis=-1
    )
    normed = _ln_noaffine(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    look_back, look_ahead = mask  # (lb, la) block window
    if attn_impl in ("local", "local_hs", "local_hs_bo"):
        attn = _dit_attention_local(layer, normed, cos, sin,
                                    look_back, look_ahead, cfg.block_size,
                                    cfg.num_attention_heads, cfg.head_dim,
                                    halfsplit=attn_impl.startswith("local_hs"),
                                    batch_order=(attn_impl == "local_hs_bo"))
    else:
        attn = _dit_attention_chunked(
            layer, normed, cos, sin, look_back, look_ahead, cfg.block_size,
            cfg.num_attention_heads, cfg.head_dim,
            halfsplit=(attn_impl == "chunked_hs"))
    x = x + gate_msa[:, None] * attn
    normed = _ln_noaffine(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    h = normed @ layer["ff1_w"] + layer["ff1_b"]
    h = jax.nn.gelu(h, approximate=True)  # GELU(approximate="tanh"), :522
    h = h @ layer["ff2_w"] + layer["ff2_b"]
    return x + gate_mlp[:, None] * h


def _ln_noaffine(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def dit_forward(
    params: dict,
    cfg: DiTConfig,
    noisy_mel: jnp.ndarray,   # [B, T, mel]  (already CFG-doubled if doubled)
    spk_summary: jnp.ndarray, # [B, T, enc_dim]  ECAPA(ref_mel) repeated
    code_embed: jnp.ndarray,  # [B, T, emb_dim]
    xvec: jnp.ndarray,        # [B, T, enc_emb_dim]
    t_step: jnp.ndarray,      # [B] diffusion time
    attn_impl: str = "local_hs",
) -> jnp.ndarray:
    """One DiT velocity evaluation. Returns [B, T, mel].

    ``attn_impl`` — all the same math, adopted by measurement (exp_v1_opt,
    v5e b8x10s): "local_hs" (default: per-block attention + half-split rope
    via a one-time wq/wk column permutation; 298.9 ms vs 416.5 for the DiT
    stack — the interleaved pair rotation was ~117 ms of cross-lane
    shuffles), "local" (reference-shaped interleaved rope), "chunked"/
    "chunked_hs" (lane-packed 120-row MXU tiles — measured LOSS: the
    masked score tensor grows ~6×, 474.4/369.2 ms; kept as the documented
    negative)."""
    # Activations follow the PARAM dtype: bf16 checkpoints run the whole
    # transformer in bf16 (the f32 ODE state was silently promoting every
    # matmul/elementwise to f32 — measured 753 ms of the 1067 ms b8x10s
    # decode); f32 params (CPU parity/oracle paths) stay f32 end-to-end.
    dt = params["in_proj_w"].dtype
    time_emb = _sinus_time_embedding(t_step, 256).astype(dt)
    time_emb = jax.nn.silu(time_emb @ params["time_w1"] + params["time_b1"])
    time_emb = time_emb @ params["time_w2"] + params["time_b2"]

    x = jnp.concatenate(
        [noisy_mel.astype(dt), spk_summary.astype(dt),
         code_embed.astype(dt), xvec.astype(dt)], axis=-1)
    x = x @ params["in_proj_w"] + params["in_proj_b"]

    seq = x.shape[1]
    if attn_impl in ("chunked_hs", "local_hs", "local_hs_bo"):
        cos, sin = _halfsplit_rope_tables(seq, cfg.head_dim, cfg.rope_theta)
        layers = [_rope_halfsplit_layer(l, cfg.num_attention_heads,
                                        cfg.head_dim)
                  for l in params["layers"]]
    else:
        cos, sin = _interleaved_rope_tables(seq, cfg.head_dim, cfg.rope_theta)
        layers = params["layers"]

    for i, layer in enumerate(layers):
        look_ahead = 1 if i in cfg.look_ahead_layers else 0
        look_back = 1 if i in cfg.look_backward_layers else 0
        x = _dit_layer(layer, x, time_emb, cos, sin,
                       (look_back, look_ahead), cfg, attn_impl)

    mod = jax.nn.silu(time_emb) @ params["out_ada_w"] + params["out_ada_b"]
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = _ln_noaffine(x) * (1 + scale[:, None]) + shift[:, None]
    # f32 out: the Euler ODE state integrates in f32 regardless of dt.
    return (x @ params["out_proj_w"] + params["out_proj_b"]
            ).astype(jnp.float32)


def dit_sample(
    params: dict,
    cfg: DiTConfig,
    codes: jnp.ndarray,     # [B, T_code] int32
    ref_mel: jnp.ndarray,   # [B, T_mel, mel]
    xvector: jnp.ndarray,   # [B, enc_emb_dim]
    rng: jax.Array,
    *,
    num_steps: int = 10,
    guidance_scale: float = 0.5,
    sway_coefficient: Optional[float] = -1.0,
    noise: Optional[jnp.ndarray] = None,
    attn_impl: str = "local_hs",
) -> jnp.ndarray:
    """Euler ODE sampling with CFG (:1171-1226). Returns mel [B, T, mel_dim].

    ``noise`` overrides the initial ODE state (the reference draws
    torch.randn([B, 30000, mel]) and slices, modeling_...v1.py:1181-1183) —
    used by the reference-in-the-loop parity tests to share one noise tensor
    across both stacks; otherwise it is drawn from ``rng``."""
    b, t_code = codes.shape
    t_mel = t_code * cfg.repeats

    if noise is None:
        noise = jax.random.normal(rng, (b, t_mel, cfg.mel_dim), jnp.float32)
    else:
        noise = jnp.asarray(noise, jnp.float32)[:, :t_mel]

    # The ECAPA summary runs on the reference mel for the conditional half and
    # on a ZERO mel for the CFG-uncond half (the reference zeroes the mel
    # *before* the spk encoder, DiTInputEmbedding :447-453 — ECAPA(0) ≠ 0).
    spk_cfg = cfg.spk_encoder_config()
    spk = speaker_encoder_forward(params["spk_encoder"], spk_cfg, ref_mel)
    spk_rep = jnp.broadcast_to(spk[:, None], (b, t_mel, cfg.enc_dim))
    xvec_rep = jnp.broadcast_to(xvector[:, None], (b, t_mel, cfg.enc_emb_dim))

    code_emb = jnp.repeat(params["codec_embed"][codes], cfg.repeats, axis=1)
    code_emb_uncond = jnp.repeat(
        params["codec_embed"][jnp.zeros_like(codes)], cfg.repeats, axis=1
    )

    apply_cfg = guidance_scale >= 1e-5
    if apply_cfg:
        spk_zero = speaker_encoder_forward(
            params["spk_encoder"], spk_cfg, jnp.zeros_like(ref_mel)
        )
        spk_zero_rep = jnp.broadcast_to(spk_zero[:, None], (b, t_mel, cfg.enc_dim))
        mel_in = lambda x: jnp.concatenate([x, x], axis=0)  # noqa: E731
        spk2 = jnp.concatenate([spk_rep, spk_zero_rep], axis=0)
        xv2 = jnp.concatenate([xvec_rep, jnp.zeros_like(xvec_rep)], axis=0)
        ce2 = jnp.concatenate([code_emb, code_emb_uncond], axis=0)
    else:
        mel_in = lambda x: x  # noqa: E731
        spk2, xv2, ce2 = spk_rep, xvec_rep, code_emb

    timesteps = jnp.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        timesteps = timesteps + sway_coefficient * (
            jnp.cos(jnp.pi / 2 * timesteps) - 1 + timesteps
        )

    def velocity(t0, x):
        bsz = ce2.shape[0]
        pred = dit_forward(
            params, cfg, mel_in(x), spk2, ce2, xv2,
            jnp.broadcast_to(t0, (bsz,)), attn_impl=attn_impl,
        )
        if apply_cfg:
            cond, uncond = jnp.split(pred, 2, axis=0)
            return cond + (cond - uncond) * guidance_scale
        return pred

    def euler_step(x, ts):
        t0, t1 = ts
        return x + velocity(t0, x) * (t1 - t0), None

    x, _ = jax.lax.scan(euler_step, noise,
                        (timesteps[:-1], timesteps[1:]))
    return x


# --------------------------------------------------------------------------
# BigVGAN
# --------------------------------------------------------------------------

def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int
                         ) -> np.ndarray:
    """Kaiser-windowed sinc filter (:739-782); numpy, load-time constant."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time_idx = np.arange(-half_size, half_size) + 0.5
    else:
        time_idx = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((kernel_size,), np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time_idx)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _replicate_pad(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Edge-replication pad along T of [B, T, C]."""
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _depthwise_conv(x: jnp.ndarray, filt: jnp.ndarray, stride: int = 1):
    """x: [B, T, C]; filt: [K] shared across channels (depthwise)."""
    c = x.shape[-1]
    w = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c, preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _depthwise_conv_transpose(x: jnp.ndarray, filt: jnp.ndarray, stride: int):
    c = x.shape[-1]
    k = filt.shape[0]
    w = jnp.broadcast_to(filt[::-1][:, None, None], (k, 1, c))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _aa_snake_poly(x: jnp.ndarray, alpha, beta, up_filt, down_filt):
    """Phase-split (polyphase) form of `_anti_aliased_snake_conv` for the
    BigVGAN defaults (ratio 2, kernel 12) — same math, reassociated taps.

    The conv form materializes the signal at 2× rate and runs two k=12
    depthwise convs there (zero-stuffed tconv + strided conv). Here the two
    output phases of the upsampler are computed separately as 6-tap
    shift-FMAs at 1× rate, SnakeBeta (pointwise) applies per phase, and the
    decimating downsampler consumes the phases directly — the 2×-rate
    tensor never exists and every op is a slice + multiply-add that XLA
    fuses into the surrounding convs. Tap offsets are derived from the
    reference's exact pad/trim arithmetic (modeling_..._v1.py:784-833) and
    pinned by tests against the conv form and the torch oracle."""
    t = x.shape[1]
    f32 = jnp.float32
    # Upsample phases: h[2r] = 2·Σᵢ f[2i+1]·x̂[r+2-i], h[2r+1] = 2·Σᵢ f[2i]·x̂[r+3-i]
    # with x̂ = edge-replicated x (pad 3/3 covers both phases' tap ranges).
    xe = _replicate_pad(x, 3, 3)
    p0 = jnp.zeros((), f32)
    p1 = jnp.zeros((), f32)
    for i in range(6):
        p0 = p0 + up_filt[2 * i + 1].astype(f32) * xe[:, 5 - i : 5 - i + t].astype(f32)
        p1 = p1 + up_filt[2 * i].astype(f32) * xe[:, 6 - i : 6 - i + t].astype(f32)
    s0 = snake_beta((2.0 * p0).astype(x.dtype), alpha, beta)
    s1 = snake_beta((2.0 * p1).astype(x.dtype), alpha, beta)
    # Downsample: y[r] = Σᵢ g[2i+1]·s0[r+i-2] + Σᵢ g[2i]·s1[r+i-3], edges
    # replicated in 2×-rate coordinates (left edge = s0[0], right = s1[T-1]).
    left = s0[:, :1]
    right = s1[:, t - 1 : t]
    s0e = jnp.concatenate([left, left, s0, right, right, right], axis=1)
    s1e = jnp.concatenate([left, left, left, s1, right, right], axis=1)
    y = jnp.zeros((), f32)
    for i in range(6):
        y = y + down_filt[2 * i + 1].astype(f32) * s0e[:, i : i + t].astype(f32)
        y = y + down_filt[2 * i].astype(f32) * s1e[:, i : i + t].astype(f32)
    return y.astype(x.dtype)


def _aa_snake_polyc(x: jnp.ndarray, alpha, beta, up_filt, down_filt):
    """Phase-split AA snake with the phase FIRs as depthwise convs (same
    index math as `_aa_snake_poly`, but 4 clean 6-tap stride-1 convs
    instead of 24 shift-FMAs — the FMA chain defeats XLA's conv fusion,
    the same failure mode as ops/snake.py's Cody-Waite ledger entry)."""
    t = x.shape[1]
    xe = _replicate_pad(x, 3, 3)  # [B, T+6, C]
    # phase0[r] = Σⱼ fu[11-2j]·xe[r+j], phase1[r] = Σⱼ fu[10-2j]·xe[r+1+j]
    k0 = 2.0 * up_filt[jnp.arange(11, -1, -2)]
    k1 = 2.0 * up_filt[jnp.arange(10, -2, -2)]
    p0 = _depthwise_conv(xe[:, : t + 5], k0)
    p1 = _depthwise_conv(xe[:, 1 : t + 6], k1)
    s0 = snake_beta(p0, alpha, beta)
    s1 = snake_beta(p1, alpha, beta)
    left = s0[:, :1]
    right = s1[:, t - 1 : t]
    s0e = jnp.concatenate([left, left, s0, right, right, right], axis=1)
    s1e = jnp.concatenate([left, left, left, s1, right, right], axis=1)
    g0 = down_filt[jnp.arange(1, 12, 2)]   # y += Σᵢ g[2i+1]·s0e[r+i]
    g1 = down_filt[jnp.arange(0, 11, 2)]   # y += Σᵢ g[2i]·s1e[r+i]
    return _depthwise_conv(s0e, g0) + _depthwise_conv(s1e, g1)


def _anti_aliased_snake(x: jnp.ndarray, alpha, beta, up_filt, down_filt,
                        ratio: int = 2, aa_impl: str = "conv"):
    """TorchActivation1d (:835-856): 2× upsample → SnakeBeta → 2× downsample."""
    if ratio == 2 and up_filt.shape[0] == 12 and down_filt.shape[0] == 12:
        if aa_impl == "poly":
            return _aa_snake_poly(x, alpha, beta, up_filt, down_filt)
        if aa_impl == "polyc":
            return _aa_snake_polyc(x, alpha, beta, up_filt, down_filt)
    return _anti_aliased_snake_conv(x, alpha, beta, up_filt, down_filt, ratio)


def _anti_aliased_snake_conv(x: jnp.ndarray, alpha, beta, up_filt, down_filt,
                             ratio: int = 2):
    """The direct (2×-rate, depthwise-conv) form; oracle for the poly path."""
    k_up = up_filt.shape[0]
    pad = k_up // ratio - 1
    pad_left = pad * ratio + (k_up - ratio) // 2
    pad_right = pad * ratio + (k_up - ratio + 1) // 2
    h = _replicate_pad(x, pad, pad)
    h = ratio * _depthwise_conv_transpose(h, up_filt, ratio)
    h = h[:, pad_left : h.shape[1] - pad_right]

    h = snake_beta(h, alpha, beta)

    k_dn = down_filt.shape[0]
    even = k_dn % 2 == 0
    dl = k_dn // 2 - int(even)
    dr = k_dn // 2
    h = _replicate_pad(h, dl, dr)
    return _depthwise_conv(h, down_filt, stride=ratio)


def _conv1d_same(x, w, b, dilation=1):
    """Non-causal 'same'-padded conv (torch padding=(k*d-d)//2)."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _conv_transpose_same(x, w, b, stride: int):
    """torch ConvTranspose1d(k, s, padding=(k-s)//2): trim (k-s)//2 per side.
    w: [K, Cin, Cout] flipped-tap layout (see ops/convs.py)."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    trim = (k - stride) // 2
    if trim > 0:
        out = out[:, trim : out.shape[1] - trim]
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _amp_block(p: dict, x: jnp.ndarray, dilations: Tuple[int, ...],
               causal_type: str, filters: dict, aa_impl: str = "conv"
               ) -> jnp.ndarray:
    """AMPBlock (:868-992)."""
    up_f, dn_f = filters["up"], filters["down"]

    def act(a_idx, h):
        a = p["act_alpha"][a_idx]
        b = p["act_beta"][a_idx]
        return _anti_aliased_snake(h, a, b, up_f, dn_f, aa_impl=aa_impl)

    if causal_type == "2":
        h = _conv1d_same(x, p["pre_conv_w"], p["pre_conv_b"])
        h = _anti_aliased_snake(h, p["pre_alpha"], p["pre_beta"], up_f, dn_f,
                                aa_impl=aa_impl)
    else:
        h = x
    out = x
    for j, dilation in enumerate(dilations):
        h = act(2 * j, h)
        # convs1: causal, dilated.
        from qwen_tts_tpu.ops.convs import causal_conv1d

        h = causal_conv1d(h, p["conv1_w"][j], p["conv1_b"][j], dilation=dilation)
        h = act(2 * j + 1, h)
        if causal_type == "1":
            h = _conv1d_same(h, p["conv2_w"][j], p["conv2_b"][j])
        else:
            h = causal_conv1d(h, p["conv2_w"][j], p["conv2_b"][j])
        out = out + h
    return out


def _process_mel(mel: jnp.ndarray) -> jnp.ndarray:
    """exp → dB(min −115) − 20 → normalize to [−1, 1] (:1038-1050)."""
    amplitude = jnp.exp(mel.astype(jnp.float32))
    min_level = jnp.exp(jnp.float32(-115 / 20.0 * np.log(10)))
    db = 20.0 * jnp.log10(jnp.maximum(amplitude, min_level)) - 20.0
    return jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)


def bigvgan_forward(params: dict, cfg: BigVGANConfig, mel: jnp.ndarray,
                    aa_impl: str = "conv") -> jnp.ndarray:
    """mel [B, T, mel_dim] → waveform [B, T * total_upsample]."""
    filters = params["_filters"]
    # Vocoder activations follow the param dtype: bf16 checkpoints take the
    # bf16 path end-to-end, which also unlocks snake_beta's polynomial sin²
    # (the f32 mel was promoting every conv AND forcing the exact
    # transcendental sine — the 12 Hz codec's single biggest cost before
    # the same fix). f32 params (parity/oracle paths) stay f32.
    h = _process_mel(mel).astype(params["pre_w"].dtype)
    h = _conv1d_same(h, params["pre_w"], params["pre_b"])
    n_res = len(cfg.resblock_kernel_sizes)
    for li, rate in enumerate(cfg.upsample_rates):
        h = _conv_transpose_same(
            h, params["ups_w"][li], params["ups_b"][li], stride=rate
        )
        acc = None
        for bi in range(n_res):
            block = params["resblocks"][li * n_res + bi]
            causal_type = "1" if li > 1 else "2"
            r = _amp_block(block, h, cfg.resblock_dilation_sizes[bi],
                           causal_type, filters, aa_impl=aa_impl)
            acc = r if acc is None else acc + r
        h = acc / n_res
    h = _anti_aliased_snake(h, params["post_alpha"], params["post_beta"],
                            filters["up"], filters["down"], aa_impl=aa_impl)
    wav = _conv1d_same(h, params["post_w"], None)
    return jnp.clip(wav[..., 0].astype(jnp.float32), -1.0, 1.0)


# --------------------------------------------------------------------------
# Full decode
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "num_steps", "guidance_scale",
                                   "sway_coefficient", "attn_impl",
                                   "aa_impl"))
def codec_v1_decode(
    params: dict,
    cfg: CodecV1Config,
    codes: jnp.ndarray,    # [B, T] int32 (clamped >= 0)
    xvectors: jnp.ndarray, # [B, enc_emb_dim]
    ref_mels: jnp.ndarray, # [B, T_mel, mel_dim]
    rng: jax.Array,
    *,
    num_steps: int = 10,
    guidance_scale: float = 0.5,
    sway_coefficient: float = -1.0,
    noise: Optional[jnp.ndarray] = None,
    attn_impl: str = "local_hs",
    aa_impl: str = "conv",
) -> jnp.ndarray:
    codes = jnp.maximum(codes, 0)
    mel = dit_sample(
        params["dit"], cfg.dit, codes, ref_mels, xvectors, rng,
        num_steps=num_steps, guidance_scale=guidance_scale,
        sway_coefficient=sway_coefficient, noise=noise, attn_impl=attn_impl,
    )
    return bigvgan_forward(params["bigvgan"], cfg.bigvgan, mel,
                           aa_impl=aa_impl)


# --------------------------------------------------------------------------
# Random init (tests / bench)
# --------------------------------------------------------------------------

def _w(key, shape, fan_in, dtype):
    return (jax.random.normal(key, shape, jnp.float32) / np.sqrt(fan_in)).astype(dtype)


def init_dit_params(rng: jax.Array, cfg: DiTConfig, dtype=jnp.float32) -> dict:
    from qwen_tts_tpu.models.speaker import init_speaker_params

    keys = iter(jax.random.split(rng, 16 + 8 * cfg.num_hidden_layers))
    h = cfg.hidden_size
    in_dim = cfg.mel_dim + cfg.enc_dim + cfg.emb_dim + cfg.enc_emb_dim
    qd = cfg.num_attention_heads * cfg.head_dim
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "ada_w": _w(next(keys), (h, 6 * h), h, dtype),
            "ada_b": jnp.zeros((6 * h,), dtype),
            "wq": _w(next(keys), (h, qd), h, dtype), "bq": jnp.zeros((qd,), dtype),
            "wk": _w(next(keys), (h, qd), h, dtype), "bk": jnp.zeros((qd,), dtype),
            "wv": _w(next(keys), (h, qd), h, dtype), "bv": jnp.zeros((qd,), dtype),
            "wo": _w(next(keys), (qd, h), qd, dtype), "bo": jnp.zeros((h,), dtype),
            "ff1_w": _w(next(keys), (h, h * cfg.ff_mult), h, dtype),
            "ff1_b": jnp.zeros((h * cfg.ff_mult,), dtype),
            "ff2_w": _w(next(keys), (h * cfg.ff_mult, h), h * cfg.ff_mult, dtype),
            "ff2_b": jnp.zeros((h,), dtype),
        })
    return {
        "time_w1": _w(next(keys), (256, h), 256, dtype),
        "time_b1": jnp.zeros((h,), dtype),
        "time_w2": _w(next(keys), (h, h), h, dtype),
        "time_b2": jnp.zeros((h,), dtype),
        "codec_embed": _w(next(keys), (cfg.num_embeds + 1, cfg.emb_dim),
                          cfg.emb_dim, dtype),
        "in_proj_w": _w(next(keys), (in_dim, h), in_dim, dtype),
        "in_proj_b": jnp.zeros((h,), dtype),
        "spk_encoder": init_speaker_params(next(keys), cfg.spk_encoder_config(),
                                           dtype),
        "layers": layers,
        "out_ada_w": _w(next(keys), (h, 2 * h), h, dtype),
        "out_ada_b": jnp.zeros((2 * h,), dtype),
        "out_proj_w": _w(next(keys), (h, cfg.mel_dim), h, dtype),
        "out_proj_b": jnp.zeros((cfg.mel_dim,), dtype),
    }


def make_aa_filters() -> dict:
    """Shared 2× anti-aliasing filters (kernel 12, the BigVGAN defaults)."""
    return {
        "up": jnp.asarray(kaiser_sinc_filter1d(0.25, 0.3, 12)),
        "down": jnp.asarray(kaiser_sinc_filter1d(0.25, 0.3, 12)),
    }


def init_bigvgan_params(rng: jax.Array, cfg: BigVGANConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 512))
    c0 = cfg.upsample_initial_channel
    resblocks = []
    ups_w, ups_b = [], []
    n_res = len(cfg.resblock_kernel_sizes)
    for li, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = c0 // (2 ** li)
        cout = c0 // (2 ** (li + 1))
        ups_w.append(_w(next(keys), (k, cin, cout), cin * k, dtype))
        ups_b.append(jnp.zeros((cout,), dtype))
        for bi in range(n_res):
            ks = cfg.resblock_kernel_sizes[bi]
            dil = cfg.resblock_dilation_sizes[bi]
            n_layers = 2 * len(dil)
            blk = {
                "conv1_w": jnp.stack([
                    _w(next(keys), (ks, cout, cout), ks * cout, dtype)
                    for _ in dil
                ]),
                "conv1_b": jnp.zeros((len(dil), cout), dtype),
                "conv2_w": jnp.stack([
                    _w(next(keys), (ks, cout, cout), ks * cout, dtype)
                    for _ in dil
                ]),
                "conv2_b": jnp.zeros((len(dil), cout), dtype),
                "act_alpha": jnp.ones((n_layers, cout), dtype),
                "act_beta": jnp.ones((n_layers, cout), dtype),
            }
            if li <= 1:
                blk["pre_conv_w"] = _w(next(keys), (ks, cout, cout), ks * cout, dtype)
                blk["pre_conv_b"] = jnp.zeros((cout,), dtype)
                blk["pre_alpha"] = jnp.ones((cout,), dtype)
                blk["pre_beta"] = jnp.ones((cout,), dtype)
            resblocks.append(blk)
    c_last = c0 // (2 ** len(cfg.upsample_rates))
    return {
        "pre_w": _w(next(keys), (5, cfg.mel_dim, c0), 5 * cfg.mel_dim, dtype),
        "pre_b": jnp.zeros((c0,), dtype),
        "ups_w": ups_w,
        "ups_b": ups_b,
        "resblocks": resblocks,
        "post_alpha": jnp.ones((c_last,), dtype),
        "post_beta": jnp.ones((c_last,), dtype),
        "post_w": _w(next(keys), (7, c_last, 1), 7 * c_last, dtype),
        "_filters": make_aa_filters(),
    }


def init_codec_v1_params(rng: jax.Array, cfg: CodecV1Config, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "dit": init_dit_params(k1, cfg.dit, dtype),
        "bigvgan": init_bigvgan_params(k2, cfg.bigvgan, dtype),
    }
