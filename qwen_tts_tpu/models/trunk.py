"""GQA transformer trunk shared by the Talker and the Sub-Talker.

The reference implements this twice (Qwen3TTSTalkerDecoderLayer and
Qwen3TTSDecoderLayer, modeling_qwen3_tts.py:961-1012,1348-1424) — identical
math: RMSNorm → QKV → per-head QK-RMSNorm → RoPE → GQA attention → o_proj →
residual → RMSNorm → SwiGLU → residual.

TPU-first decisions:

* **Stacked layer weights** ([L, ...] leading axis): prefill scans over
  layers (one traced layer body, compiled once), the decode step runs a
  ``fori_loop`` whose carry holds the full [L, B, S_max, KV, hd] KV cache and
  only writes the new token's slots — XLA keeps the carry in place, so per
  token HBM traffic is weights + one cache row, never a cache rewrite.
* Weights are stored **[in, out]** so every projection is ``x @ w`` (lane-dim
  contraction on the MXU); the loader transposes from torch's [out, in].
* Fixed-shape caches + position masks instead of the reference's realloc'd
  growing cache (c/qwen_tts_talker.c:489-496) — no recompiles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_tts_tpu.ops.attention import (
    attention_decode_step,
    attention_prefill,
    quantize_kv,
)
from qwen_tts_tpu.ops.norms import rms_norm
from qwen_tts_tpu.ops.rope import apply_rope


class TrunkDims(NamedTuple):
    num_layers: int
    hidden: int
    heads: int
    kv_heads: int
    head_dim: int
    intermediate: int
    eps: float
    qk_norm: bool = True


def init_trunk_params(rng: jax.Array, dims: TrunkDims, dtype=jnp.float32) -> dict:
    """Random-init stacked trunk params (tests / benchmarks without a ckpt)."""
    l, d, h, kv, hd, i = (
        dims.num_layers,
        dims.hidden,
        dims.heads,
        dims.kv_heads,
        dims.head_dim,
        dims.intermediate,
    )
    keys = jax.random.split(rng, 7)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    params = {
        "wq": w(keys[0], (l, d, h * hd), d),
        "wk": w(keys[1], (l, d, kv * hd), d),
        "wv": w(keys[2], (l, d, kv * hd), d),
        "wo": w(keys[3], (l, h * hd, d), h * hd),
        "gate": w(keys[4], (l, d, i), d),
        "up": w(keys[5], (l, d, i), d),
        "down": w(keys[6], (l, i, d), i),
        "input_norm": jnp.ones((l, d), dtype),
        "post_attn_norm": jnp.ones((l, d), dtype),
    }
    if dims.qk_norm:
        params["q_norm"] = jnp.ones((l, hd), dtype)
        params["k_norm"] = jnp.ones((l, hd), dtype)
    return params


def fuse_trunk_params(params: dict) -> dict:
    """Concatenate Q|K|V and gate|up into single matmuls (the gate∥up fusion
    the reference C engine builds at load, c/qwen_tts.c:481-489, extended to
    QKV). One [D, q+2kv] and one [D, 2I] MXU matmul per layer instead of five.
    Call once after load/init; trunk functions detect the fused keys."""
    fused = dict(params)
    fused["wqkv"] = jnp.concatenate(
        [params["wq"], params["wk"], params["wv"]], axis=-1
    )
    fused["wgu"] = jnp.concatenate([params["gate"], params["up"]], axis=-1)
    for k in ("wq", "wk", "wv", "gate", "up"):
        del fused[k]
    return fused


def quantize_trunk_int8(params: dict) -> dict:
    """Opt-in int8 weight quantization (per-output-channel symmetric scales)
    for the projection matrices — halves the HBM weight traffic that
    dominates AR decode (the sub-talker trunk is re-read 32× per frame).
    Numerics change (≈int8 rounding); greedy parity is NOT preserved, so this
    is a serving-throughput option, not the default."""
    out = dict(params)
    for k in ("wq", "wk", "wv", "wo", "gate", "up", "down", "wqkv", "wgu"):
        if k not in params:
            continue
        w = jnp.asarray(params[k], jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        out[k + "_i8"] = jnp.round(w / scale).astype(jnp.int8)
        out[k + "_s"] = scale.astype(jnp.bfloat16)
        del out[k]
    return out


def _w_matmul(layer: dict, key: str, x: jnp.ndarray) -> jnp.ndarray:
    """x @ W with optional int8-dequant path (convert fuses into the dot, so
    only int8 bytes stream from HBM)."""
    if key + "_i8" in layer:
        w = layer[key + "_i8"].astype(x.dtype)
        return (x @ w) * layer[key + "_s"].astype(x.dtype)
    return x @ layer[key]


def _project_qkv(layer: dict, x: jnp.ndarray, dims: TrunkDims):
    """x: [..., D] → q [..., H, hd], k/v [..., KV, hd] with QK-RMSNorm."""
    q_dim = dims.heads * dims.head_dim
    kv_dim = dims.kv_heads * dims.head_dim
    if "wq_i8" in layer:
        q = _w_matmul(layer, "wq", x)
        k = _w_matmul(layer, "wk", x)
        v = _w_matmul(layer, "wv", x)
        q = q.reshape(*x.shape[:-1], dims.heads, dims.head_dim)
        k = k.reshape(*x.shape[:-1], dims.kv_heads, dims.head_dim)
        v = v.reshape(*x.shape[:-1], dims.kv_heads, dims.head_dim)
        if dims.qk_norm:
            q = rms_norm(q, layer["q_norm"], dims.eps)
            k = rms_norm(k, layer["k_norm"], dims.eps)
        return q, k, v
    if "wqkv" in layer or "wqkv_i8" in layer:
        qkv = _w_matmul(layer, "wqkv", x)
        q = qkv[..., :q_dim]
        k = qkv[..., q_dim : q_dim + kv_dim]
        v = qkv[..., q_dim + kv_dim :]
    else:
        q = x @ layer["wq"]
        k = x @ layer["wk"]
        v = x @ layer["wv"]
    q = q.reshape(*x.shape[:-1], dims.heads, dims.head_dim)
    k = k.reshape(*x.shape[:-1], dims.kv_heads, dims.head_dim)
    v = v.reshape(*x.shape[:-1], dims.kv_heads, dims.head_dim)
    if dims.qk_norm:
        q = rms_norm(q, layer["q_norm"], dims.eps)
        k = rms_norm(k, layer["k_norm"], dims.eps)
    return q, k, v


def _mlp(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "gate_i8" in layer:
        h = jax.nn.silu(_w_matmul(layer, "gate", x)) * _w_matmul(layer, "up", x)
        return _w_matmul(layer, "down", h)
    if "wgu" in layer or "wgu_i8" in layer:
        down = layer["down_i8"] if "down_i8" in layer else layer["down"]
        inter = down.shape[-2]
        gu = _w_matmul(layer, "wgu", x)
        h = jax.nn.silu(gu[..., :inter]) * gu[..., inter:]
        return _w_matmul(layer, "down", h)
    return (jax.nn.silu(x @ layer["gate"]) * (x @ layer["up"])) @ layer["down"]


def _maybe_scale(layer: dict, key: str, x: jnp.ndarray) -> jnp.ndarray:
    """LayerScale on a residual branch (codec pre-transformer only;
    modeling_qwen3_tts_tokenizer_v2.py:394-406). Key presence is static."""
    if key in layer:
        return x * layer[key].astype(x.dtype)
    return x


def trunk_prefill(
    params: dict,
    dims: TrunkDims,
    hidden: jnp.ndarray,  # [B, S, D]
    cos: jnp.ndarray,     # [B, S, hd] (already M-RoPE-merged if applicable)
    sin: jnp.ndarray,
    *,
    pad_mask: Optional[jnp.ndarray] = None,  # [B, S] True = real
    sliding_window: Optional[int] = None,
    layer_windows: Optional[jnp.ndarray] = None,  # [L] per-layer window
    unroll: int = 1,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-sequence forward. Returns (hidden [B,S,D], k [L,B,S,KV,hd], v).

    ``sliding_window`` applies one window to every layer (codec transformer);
    ``layer_windows`` is a per-layer [L] array (talker use_sliding_window +
    max_window_layers semantics — full-attention layers carry a huge
    sentinel). Mutually exclusive.

    ``unroll`` straight-lines the layer scan — required for int8 params to
    keep the dequant fused into each dot (rolled loops let XLA hoist the
    dequant and materialize bf16 weight copies, CLAUDE.md ledger); leave
    rolled for bf16 / long stacks (compile size).

    ``remat`` checkpoints each scanned layer for the BACKWARD pass
    (training): activations inside a layer are recomputed from the layer
    input instead of stored, cutting peak training memory from
    O(L × per-layer activations) to O(L × hidden) at ~⅓ extra forward
    FLOPs. Same values — recomputation reruns identical ops."""
    assert sliding_window is None or layer_windows is None

    def layer_step(h, xs):
        layer, window = xs
        x = rms_norm(h, layer["input_norm"], dims.eps)
        q, k, v = _project_qkv(layer, x, dims)
        q = apply_rope(q, cos[:, :, None, :], sin[:, :, None, :])
        k = apply_rope(k, cos[:, :, None, :], sin[:, :, None, :])
        attn = attention_prefill(
            q, k, v, pad_mask=pad_mask,
            sliding_window=sliding_window if window is None else window,
        )
        h = h + _maybe_scale(
            layer, "attn_scale", _w_matmul(layer, "wo", attn.reshape(*h.shape[:-1], -1))
        )
        h = h + _maybe_scale(
            layer, "mlp_scale", _mlp(layer, rms_norm(h, layer["post_attn_norm"], dims.eps))
        )
        return h, (k, v)

    body = jax.checkpoint(layer_step) if remat else layer_step
    if layer_windows is None:
        step = lambda h, layer: body(h, (layer, None))  # noqa: E731
        hidden, (ks, vs) = jax.lax.scan(step, hidden, params, unroll=unroll)
    else:
        hidden, (ks, vs) = jax.lax.scan(
            body, hidden, (params, jnp.asarray(layer_windows)),
            unroll=unroll,
        )
    return hidden, ks, vs


def _cache_layer(cache, l):
    """Per-layer view of a stacked KV cache (array or int8 dict)."""
    if isinstance(cache, dict):
        return {"i8": cache["i8"][l], "s": cache["s"][l]}
    return cache[l]


def _cache_write_token(cache, l, rows, write_pos, x, b):
    """Write one token's K or V [B, KV, hd] into a stacked cache at
    (l, row, write_pos[row]) — int8 dict caches quantize at the write."""
    if isinstance(cache, dict):
        q8, s = quantize_kv(x)
        s = s.astype(cache["s"].dtype)
        if b == 1:
            i8 = jax.lax.dynamic_update_slice(
                cache["i8"], q8[None, :, None], (l, 0, write_pos[0], 0, 0)
            )
            sc = jax.lax.dynamic_update_slice(
                cache["s"], s[None, :, None, :], (l, 0, write_pos[0], 0)
            )
        else:
            i8 = cache["i8"].at[l, rows, write_pos].set(q8)
            sc = cache["s"].at[l, rows, write_pos].set(s)
        return {"i8": i8, "s": sc}
    if b == 1:
        return jax.lax.dynamic_update_slice(
            cache, x[None, :, None].astype(cache.dtype), (l, 0, write_pos[0], 0, 0)
        )
    return cache.at[l, rows, write_pos].set(x.astype(cache.dtype))


def trunk_decode_step(
    params: dict,
    dims: TrunkDims,
    hidden: jnp.ndarray,   # [B, D] — the new token's embedding
    cos: jnp.ndarray,      # [B, hd]
    sin: jnp.ndarray,
    k_cache: jnp.ndarray,  # [L, B, S_max, KV, hd]
    v_cache: jnp.ndarray,
    cur_len: jnp.ndarray,  # int32 scalar or [B] — length *including* this token
    *,
    valid_from: Optional[jnp.ndarray] = None,  # [B]
    sliding_window: Optional[int] = None,
    layer_windows: Optional[jnp.ndarray] = None,  # [L] per-layer window
    unroll_layers: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token forward across all layers. Returns (hidden, k_cache, v_cache).

    ``cur_len`` may be per-row ([B]) — continuous-batching slots then write
    their K/V at independent cache positions (one scatter per layer).

    ``unroll_layers`` python-unrolls the layer loop: every weight reference
    becomes a *static* slice of the stacked params, giving XLA a straight-line
    program it can prefetch across (the ``fori_loop`` form reads each layer
    via a dynamic slice it cannot hoist). Worth it for the sub-talker, whose
    5-layer step runs G times per frame as the decode's HBM bottleneck."""
    assert sliding_window is None or layer_windows is None
    b = hidden.shape[0]
    cur_len_b = jnp.broadcast_to(jnp.asarray(cur_len), (b,))
    write_pos = cur_len_b - 1
    rows = jnp.arange(b)
    if layer_windows is not None:
        layer_windows = jnp.asarray(layer_windows)

    def body(l, carry):
        h, kc, vc = carry
        # With a python-int l (unrolled) this is a static slice; with a traced
        # l (fori_loop) it lowers to dynamic-slice reads per layer.
        layer = jax.tree_util.tree_map(lambda p: p[l], params)
        x = rms_norm(h, layer["input_norm"], dims.eps)
        q, k, v = _project_qkv(layer, x, dims)
        q = apply_rope(q, cos[:, None, :], sin[:, None, :])
        k = apply_rope(k, cos[:, None, :], sin[:, None, :])
        # Single row (streaming / prefill-of-one): a contiguous dynamic
        # slice write is cheaper than a scatter. (Measured: for b>1 the
        # scatter wins even when all rows share one position — a batched
        # DUS on the sub-talker micro-decode was 5% slower, 6.05 vs
        # 5.79 ms/frame at b32.)
        kc = _cache_write_token(kc, l, rows, write_pos, k, b)
        vc = _cache_write_token(vc, l, rows, write_pos, v, b)
        attn = attention_decode_step(
            q, _cache_layer(kc, l), _cache_layer(vc, l),
            cur_len=cur_len_b, valid_from=valid_from,
            sliding_window=(sliding_window if layer_windows is None
                            else layer_windows[l]),
        )
        h = h + _maybe_scale(
            layer, "attn_scale", _w_matmul(layer, "wo", attn.reshape(h.shape[0], -1))
        )
        h = h + _maybe_scale(
            layer, "mlp_scale", _mlp(layer, rms_norm(h, layer["post_attn_norm"], dims.eps))
        )
        return h, kc, vc

    if unroll_layers:
        carry = (hidden, k_cache, v_cache)
        for l in range(dims.num_layers):
            carry = body(l, carry)
        hidden, k_cache, v_cache = carry
    else:
        hidden, k_cache, v_cache = jax.lax.fori_loop(
            0, dims.num_layers, body, (hidden, k_cache, v_cache)
        )
    return hidden, k_cache, v_cache
