"""Pallas TPU kernel: fused single-token GQA decode attention.

The TPU counterpart of the Metal engine's fused attention shader
(metal/qwen_tts_metal_kernels.metal:596-672): for one new token per sequence,
compute masked scores over the KV cache, softmax, and the weighted value sum
in a single kernel — one pass over the cache in VMEM, no intermediate HBM
round-trips.

Grid: one program per batch row. Per program the row's query block [H, hd]
and cache blocks [S, KV, hd] are staged into VMEM; scores/softmax run in f32
on the VPU/MXU with position masking (cur_len / valid_from / optional sliding
window) built from a broadcasted iota.

Exposed as `pallas_attention_decode_step`, a drop-in for
ops/attention.py::attention_decode_step (same semantics, verified in
tests/test_pallas_attention.py). Wire-up is opt-in: XLA's fused composition is
already HBM-bound on the weight stream at short cache lengths, so the kernel
pays off at long cache lengths / large batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_len_ref, valid_from_ref, q_ref, k_ref, v_ref, o_ref,
            *, groups: int, sliding_window: Optional[int], scale: float):
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)              # [H, hd]
    k = k_ref[0].astype(jnp.float32)              # [S, KV, hd]
    v = v_ref[0].astype(jnp.float32)
    s_max, kv, hd = k.shape
    h = q.shape[0]

    qg = q.reshape(kv, groups, hd)
    cur_len = cur_len_ref[b]
    valid_from = valid_from_ref[b]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_max), 1)
    mask = (pos < cur_len) & (pos >= valid_from)
    if sliding_window is not None:
        mask = mask & (pos > cur_len - 1 - sliding_window)

    # One 2D MXU matmul pair per KV head (kv is small — 2 for the talker);
    # Mosaic prefers plain 2D dots over batched 3D dot_generals.
    outs = []
    for kvh in range(kv):
        scores = jax.lax.dot_general(
            qg[kvh], k[:, kvh, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                   # [G, S]
        scores = jnp.where(mask, scores, -1e9)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [G, S]
        outs.append(jax.lax.dot_general(
            p, v[:, kvh, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                           # [G, hd]
    out = jnp.concatenate(outs, axis=0)              # [H, hd]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sliding_window", "scale", "interpret")
)
def pallas_attention_decode_step(
    q: jnp.ndarray,        # [B, H, hd]
    k_cache: jnp.ndarray,  # [B, S_max, KV, hd]
    v_cache: jnp.ndarray,
    *,
    cur_len: jnp.ndarray,  # scalar or [B]
    valid_from: Optional[jnp.ndarray] = None,  # [B]
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, hd = q.shape
    s_max, kv = k_cache.shape[1], k_cache.shape[2]
    groups = h // kv
    if scale is None:
        scale = hd ** -0.5
    cur_len_b = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32), (b,))
    if valid_from is None:
        valid_from = jnp.zeros((b,), jnp.int32)

    kernel = functools.partial(
        _kernel, groups=groups, sliding_window=sliding_window,
        scale=float(scale),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, kv, hd), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, kv, hd), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        interpret=interpret,
    )(cur_len_b, valid_from, q, k_cache, v_cache)
