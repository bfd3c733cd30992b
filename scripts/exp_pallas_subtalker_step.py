#!/usr/bin/env python3
"""DECISIVE experiment (VERDICT r2 item 2): one Pallas mega-kernel per
sub-talker micro-step — the full 5-layer int8 layer-step in a single
pallas_call (G calls/frame), attacking the ~16 µs/layer-step XLA op overhead
(5.4 ms/frame measured vs ~2.9 ms weight-stream floor at b32/32 groups).

This is the TPU approximation of the Metal zero-sync fused chain
(metal/qwen_tts_talker.c:1267-1315). Round 2 established that one
pallas_call per *matmul* loses badly (182-288 µs/layer-step vs XLA's 36 —
per-call overhead dominates); the open question is whether ONE call per
micro-step, covering all 5 layers with the weight stream pipelined through
the grid, amortizes that overhead below XLA's composed op chain.

Kernel design:

* **Batch-major activations** ``[B, D]`` with hd=128: every per-head tensor
  is a static 128-LANE slice, so QK-norm, RoPE (lane-half concat shift) and
  GQA attention need no relayouts and no batched matmuls — attention is VPU
  mul + lane-reduce against the cache held as ``[G, B, KV*hd]`` in VMEM
  (minor dim 1024 = lane-aligned for DMA slicing; an earlier feature-major
  [.., B=32] layout died on Mosaic's 128-lane slice alignment).
* **Grid = (L, 9 phases)**: 4 qkv weight chunks → attention + 2 wo chunks →
  3 fused MLP chunks (gate/up/down per chunk accumulated into the residual
  in VMEM scratch). Each phase's int8 weight block (1-2 MB) auto-pipelines
  HBM→VMEM while the previous phase computes; the hidden state lives in
  VMEM scratch across all 45 grid steps.
* KV cache rides HBM↔VMEM by hand-rolled async DMA (block read at phase 0,
  row write-back after attention), aliased input↔output.

Numerics target: the XLA int8 path (trunk_decode_step, unroll_layers=True)
to bf16 tolerance (the kernel accumulates in f32 and applies scales in f32,
so it is the *more* accurate composition). Bench harness mirrors
scripts/bench_subtalker_ablate.py ('trunk' variant scope: no
embed/head/sampling — identical in both paths, stays in XLA).

Usage:
  python scripts/exp_pallas_subtalker_step.py --check          # numerics
  python scripts/exp_pallas_subtalker_step.py --bench          # TPU timing
  python scripts/exp_pallas_subtalker_step.py --check --interpret --cpu
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flagship code-predictor dims (config.py CodePredictorConfig).
L = 5
D = 1024
H = 16
KV = 8
HD = 128
GRP = H // KV          # GQA queries per kv head = 2
I = 3072
IC = I // 3            # MLP chunk width
EPS = 1e-6
SCALE = HD ** -0.5
NP = 9                  # grid phases per layer


# ---------------------------------------------------------------------------
# Weight packing: standard int8 trunk dict -> kernel operands
# ---------------------------------------------------------------------------

def pack_weights(tq: dict, trunk_f32: dict):
    """tq: quantize_trunk_int8(trunk) with separate wq/wk/wv. int8 values are
    identical to the XLA path's (concat does not change per-out-channel
    scales), so any output delta is pure op-composition rounding."""
    return {
        "wqkv": jnp.concatenate(
            [tq["wq_i8"], tq["wk_i8"], tq["wv_i8"]], axis=-1),  # [L,1024,4096]
        "qkv_s": jnp.concatenate(
            [tq["wq_s"], tq["wk_s"], tq["wv_s"]], axis=-1
        ).astype(jnp.float32),                                   # [L,1,4096]
        "wo": tq["wo_i8"],                                       # [L,2048,1024]
        "wo_s": tq["wo_s"].astype(jnp.float32),                  # [L,1,1024]
        "gu": jnp.stack([tq["gate_i8"], tq["up_i8"]], axis=1),   # [L,2,1024,3072]
        "gu_s": jnp.stack([tq["gate_s"], tq["up_s"]], axis=1
                          ).astype(jnp.float32),                 # [L,2,1,3072]
        "down": tq["down_i8"],                                   # [L,3072,1024]
        "down_s": tq["down_s"].astype(jnp.float32),              # [L,1,1024]
        "in_norm": trunk_f32["input_norm"].astype(jnp.float32)[:, None, :],
        "post_norm": trunk_f32["post_attn_norm"].astype(jnp.float32)[:, None, :],
        "q_norm": trunk_f32["q_norm"].astype(jnp.float32)[:, None, :],
        "k_norm": trunk_f32["k_norm"].astype(jnp.float32)[:, None, :],
    }


# ---------------------------------------------------------------------------
# The mega-kernel
# ---------------------------------------------------------------------------

def _rms(x32, w_row):
    """RMSNorm over the lane (feature) axis of [B, D] f32; mimics
    ops/norms.rms_norm's cast order (normed->bf16, then weight-mul)."""
    var = jnp.mean(jnp.square(x32), axis=1, keepdims=True)
    normed = (x32 * jax.lax.rsqrt(var + EPS)).astype(jnp.bfloat16)
    return w_row.astype(jnp.bfloat16) * normed


def _rope(x32, cos, sin):
    """Rotate-half RoPE on [B, HD] f32 (lane-half concat shift)."""
    half = HD // 2
    rot = jnp.concatenate([-x32[:, half:], x32[:, :half]], axis=1)
    return x32 * cos + rot * sin


def _head_norm_rope(xh, w_row, cos, sin):
    var = jnp.mean(jnp.square(xh), axis=1, keepdims=True)
    n = (xh * jax.lax.rsqrt(var + EPS)).astype(jnp.bfloat16)
    n = (w_row.astype(jnp.bfloat16) * n).astype(jnp.float32)
    return _rope(n, cos, sin)


def _kernel(pos_ref,
            x_ref, cos_ref, sin_ref,
            wqkv_ref, qkv_s_ref, wo_ref, wo_s_ref,
            gu_ref, gu_s_ref, down_ref, down_s_ref,
            in_norm_ref, post_norm_ref, q_norm_ref, k_norm_ref,
            kin_ref, vin_ref,
            h_out_ref, kout_ref, vout_ref,
            h_s, xn_s, qkv_s, attn_s, kc_s, vc_s, sems,
            *, g_max: int, batch: int):
    l = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[0]

    # -- phase 0: residual init / rms norm + start cache DMA ----------------
    @pl.when(p == 0)
    def _():
        @pl.when(l == 0)
        def _():
            h_s[:] = x_ref[:].astype(jnp.float32)
        xn_s[:] = _rms(h_s[:], in_norm_ref[0])
        pltpu.make_async_copy(kin_ref.at[l], kc_s, sems.at[0]).start()
        pltpu.make_async_copy(vin_ref.at[l], vc_s, sems.at[1]).start()

    # -- phases 0..3: qkv chunk matmuls ------------------------------------
    @pl.when(p < 4)
    def _():
        w = wqkv_ref[0].astype(jnp.bfloat16)             # [1024, 1024]
        out = jax.lax.dot_general(
            xn_s[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * qkv_s_ref[0]
        qkv_s[:, pl.ds(p * D, D)] = out

    # -- phase 4: qk norm + rope + cache row + attention + wo chunk 0 ------
    @pl.when(p == 4)
    def _():
        cos = cos_ref[:]                                  # [1, HD] f32
        sin = sin_ref[:]

        pltpu.make_async_copy(kin_ref.at[l], kc_s, sems.at[0]).wait()
        pltpu.make_async_copy(vin_ref.at[l], vc_s, sems.at[1]).wait()

        # k/v heads: norm + rope, write row `pos` of the VMEM cache.
        for c in range(KV):
            kh = qkv_s[:, pl.ds((H + c) * HD, HD)]        # [B, HD] f32
            khr = _head_norm_rope(kh, k_norm_ref[0], cos, sin)
            kc_s[pl.ds(pos, 1), :, pl.ds(c * HD, HD)] = (
                khr.astype(jnp.bfloat16)[None]
            )
            vh = qkv_s[:, pl.ds((H + KV + c) * HD, HD)]
            vc_s[pl.ds(pos, 1), :, pl.ds(c * HD, HD)] = (
                vh.astype(jnp.bfloat16)[None]
            )

        # write the new row back to HBM (both caches), 64 KB each.
        ko = pltpu.make_async_copy(
            kc_s.at[pl.ds(pos, 1)], kout_ref.at[l].at[pl.ds(pos, 1)],
            sems.at[2],
        )
        vo = pltpu.make_async_copy(
            vc_s.at[pl.ds(pos, 1)], vout_ref.at[l].at[pl.ds(pos, 1)],
            sems.at[3],
        )
        ko.start()
        vo.start()

        # attention per query head: VPU mul + lane-reduce, positions on the
        # outer dim, batch on sublanes — no relayouts, no batched matmuls.
        # Products stay bf16 (half the VPU traffic); accumulation is f32 via
        # the sum dtype, mirroring XLA's bf16-einsum-with-f32-accumulate.
        if os.environ.get("QTTS_EXP_NOATTN"):
            # ablation: locate the attention share of the step time
            attn_s[:] = qkv_s[:, pl.ds(0, 2 * D)].astype(jnp.bfloat16)
        elif os.environ.get("QTTS_EXP_VPUATTN"):
            # v1 formulation: per-head VPU mul + lane-reduce. Measured
            # +47 us/micro-step over the stub — the serial VPU chain is the
            # whole deficit vs XLA. Kept for the ablation record.
            jmask = jax.lax.broadcasted_iota(
                jnp.int32, (g_max, batch), 0) <= pos      # [G, B]
            for h in range(H):
                qh = qkv_s[:, pl.ds(h * HD, HD)]          # [B, HD] f32
                qhr = _head_norm_rope(qh, q_norm_ref[0], cos, sin)
                qhb = qhr.astype(jnp.bfloat16)
                c = h // GRP
                k3 = kc_s[:, :, pl.ds(c * HD, HD)]        # [G, B, HD] bf16
                scores = jnp.sum(k3 * qhb[None], axis=2,
                                 dtype=jnp.float32) * SCALE     # [G, B]
                scores = jnp.where(jmask, scores, -1e9)
                m = jnp.max(scores, axis=0, keepdims=True)
                e = jnp.exp(scores - m)
                prob = e / jnp.sum(e, axis=0, keepdims=True)    # [G, B]
                v3 = vc_s[:, :, pl.ds(c * HD, HD)]
                oh = jnp.sum(prob[:, :, None] * v3, axis=0,
                             dtype=jnp.float32)                 # [B, HD]
                attn_s[:, pl.ds(h * HD, HD)] = oh.astype(jnp.bfloat16)
        else:
            # v2 cross-product MXU formulation: compute the FULL [G*B, B]
            # score matrix per head on the (otherwise idle) MXU — 32x
            # redundant FLOPs but ~free next to the weight stream — then
            # softmax only the block-diagonal (row g*B+b, column b) via a
            # precomputed mask, and contract probabilities straight back:
            # out = P^T-free dot_general(P [G*B, B], V [G*B, HD]) since
            # off-diagonal P entries are zero. No relayouts anywhere.
            gb = g_max * batch
            rows_b = jax.lax.broadcasted_iota(jnp.int32, (gb, batch), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (gb, batch), 1)
            diag = (rows_b % batch) == cols
            valid = diag & ((rows_b // batch) <= pos)     # [G*B, B]
            for h in range(H):
                qh = qkv_s[:, pl.ds(h * HD, HD)]          # [B, HD] f32
                qhr = _head_norm_rope(qh, q_norm_ref[0], cos, sin)
                qhb = qhr.astype(jnp.bfloat16)
                c = h // GRP
                k3 = kc_s[:, :, pl.ds(c * HD, HD)].reshape(gb, HD)
                scoresx = jax.lax.dot_general(
                    k3, qhb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * SCALE                                  # [G*B, B]
                scoresx = jnp.where(valid, scoresx, -1e9)
                m = jnp.max(scoresx, axis=0, keepdims=True)     # per column b
                e = jnp.where(valid, jnp.exp(scoresx - m), 0.0)
                prob = e / jnp.sum(e, axis=0, keepdims=True)    # [G*B, B]
                v3 = vc_s[:, :, pl.ds(c * HD, HD)].reshape(gb, HD)
                oh = jax.lax.dot_general(
                    prob.astype(jnp.bfloat16), v3,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [B, HD]
                attn_s[:, pl.ds(h * HD, HD)] = oh.astype(jnp.bfloat16)

        ko.wait()
        vo.wait()

        w = wo_ref[0].astype(jnp.bfloat16)                # [1024, 1024]
        h_s[:] = h_s[:] + jax.lax.dot_general(
            attn_s[:, pl.ds(0, D)], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * wo_s_ref[0]

    # -- phase 5: wo chunk 1, then post-attn norm --------------------------
    @pl.when(p == 5)
    def _():
        w = wo_ref[0].astype(jnp.bfloat16)
        h_s[:] = h_s[:] + jax.lax.dot_general(
            attn_s[:, pl.ds(D, D)], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * wo_s_ref[0]
        xn_s[:] = _rms(h_s[:], post_norm_ref[0])

    # -- phases 6..8: fused MLP chunks (gate/up/down, residual-accumulated) -
    @pl.when(p >= 6)
    def _():
        gw = gu_ref[0, 0].astype(jnp.bfloat16)            # [1024, IC]
        uw = gu_ref[0, 1].astype(jnp.bfloat16)
        gp = jax.lax.dot_general(
            xn_s[:], gw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * gu_s_ref[0, 0]
        up = jax.lax.dot_general(
            xn_s[:], uw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * gu_s_ref[0, 1]
        part = (gp * jax.nn.sigmoid(gp) * up).astype(jnp.bfloat16)
        dw = down_ref[0].astype(jnp.bfloat16)             # [IC, 1024]
        h_s[:] = h_s[:] + jax.lax.dot_general(
            part, dw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * down_s_ref[0]

        @pl.when((p == NP - 1) & (l == L - 1))
        def _():
            h_out_ref[:] = h_s[:].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("g_max", "interpret"))
def pallas_subtalker_trunk_step(
    packed: dict,
    x: jnp.ndarray,         # [B, D] bf16
    cos: jnp.ndarray,       # [1, HD] f32 for this position
    sin: jnp.ndarray,
    kcacheT: jnp.ndarray,   # [L, G, B, KV*HD] bf16 (kernel cache layout)
    vcacheT: jnp.ndarray,
    pos: jnp.ndarray,       # scalar int32
    *,
    g_max: int,
    interpret: bool = False,
):
    batch = x.shape[0]
    kernel = functools.partial(_kernel, g_max=g_max, batch=batch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NP),
        in_specs=[
            pl.BlockSpec((batch, D), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),                    # x
            pl.BlockSpec((1, HD), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),                    # cos
            pl.BlockSpec((1, HD), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),                    # sin
            pl.BlockSpec((1, D, D),
                         lambda l, p, s: (l, 0, jnp.minimum(p, 3)),
                         memory_space=pltpu.VMEM),                    # wqkv
            pl.BlockSpec((1, 1, D),
                         lambda l, p, s: (l, 0, jnp.minimum(p, 3)),
                         memory_space=pltpu.VMEM),                    # qkv_s
            pl.BlockSpec((1, D, D),
                         lambda l, p, s: (l, jnp.where(p <= 4, 0, 1), 0),
                         memory_space=pltpu.VMEM),                    # wo
            pl.BlockSpec((1, 1, D), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # wo_s
            pl.BlockSpec((1, 2, D, IC),
                         lambda l, p, s: (l, 0, 0, jnp.clip(p - 6, 0, 2)),
                         memory_space=pltpu.VMEM),                    # gu
            pl.BlockSpec((1, 2, 1, IC),
                         lambda l, p, s: (l, 0, 0, jnp.clip(p - 6, 0, 2)),
                         memory_space=pltpu.VMEM),                    # gu_s
            pl.BlockSpec((1, IC, D),
                         lambda l, p, s: (l, jnp.clip(p - 6, 0, 2), 0),
                         memory_space=pltpu.VMEM),                    # down
            pl.BlockSpec((1, 1, D), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # down_s
            pl.BlockSpec((1, 1, D), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # in_norm
            pl.BlockSpec((1, 1, D), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # post_norm
            pl.BlockSpec((1, 1, HD), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # q_norm
            pl.BlockSpec((1, 1, HD), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),                    # k_norm
            pl.BlockSpec(memory_space=pl.ANY),                        # kin
            pl.BlockSpec(memory_space=pl.ANY),                        # vin
        ],
        out_specs=[
            pl.BlockSpec((batch, D), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),                    # h out
            pl.BlockSpec(memory_space=pl.ANY),                        # kout
            pl.BlockSpec(memory_space=pl.ANY),                        # vout
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, D), jnp.float32),          # h_s
            pltpu.VMEM((batch, D), jnp.bfloat16),         # xn_s
            pltpu.VMEM((batch, 4 * D), jnp.float32),      # qkv_s
            pltpu.VMEM((batch, 2 * D), jnp.bfloat16),     # attn_s
            pltpu.VMEM((g_max, batch, KV * HD), jnp.bfloat16),  # kc_s
            pltpu.VMEM((g_max, batch, KV * HD), jnp.bfloat16),  # vc_s
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    h, kout, vout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, D), jnp.bfloat16),
            jax.ShapeDtypeStruct(kcacheT.shape, kcacheT.dtype),
            jax.ShapeDtypeStruct(vcacheT.shape, vcacheT.dtype),
        ],
        # operand order: pos(0) x(1) cos(2) sin(3) w...(4..15) kin(16) vin(17)
        input_output_aliases={16: 1, 17: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32)[None],
      x, cos, sin,
      packed["wqkv"], packed["qkv_s"], packed["wo"], packed["wo_s"],
      packed["gu"], packed["gu_s"], packed["down"], packed["down_s"],
      packed["in_norm"], packed["post_norm"], packed["q_norm"],
      packed["k_norm"], kcacheT, vcacheT)
    return h, kout, vout


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def build(g_max, seed=0):
    import dataclasses

    from qwen_tts_tpu.config import TalkerConfig
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models.trunk import quantize_trunk_int8, init_trunk_params

    cfg0 = TalkerConfig()
    cp = dataclasses.replace(cfg0.code_predictor, num_code_groups=g_max)
    dims = st_mod.subtalker_dims(cp)
    rng = jax.random.PRNGKey(seed)
    trunk = init_trunk_params(rng, dims, jnp.bfloat16)
    tq = quantize_trunk_int8(trunk)
    packed = pack_weights(tq, trunk)
    return cp, dims, tq, packed


def run_check(args):
    from qwen_tts_tpu.models.trunk import trunk_decode_step
    from qwen_tts_tpu.ops.rope import rope_cos_sin

    b, g = args.batch, args.groups
    cp, dims, tq, packed = build(g)
    rng = jax.random.PRNGKey(7)
    cos_all, sin_all = rope_cos_sin(
        jnp.arange(g, dtype=jnp.int32), HD, cp.rope_theta)

    kc = jnp.zeros((L, b, g, KV, HD), jnp.bfloat16)
    vc = jnp.zeros((L, b, g, KV, HD), jnp.bfloat16)
    kcT = jnp.zeros((L, g, b, KV * HD), jnp.bfloat16)
    vcT = jnp.zeros((L, g, b, KV * HD), jnp.bfloat16)

    worst = 0.0
    for pos in range(min(g, 4)):
        x = jax.random.normal(jax.random.fold_in(rng, pos), (b, D),
                              jnp.bfloat16)
        cos = jnp.broadcast_to(cos_all[pos][None], (b, HD))
        sin = jnp.broadcast_to(sin_all[pos][None], (b, HD))
        h_ref, kc, vc = trunk_decode_step(
            tq, dims, x, cos, sin, kc, vc, pos + 1, unroll_layers=True)

        h_got, kcT, vcT = pallas_subtalker_trunk_step(
            packed, x, cos_all[pos][None], sin_all[pos][None],
            kcT, vcT, pos, g_max=g, interpret=args.interpret)
        got = np.asarray(h_got, np.float32)
        want = np.asarray(h_ref, np.float32)
        err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-6)
        print(f"pos {pos}: rel err {err:.4f} "
              f"(|h| max {np.max(np.abs(want)):.2f})")
        worst = max(worst, err)
        kc_rows = np.asarray(kc[:, :, pos], np.float32)          # [L,b,KV,HD]
        kcT_rows = np.asarray(kcT[:, pos], np.float32)           # [L,b,KV*HD]
        cerr = np.max(np.abs(kc_rows - kcT_rows.reshape(L, b, KV, HD)))
        print(f"         cache row max|Δ| {cerr:.5f}")
        worst = max(worst, cerr)
    ok = worst < args.tol
    print(f"CHECK {'OK' if ok else 'FAIL'} (worst {worst:.4f}, "
          f"tol {args.tol})")
    return 0 if ok else 1


def run_bench(args):
    from qwen_tts_tpu.models.trunk import trunk_decode_step
    from qwen_tts_tpu.ops.rope import rope_cos_sin
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, g = args.batch, args.groups
    cp, dims, tq, packed = build(g)
    rng = jax.random.PRNGKey(3)
    cos_all, sin_all = rope_cos_sin(
        jnp.arange(g, dtype=jnp.int32), HD, cp.rope_theta)
    hidden0 = jax.random.normal(rng, (b, D), jnp.bfloat16)

    # XLA 'trunk' variant (bench_subtalker_ablate methodology): G micro-steps
    # per frame, `frames` frames in a scan, hidden folded forward.
    @jax.jit
    def xla_frames(tq, hidden):
        def frame(h0, _):
            kc = jnp.zeros((L, b, g, KV, HD), jnp.bfloat16)
            vc = jnp.zeros((L, b, g, KV, HD), jnp.bfloat16)
            def step(carry, pos):
                h, kc, vc = carry
                cos = jnp.broadcast_to(cos_all[pos][None], (b, HD))
                sin = jnp.broadcast_to(sin_all[pos][None], (b, HD))
                h2, kc, vc = trunk_decode_step(
                    tq, dims, h, cos, sin, kc, vc, pos + 1,
                    unroll_layers=True)
                return (h2, kc, vc), None
            (h, _, _), _ = jax.lax.scan(
                step, (h0, kc, vc), jnp.arange(g, dtype=jnp.int32),
                unroll=4)
            return h0 + h.astype(h0.dtype) * 1e-6, None
        h, _ = jax.lax.scan(frame, hidden, None, length=args.frames)
        return h

    @jax.jit
    def pallas_frames(packed, hidden):
        def frame(h0, _):
            kcT = jnp.zeros((L, g, b, KV * HD), jnp.bfloat16)
            vcT = jnp.zeros((L, g, b, KV * HD), jnp.bfloat16)
            def step(carry, pos):
                h, kcT, vcT = carry
                h2, kcT, vcT = pallas_subtalker_trunk_step(
                    packed, h, cos_all[pos][None], sin_all[pos][None],
                    kcT, vcT, pos, g_max=g)
                return (h2, kcT, vcT), None
            (h, _, _), _ = jax.lax.scan(
                step, (h0, kcT, vcT), jnp.arange(g, dtype=jnp.int32))
            return h0 + h.astype(h0.dtype) * 1e-6, None
        h, _ = jax.lax.scan(frame, hidden, None, length=args.frames)
        return h

    for name, fn, arg in (("xla   trunk", xla_frames, tq),
                          ("pallas trunk", pallas_frames, packed)):
        t0 = time.time()
        float(jnp.sum(fn(arg, hidden0).astype(jnp.float32)))
        print(f"{name}: warmup {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(fn(arg, hidden0).astype(jnp.float32)))
            times.append(time.time() - t0)
        ms = min(times) / args.frames * 1e3
        us_step = ms * 1e3 / g
        print(f"{name}: {ms:7.3f} ms/frame  ({us_step:6.1f} us/micro-step)  "
              f"runs {[round(t*1e3) for t in times]} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--tol", type=float, default=0.08)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    rc = 0
    if args.check:
        rc = run_check(args)
    if args.bench and rc == 0:
        run_bench(args)
    return rc


if __name__ == "__main__":
    sys.exit(main())
