#!/usr/bin/env python3
"""Micro-benchmark of the sub-talker 32-step micro-decode — THE decode
bottleneck (its 5-layer trunk is re-streamed from HBM every step: ~150 MB
bf16 x 32 steps ~= 4.8 GB/frame; CLAUDE.md 'Decode perf is HBM-bound').

Runs N frames of the greedy micro-decode inside ONE jitted program (scan over
frames) at flagship dims on the real TPU, for several weight/step variants:

  base      current bf16 scan
  unroll    scan with unroll=4 (longer straight-line program for prefetch)
  int8      current opt-in quantize_trunk_int8 (dequant-into-dot)
  int8v     int8 weights + int8 per-token dynamic activation quant (s8xs8 MXU)

Prints ms/frame and effective HBM GB/s per variant.

Usage: python scripts/bench_subtalker.py [--batch 32] [--frames 25]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--variants", default="base,unroll,int8")
    p.add_argument("--groups", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.config import TalkerConfig
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models.trunk import quantize_trunk_int8
    from qwen_tts_tpu.ops.sampling import SamplingConfig

    cfg0 = TalkerConfig()
    import dataclasses

    cp = dataclasses.replace(cfg0.code_predictor, num_code_groups=args.groups)
    cfg = dataclasses.replace(cfg0, num_code_groups=args.groups,
                              code_predictor=cp)
    dtype = jnp.bfloat16
    b = args.batch

    rng = jax.random.PRNGKey(0)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size, dtype
    )
    codec_embedding = jax.random.normal(
        jax.random.fold_in(rng, 2), (cfg.vocab_size, cfg.hidden_size), dtype
    )
    greedy = SamplingConfig(do_sample=False)

    # Weight bytes the micro-decode must stream per frame (trunk re-read each
    # of the G steps; embeds/lm_heads are gathered one slice per step).
    def nbytes(t):
        return t.size * t.dtype.itemsize

    trunk_bytes = sum(nbytes(v) for v in jax.tree_util.tree_leaves(
        st_params["trunk"]))
    slice_bytes = (st_params["embeds"][0].size
                   + st_params["lm_heads"][0].size) * 2
    per_frame = trunk_bytes * args.groups + slice_bytes * (args.groups - 1)

    def make_runner(params, unroll=1, unroll_layers=False, jacobi=None):
        def frames_loop(params, hidden, first):
            # Each frame's inputs depend on the previous frame's outputs
            # (like the real AR loop) so XLA cannot hoist the body.
            def body(carry, _):
                hidden, first = carry
                if jacobi is not None:
                    iters, sampled = jacobi
                    frame = st_mod.subtalker_generate_jacobi(
                        params, cfg.code_predictor, codec_embedding,
                        hidden, first,
                        sampling=SamplingConfig(
                            do_sample=True, temperature=0.9, top_k=50
                        ) if sampled else None,
                        rng=jax.random.PRNGKey(7) if sampled else None,
                        fixed_iters=iters if iters > 0 else None,
                    )
                else:
                    frame = st_mod.subtalker_generate(
                        params, cfg.code_predictor, codec_embedding,
                        hidden, first, greedy, None,
                        unroll=unroll, unroll_layers=unroll_layers,
                    )
                first = frame[:, -1] % cfg.vocab_size
                hidden = hidden + (frame.sum(axis=1) % 3).astype(hidden.dtype)[:, None] * 1e-6
                return (hidden, first), frame[:, 1]
            (hidden, first), _ = jax.lax.scan(
                body, (hidden, first), None, length=args.frames
            )
            return first

        fn = jax.jit(frames_loop)
        hidden = jax.random.normal(
            jax.random.fold_in(rng, 3), (b, cfg.hidden_size), dtype
        )
        first = jnp.zeros((b,), jnp.int32)
        return fn, (params, hidden, first)

    results = {}
    for variant in args.variants.split(","):
        params = st_params
        kw = {}
        if variant.startswith("int8") or variant.startswith("jac"):
            params = dict(st_params)
            params["trunk"] = quantize_trunk_int8(st_params["trunk"])
        if variant.startswith("jac"):
            # jacN = Jacobi fixed-point micro-decode pinned to N iterations
            # (per-iteration cost / crossover probe); jacsN = the sampled
            # (gumbel key-reuse) variant; bare "jac"/"jacs" runs the adaptive
            # while_loop — worst-case ~G-1 iters on random weights.
            params = st_mod.quantize_subtalker_tables_int8(params)
            sampled = variant.startswith("jacs")
            tail = variant[4 if sampled else 3:]
            kw["jacobi"] = (int(tail) if tail else 0, sampled)
        if "L" in variant:
            kw["unroll_layers"] = True
        if variant.endswith("u2"):
            kw["unroll"] = 2
        if variant.endswith("u4"):
            kw["unroll"] = 4
        fn, fn_args = make_runner(params, **kw)
        # Force a device->host fetch: block_until_ready does not reliably
        # sync over the axon tunnel (CLAUDE.md).
        float(jnp.sum(fn(*fn_args)))  # compile
        t0 = time.perf_counter()
        runs = 3
        for _ in range(runs):
            float(jnp.sum(fn(*fn_args)))
        dt = (time.perf_counter() - t0) / runs
        ms_frame = dt / args.frames * 1e3
        scale = 0.5 if variant.startswith("int8") else 1.0
        gbps = per_frame * scale / (dt / args.frames) / 1e9
        results[variant] = ms_frame
        print(f"{variant:8s}  {ms_frame:7.3f} ms/frame   "
              f"~{gbps:6.0f} GB/s effective")

    base = results.get("base")
    if base:
        for k, v in results.items():
            if k != "base":
                print(f"{k}: {base / v:.2f}x vs base")


if __name__ == "__main__":
    main()
