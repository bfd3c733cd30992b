#!/usr/bin/env python3
"""Benchmark suite — the framework's analog of the reference's
scripts/benchmark_py_vs_c.py / benchmark_all.py: normalized per-token and
per-audio-second metrics, warmup + measured runs, JSON report, and an optional
CI gate on regression vs a stored baseline.

Runs on whatever JAX platform is active (the real TPU by default).

Usage:
  python scripts/benchmark.py [--batch 8] [--frames 128] [--runs 3]
      [--model-dir DIR | --flagship] [--json out.json]
      [--gate baseline.json --gate-ratio 1.2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", help="real checkpoint (else random flagship dims)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--prefill", type=int, default=32)
    p.add_argument("--json", dest="json_out")
    p.add_argument("--gate", help="baseline JSON to gate against")
    p.add_argument("--gate-ratio", type=float, default=1.2,
                   help="fail if wall time exceeds baseline × ratio")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--profile", metavar="DIR",
                   help="capture a JAX/XLA profiler trace of the measured "
                        "runs into DIR (TensorBoard/XProf format)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from qwen_tts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.config import CodecDecoderConfig, TalkerConfig
    from qwen_tts_tpu.generate import GenerationParams, generate_codes
    from qwen_tts_tpu.models import codec as codec_mod
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models import talker as talker_mod

    dtype = jnp.bfloat16
    if args.model_dir:
        from qwen_tts_tpu.io.loader import load_checkpoint

        cfgs, talker_params, st_params, codec_params, _ = load_checkpoint(
            args.model_dir, talker_dtype=dtype, codec_dtype=jnp.bfloat16
        )
        cfg, codec_cfg = cfgs.talker, cfgs.codec.decoder
    else:
        cfg, codec_cfg = TalkerConfig(), CodecDecoderConfig()
        rng = jax.random.PRNGKey(0)
        talker_params = talker_mod.init_talker_params(rng, cfg, dtype)
        st_params = st_mod.init_subtalker_params(
            jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size, dtype
        )
        codec_params = codec_mod.init_codec_params(
            jax.random.fold_in(rng, 2), codec_cfg, jnp.bfloat16
        )

    b, frames, prefill = args.batch, args.frames, args.prefill
    rng = jax.random.PRNGKey(7)
    embeds = jax.random.normal(rng, (b, prefill, cfg.hidden_size), dtype)
    mask = jnp.ones((b, prefill), bool)
    trailing = jax.random.normal(
        jax.random.fold_in(rng, 1), (b, 16, cfg.hidden_size), dtype
    )

    gp = GenerationParams(max_new_tokens=frames, min_new_tokens=frames)
    decode_jit = jax.jit(codec_mod.codec_decode, static_argnums=1)

    def run_talker(seed):
        out = generate_codes(
            talker_params, st_params, cfg, embeds, mask, trailing,
            sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
            max_new_tokens=frames, rng=jax.random.PRNGKey(seed),
        )
        return jax.block_until_ready(out.codes)

    def run_codec(codes):
        c = jnp.minimum(codes[..., : codec_cfg.num_quantizers],
                        codec_cfg.codebook_size - 1)
        return jax.block_until_ready(codec_mod.chunked_decode(
            codec_params, codec_cfg, c, decode_fn=decode_jit
        ))

    for i in range(args.warmup):
        codes = run_talker(i)
        run_codec(codes)

    from qwen_tts_tpu.utils import profile_trace

    talker_times, codec_times = [], []
    with profile_trace(args.profile):
        for i in range(args.runs):
            t0 = time.perf_counter()
            codes = run_talker(100 + i)
            t1 = time.perf_counter()
            run_codec(codes)
            t2 = time.perf_counter()
            talker_times.append(t1 - t0)
            codec_times.append(t2 - t1)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    talker_s, codec_s = med(talker_times), med(codec_times)
    total_s = talker_s + codec_s
    audio_sec = b * frames * 1920 / 24000
    report = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "batch": b,
        "frames": frames,
        "prefill": prefill,
        "talker_s": round(talker_s, 4),
        "codec_s": round(codec_s, 4),
        "total_s": round(total_s, 4),
        "ms_per_token": round(talker_s * 1e3 / frames, 3),
        "ms_per_token_per_stream": round(talker_s * 1e3 / frames / b, 4),
        "ms_per_audio_sec": round(total_s * 1e3 / audio_sec, 3),
        "rtf": round(audio_sec / total_s, 2),
        "audio_sec": audio_sec,
    }
    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)

    if args.gate:
        with open(args.gate) as f:
            base = json.load(f)
        ratio = report["total_s"] / base["total_s"]
        print(f"gate: total_s ratio vs baseline = {ratio:.3f} "
              f"(limit {args.gate_ratio})")
        if ratio > args.gate_ratio:
            print("GATE FAIL", file=sys.stderr)
            return 1
        print("GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
