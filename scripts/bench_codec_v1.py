#!/usr/bin/env python3
"""25 Hz (V1) tokenizer decode benchmark — flow-matching DiT (10 Euler steps,
CFG) + BigVGAN mel vocoder at flagship dims on the real TPU.

The 12 Hz family's numbers live in bench_b32.json; this completes perf
coverage for the second tokenizer family (reference
modeling_qwen3_tts_tokenizer_v1.py:1172-1279). Writes bench_codec_v1.json.

Usage: python scripts/bench_codec_v1.py [--batch 8 --seconds 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--split", action="store_true",
                   help="also time DiT sampling and BigVGAN separately")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.config import CodecV1Config
    from qwen_tts_tpu.models import codec_v1 as v1

    cfg = CodecV1Config()
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    params = v1.init_codec_v1_params(rng, cfg, dtype)

    b = args.batch
    t_codes = int(args.seconds * 25)          # 25 Hz codes
    codes = jax.random.randint(
        jax.random.fold_in(rng, 1), (b, t_codes), 0, cfg.dit.num_embeds - 1
    )
    xv = jax.random.normal(
        jax.random.fold_in(rng, 2), (b, cfg.dit.enc_emb_dim), jnp.float32
    )
    ref_mels = jax.random.normal(
        jax.random.fold_in(rng, 3), (b, 100, cfg.dit.mel_dim), jnp.float32
    ) * 0.1

    fn = jax.jit(v1.codec_v1_decode, static_argnums=1)

    def run(seed):
        wav = fn(params, cfg, codes, xv, ref_mels, jax.random.PRNGKey(seed))
        return float(jnp.sum(wav.astype(jnp.float32)))  # force fetch (axon)

    run(0)  # compile
    t0 = time.perf_counter()
    for i in range(args.runs):
        run(i + 1)
    wall = (time.perf_counter() - t0) / args.runs

    split = {}
    if args.split:
        # Stage attribution: DiT Euler sampling vs BigVGAN vocoder.
        # CAVEAT: these standalone timings each pay their own program load +
        # dispatch over the tunnel and have measured minutes-scale variance
        # when the tunnel degrades — the full-pipeline wall above is the
        # authoritative number; use the split only for rough attribution.
        from functools import partial as _p

        dit_fn = jax.jit(_p(v1.dit_sample, num_steps=10), static_argnums=1)
        big_fn = jax.jit(v1.bigvgan_forward, static_argnums=1)

        def dit_run(seed):
            mel = dit_fn(params["dit"], cfg.dit, codes, ref_mels, xv,
                         jax.random.PRNGKey(seed))
            float(jnp.sum(mel.astype(jnp.float32)))
            return mel

        mel = dit_run(0)
        big_fn(params["bigvgan"], cfg.bigvgan, mel)
        t0 = time.perf_counter()
        for i in range(args.runs):
            dit_run(i + 1)
        split["dit_ms"] = round((time.perf_counter() - t0) / args.runs * 1e3, 1)
        t0 = time.perf_counter()
        for _ in range(args.runs):
            float(jnp.sum(big_fn(params["bigvgan"], cfg.bigvgan, mel
                                 ).astype(jnp.float32)))
        split["bigvgan_ms"] = round(
            (time.perf_counter() - t0) / args.runs * 1e3, 1)

    audio_sec = b * t_codes * cfg.decode_upsample_rate / cfg.output_sample_rate
    report = {
        "family": "25hz_v1",
        "batch": b,
        "codes": t_codes,
        "dit_steps": 10,
        "audio_sec": round(audio_sec, 2),
        "wall_ms": round(wall * 1e3, 1),
        "rtf": round(audio_sec / wall, 2),
        "ms_per_audio_sec": round(wall * 1e3 / audio_sec, 3),
        "platform": jax.devices()[0].platform,
        **split,
    }
    print(json.dumps(report, indent=2))
    if report["platform"] != "cpu":
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_codec_v1.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
