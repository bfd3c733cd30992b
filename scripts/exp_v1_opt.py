#!/usr/bin/env python3
"""Measure the round-5 25 Hz (V1) decoder optimizations on real hardware.

VERDICT r4 item 1: the r4 ablation (bench_codec_v1_ablate.json) attributed
~2x of headroom — DiT block-local attention at 86.8 TF/s vs the 178.6 TF/s
matmul floor (24-row MXU tiles), and the BigVGAN anti-alias kaiser-sinc
pair at 185.4 ms vs a 100.3 ms conv floor. This measures the candidate
fixes through the REAL entry points (no re-implementation):

  dit_local       dit_sample(attn_impl="local")       r3/r4 shipping path
  dit_chunked     dit_sample(attn_impl="chunked")     lane-packed tiles
  dit_chunked_hs  dit_sample(attn_impl="chunked_hs")  + half-split rope
  bv_conv         bigvgan_forward(aa_impl="conv")     r3/r4 shipping path
  bv_poly         bigvgan_forward(aa_impl="poly")     phase-split AA snake
  full_old / full_new    codec_v1_decode with both ends of each switch

Every variant is ONE jitted program ending in a forced device→host fetch
(axon tunnel: block_until_ready alone reports fiction).

Usage: python scripts/exp_v1_opt.py [--batch 8 --seconds 10 --runs 3] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--variants", default=(
        "dit_local,dit_chunked,dit_chunked_hs,bv_conv,bv_poly,"
        "full_old,full_new"))
    p.add_argument("--json-out", default=None)
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
    dcfg = cfg.dit
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    params = v1.init_codec_v1_params(rng, cfg, dtype)

    b = args.batch
    t_codes = int(args.seconds * 25)
    codes = jax.random.randint(
        jax.random.fold_in(rng, 1), (b, t_codes), 0, dcfg.num_embeds - 1)
    xv = jax.random.normal(
        jax.random.fold_in(rng, 2), (b, dcfg.enc_emb_dim), jnp.float32)
    ref_mels = jax.random.normal(
        jax.random.fold_in(rng, 3), (b, 100, dcfg.mel_dim), jnp.float32) * 0.1

    dit_fn = jax.jit(v1.dit_sample, static_argnames=("cfg", "attn_impl"))
    bv_fn = jax.jit(v1.bigvgan_forward, static_argnames=("cfg", "aa_impl"))

    mel = dit_fn(params["dit"], dcfg, codes, ref_mels, xv,
                 jax.random.PRNGKey(0), attn_impl="local")
    mel.block_until_ready()

    def make_run(name):
        if name.startswith("dit_"):
            impl = name[4:]

            def run(seed):
                m = dit_fn(params["dit"], dcfg, codes, ref_mels, xv,
                           jax.random.PRNGKey(seed), attn_impl=impl)
                return float(jnp.sum(m.astype(jnp.float32)))
        elif name.startswith("bv_"):
            impl = name[3:]

            def run(seed):
                w = bv_fn(params["bigvgan"], cfg.bigvgan, mel, aa_impl=impl)
                return float(jnp.sum(w.astype(jnp.float32)))
        else:
            combos = {"full_bo": ("local_hs_bo", "conv"),
                      "full_old": ("local", "conv"),
                      "full_new": ("chunked_hs", "poly"),
                      "full_lhs_polyc": ("local_hs", "polyc"),
                      "full_adopted": ("local_hs", "conv")}
            attn, aa = combos[name]

            def run(seed):
                w = v1.codec_v1_decode(params, cfg, codes, xv, ref_mels,
                                       jax.random.PRNGKey(seed),
                                       attn_impl=attn, aa_impl=aa)
                return float(jnp.sum(w.astype(jnp.float32)))
        return run

    audio_sec = b * t_codes * cfg.decode_upsample_rate / cfg.output_sample_rate
    results = {}
    for name in args.variants.split(","):
        run = make_run(name)
        print(f"[exp] {name}: warmup…", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run(0)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.runs):
            run(i + 1)
        wall = (time.perf_counter() - t0) / args.runs
        entry = {"ms": round(wall * 1e3, 1), "warmup_s": round(warm, 1)}
        if name.startswith("full"):
            entry["rtf"] = round(audio_sec / wall, 1)
        results[name] = entry
        print(f"{name:16s} {entry['ms']:8.1f} ms"
              + (f"  rtf {entry['rtf']}" if "rtf" in entry else ""))

    out = {"results": results, "batch": b, "codes": t_codes}
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
