"""End-to-end benchmark on real TPU hardware.

Measures full two-stage synthesis throughput — the jitted talker+sub-talker
decode loop plus chunked codec decode — at flagship architecture dims
(random bf16 weights; throughput is weight-value-independent) and reports the
real-time factor (generated audio seconds per wall second, aggregated over the
serving batch) for TWO configurations:

* ``bf16``  — the parity default (greedy traces match the reference).
* ``int8``  — the serving mode (``Qwen3TTSModel.quantize_for_serving``):
  int8 sub-talker trunk weights halve the HBM stream that dominates decode
  (the 5-layer trunk is re-read G×/frame). Opt-in because int8 rounding
  changes sampled traces; documented in CLAUDE.md / docs.

Baseline: the reference C engine's published CPU snapshot (TODO.md:28-29):
74 tokens in ~11.2 s talker + ~4.16 s codec → 5.92 s audio / 15.36 s ≈ 0.385×
real time. ``vs_baseline`` is our RTF divided by that.

Prints ONE JSON line (headline = serving config) and writes the full
breakdown to ``bench_b32.json`` so later rounds can gate against it:
  {"metric": "rtf", "value": N, "unit": "x_realtime", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.385  # reference C CPU end-to-end (TODO.md:28-30)

BATCH = 32             # serving batch — decode is HBM-bound, so weight reads
                       # amortize across streams
FRAMES = 128           # 128 frames = 10.24 s of audio per stream
SAMPLES_PER_FRAME = 1920
SAMPLE_RATE = 24000
MEASURE_RUNS = 3


def main() -> None:
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from qwen_tts_tpu.config import CodecDecoderConfig, TalkerConfig
    from qwen_tts_tpu.generate import GenerationParams, generate_codes
    from qwen_tts_tpu.models import codec as codec_mod
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models import talker as talker_mod
    from qwen_tts_tpu.models.trunk import quantize_trunk_int8

    cfg = TalkerConfig()
    codec_cfg = CodecDecoderConfig()
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    talker_params = talker_mod.init_talker_params(rng, cfg, dtype)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size, dtype
    )
    st_params_i8 = dict(st_params)
    st_params_i8["trunk"] = quantize_trunk_int8(st_params["trunk"])
    st_params_i8 = st_mod.quantize_subtalker_tables_int8(st_params_i8)
    codec_params = codec_mod.init_codec_params(
        jax.random.fold_in(rng, 2), codec_cfg, jnp.bfloat16
    )

    prefill = 32

    def make_inputs(batch):
        e = jax.random.normal(
            jax.random.fold_in(rng, 3), (batch, prefill, cfg.hidden_size),
            dtype,
        )
        m = jnp.ones((batch, prefill), bool)
        t = jax.random.normal(
            jax.random.fold_in(rng, 4), (batch, 16, cfg.hidden_size), dtype
        )
        return e, m, t

    embeds, mask, trailing = make_inputs(BATCH)

    # Ban EOS for the whole run (min_new_tokens = FRAMES) so every stream
    # generates exactly FRAMES frames — fixed-token benchmarking, same idea as
    # the reference's --fixed-codec-tokens mode (c/main.c).
    gp = GenerationParams(
        max_new_tokens=FRAMES, min_new_tokens=FRAMES,
        do_sample=True, subtalker_do_sample=True,
    )
    sampling = gp.talker_sampling()
    st_sampling = gp.subtalker_sampling()

    decode_jit = jax.jit(codec_mod.codec_decode, static_argnums=1)

    def make_run(sp, run_cfg=cfg, tp=talker_params, batch=BATCH,
                 kv_int8=False, codec_max_batch=0):
        embeds, mask, trailing = make_inputs(batch)

        def run(seed: int):
            out = generate_codes(
                tp, sp, run_cfg, embeds, mask, trailing,
                sampling=sampling, st_sampling=st_sampling,
                max_new_tokens=FRAMES, rng=jax.random.PRNGKey(seed),
                trim_last_on_budget=False, kv_int8=kv_int8,
            )
            codes = jnp.minimum(
                out.codes[..., : codec_cfg.num_quantizers],
                codec_cfg.codebook_size - 1,
            )
            wav = codec_mod.chunked_decode(
                codec_params, codec_cfg, codes, decode_fn=decode_jit,
                max_batch=codec_max_batch,
            )
            return jax.block_until_ready(wav)
        return run

    # 12Hz-flagship variant: real 12Hz checkpoints run 16 code groups
    # (== codec quantizers), halving the sub-talker micro-decode; the
    # 32-group configs above are the conservative architecture default.
    import dataclasses

    cfg16 = dataclasses.replace(
        cfg, num_code_groups=16,
        code_predictor=dataclasses.replace(cfg.code_predictor,
                                           num_code_groups=16),
    )
    st16 = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 5), cfg16.code_predictor, cfg16.hidden_size,
        dtype,
    )
    st16 = dict(st16)
    st16["trunk"] = quantize_trunk_int8(st16["trunk"])
    st16 = st_mod.quantize_subtalker_tables_int8(st16)
    # Full serving mode also quantizes the talker trunk
    # (quantize_for_serving(talker=True)) — the 28-layer weight stream is
    # re-read every frame too.
    talker_i8 = dict(talker_params)
    talker_i8["trunk"] = quantize_trunk_int8(talker_params["trunk"])

    report = {}
    # Headline configs FIRST and the JSON line emitted as soon as they
    # finish: tunnel program loads can degrade to minutes each (CLAUDE.md
    # gotcha), and a budget-killed run should still have produced the
    # driver's metric before the secondary breakdown configs run.
    # (name, st_params, cfg, talker_params, batch, kv_int8, codec_max_batch)
    configs = (
        ("int8_16groups", st16, cfg16, talker_i8, BATCH, False, 0),
        # Max-throughput shapes. bf16-cache b96 OOM'd in round 2 at 18.75 GiB
        # — the peak was the vocoder activations (~3 live [B,T·1920,C] bufs),
        # so large batches decode the codec in b32 slices (zero redundant
        # compute). The round-3 sweep (scripts/bench_headline_sweep.py):
        # b64 538 / b80 558 / b96 565 (peak) / b128-rolled 560; int8 KV
        # (quantize_for_serving(kv=True)) costs ~1 ms/frame of quantize work
        # at this 128-frame cache depth (539 at b96) — it is the CAPACITY
        # option for 2048-token serving budgets, benched here as such.
        ("int8_16groups_b64", st16, cfg16, talker_i8, 64, False, 0),
        ("int8_16groups_b96", st16, cfg16, talker_i8, 96, False, 32),
        ("int8_16groups_b96_kv8", st16, cfg16, talker_i8, 96, True, 32),
        ("bf16", st_params, cfg, talker_params, BATCH, False, 0),
        ("int8", st_params_i8, cfg, talker_params, BATCH, False, 0),
    )
    HEADLINE = {"int8_16groups", "int8_16groups_b64", "int8_16groups_b96",
                "int8_16groups_b96_kv8"}
    emitted = False
    for name, sp, c, tp, batch, kv8, cmb in configs:
        audio_sec = batch * FRAMES * SAMPLES_PER_FRAME / SAMPLE_RATE
        run = make_run(sp, c, tp, batch, kv_int8=kv8, codec_max_batch=cmb)
        # Progress on stderr: the tunnel's program-load path sometimes
        # degrades to minutes per new program (CLAUDE.md gotcha) — these
        # lines make a slow run diagnosable from the driver log.
        print(f"[bench] {name}: warmup/compile…", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            run(0)  # warmup / compile
        except Exception as exc:  # e.g. an OOM probe config — keep benching
            print(f"[bench] {name}: FAILED ({type(exc).__name__}): "
                  f"{str(exc)[:200]}", file=sys.stderr, flush=True)
            report[name] = {"batch": batch, "error": type(exc).__name__}
            continue
        print(f"[bench] {name}: warmup {time.perf_counter() - t0:.1f}s, "
              f"measuring {MEASURE_RUNS} runs", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for i in range(MEASURE_RUNS):
            run(i + 1)
        wall = (time.perf_counter() - t0) / MEASURE_RUNS
        rtf = audio_sec / wall
        report[name] = {
            "batch": batch,
            "rtf": round(rtf, 2),
            "wall_ms": round(wall * 1e3, 1),
            "ms_per_frame": round(wall / FRAMES * 1e3, 3),
            "ms_per_token_per_stream": round(wall / FRAMES / batch * 1e3, 4),
        }
        # Incremental artifact + early headline (see loop-order comment).
        with open("bench_b32.json", "w") as f:
            json.dump({
                "batch": BATCH, "frames": FRAMES,
                "configs": report,
                "baseline_rtf": BASELINE_RTF,
            }, f, indent=2)
        if name == "int8_16groups_b96_kv8" and not emitted:
            # Headline = the flagship serving config at its max-throughput
            # batch: real 12Hz checkpoints run 16 code groups (== codec
            # quantizers), serving mode quantizes both trunks + the KV cache
            # (quantize_for_serving(talker=True, kv=True)).
            best = max(r["rtf"] for n, r in report.items()
                       if n in HEADLINE and "rtf" in r)
            emitted = True
            print(json.dumps({
                "metric": "rtf",
                "value": best,
                "unit": "x_realtime",
                "vs_baseline": round(best / BASELINE_RTF, 2),
            }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
