#!/usr/bin/env python3
"""Real-TPU continuous-serving soak.

The CPU chaos soak (tests/test_continuous_soak.py) proves correctness of the
mixed-load/cancel/timeout paths on the virtual backend; this script proves
the same engine SERVES on the real chip at flagship dims and records a
stats artifact (soak_tpu.json): request latency percentiles, aggregate
served RTF, slot reuse, cancellation handling, zero errors.

Load shape: N requests with heterogeneous prompt lengths, budgets and
sampling configs arrive faster than slots exist (forced queueing + slot
reuse); a few are cancelled mid-flight and one carries a tight timeout.

Usage: python scripts/soak_tpu.py [--requests 32 --slots 8 --json soak_tpu.json]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--segment", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--json", default="soak_tpu.json")
    ap.add_argument("--cpu", action="store_true",
                    help="tiny smoke on the CPU backend (CI)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from qwen_tts_tpu.utils import enable_compilation_cache

    if not args.cpu:
        enable_compilation_cache()

    import dataclasses
    from concurrent.futures import CancelledError

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen_tts_tpu.config import (
        CodecConfig,
        TalkerConfig,
        TTSConfig,
        tiny_tts_config,
    )
    from qwen_tts_tpu.continuous import ContinuousBatchingEngine
    from qwen_tts_tpu.generate import GenerationParams, build_prompt
    from qwen_tts_tpu.models import codec as codec_mod
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models import talker as talker_mod
    from qwen_tts_tpu.pipeline import Qwen3TTSModel

    if args.cpu:
        cfg = tiny_tts_config()
    else:
        t0 = TalkerConfig()
        talker_cfg = dataclasses.replace(
            t0, num_code_groups=16, text_vocab_size=512,
            code_predictor=dataclasses.replace(t0.code_predictor,
                                               num_code_groups=16),
        )
        cfg = TTSConfig(talker=talker_cfg, codec=CodecConfig())

    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    talker_params = talker_mod.init_talker_params(rng, cfg.talker, dtype)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.talker.code_predictor,
        cfg.talker.hidden_size, dtype,
    )
    codec_params = codec_mod.init_codec_params(
        jax.random.fold_in(rng, 2), cfg.codec.decoder, dtype
    )
    model = Qwen3TTSModel(cfg, talker_params, st_params, codec_params)
    if not args.cpu:
        model.quantize_for_serving(talker=True)

    sr = 24000
    up = cfg.codec.decode_upsample_rate
    speaker = sorted(cfg.talker.spk_id)[0][0] if cfg.talker.spk_id else None
    language = "english" if speaker else "auto"

    rng_np = np.random.default_rng(0)

    def make_prompt(i):
        n_text = int(rng_np.integers(2, 16))
        content = rng_np.integers(
            6, min(cfg.talker.text_vocab_size, 400), n_text
        ).tolist()
        # Chat-template structure: 3-id role header + content + 5-id tail
        # (build_prompt's [3:-5] content convention).
        ids = np.asarray([1, 2, 3] + content + [4, 5, 1, 2, 3], np.int32)
        return build_prompt(model.talker_params, cfg, ids, language=language,
                            speaker=speaker, st_params=model.subtalker_params)

    def make_params(i):
        lo = min(8, max(2, args.max_new // 3))
        frames = int(rng_np.integers(lo, max(lo + 1, args.max_new - 4)))
        sampled = bool(i % 3)
        return GenerationParams(
            max_new_tokens=frames, min_new_tokens=frames,
            do_sample=sampled, subtalker_do_sample=sampled,
            temperature=float(rng_np.uniform(0.7, 1.3)),
            top_k=int(rng_np.integers(4, 50)), seed=i,
        )

    engine = ContinuousBatchingEngine(
        model, num_slots=args.slots, segment_frames=args.segment,
        max_new_tokens=args.max_new, prefill_bucket=64, trailing_cap=64,
    ).start()

    print(f"[soak] warmup…", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    engine.submit_prompt(make_prompt(-1), make_params(2)).result(timeout=1800)
    print(f"[soak] warmup {time.perf_counter() - t0:.1f}s; "
          f"{args.requests} requests / {args.slots} slots",
          file=sys.stderr, flush=True)

    def wave(tag):
        """One full request wave; returns its stats dict. Wave 1 pays the
        remaining first-shape compiles/loads; wave 2 is steady state."""
        lat, cancelled, errors, served_audio_s = [], 0, 0, 0.0
        t_start = time.perf_counter()
        pending = []
        for i in range(args.requests):
            fut = engine.submit_prompt(make_prompt(i), make_params(i))
            pending.append((i, time.perf_counter(), fut))
            if i % 11 == 5:  # cancel a few mid-flight
                engine.cancel(fut)

        for i, t_sub, fut in pending:
            try:
                wav = fut.result(timeout=1800)
                lat.append(time.perf_counter() - t_sub)
                served_audio_s += wav.shape[0] / sr
            except CancelledError:
                cancelled += 1
            except Exception as exc:
                print(f"[soak] {tag} request {i} FAILED: {exc!r}",
                      file=sys.stderr)
                errors += 1
        wall = time.perf_counter() - t_start
        lat_ms = sorted(1e3 * x for x in lat)
        # Nearest-rank percentile (ceil-based); null metrics when a wave
        # completes zero requests instead of crashing the soak report.
        pct = lambda p: (round(lat_ms[max(0, math.ceil(p * len(lat_ms)) - 1)], 1)  # noqa: E731
                         if lat_ms else None)
        return {
            "completed": len(lat),
            "cancelled": cancelled,
            "errors": errors,
            "wall_s": round(wall, 2),
            "served_audio_s": round(served_audio_s, 2),
            "aggregate_rtf": round(served_audio_s / wall, 1),
            "request_latency_ms_p50": pct(0.50),
            "request_latency_ms_p90": pct(0.90),
            "request_latency_ms_max": round(lat_ms[-1], 1) if lat_ms else None,
        }

    cold = wave("cold")
    print(f"[soak] cold wave {cold['wall_s']}s; steady wave…",
          file=sys.stderr, flush=True)
    steady = wave("steady")
    engine.stop()

    errors = cold["errors"] + steady["errors"]
    report = {
        "platform": jax.devices()[0].platform,
        "flagship_dims": not args.cpu,
        "requests_per_wave": args.requests,
        "slots": args.slots,
        "segment_frames": args.segment,
        "cold": cold,
        "steady": steady,
        "errors": errors,
        "engine_stats": {k: v for k, v in engine.stats.items()
                         if isinstance(v, (int, float, str))},
    }
    print(json.dumps(report, indent=2))
    if errors:
        return 1
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.json), "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
