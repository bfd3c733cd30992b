#!/usr/bin/env python3
"""First-packet latency benchmark (BASELINE config #4): time from request to
the first audio chunk of the dual-track streaming path, plus steady-state
chunk cadence. Target: < 150 ms first packet on one TPU chip (BASELINE.md).

Usage: python scripts/bench_streaming.py [--first-frames 4] [--runs 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--first-frames", type=int, default=2)
    p.add_argument("--chunk-frames", type=int, default=25)
    p.add_argument("--total-frames", type=int, default=100)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--serving", action="store_true",
                   help="flagship serving mode: 16 code groups (real 12Hz "
                        "checkpoints) + int8 trunks (quantize_for_serving)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from qwen_tts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen_tts_tpu.config import CodecDecoderConfig, TalkerConfig, TTSConfig, CodecConfig
    from qwen_tts_tpu.generate import GenerationParams, Prompt
    from qwen_tts_tpu.models import codec as codec_mod
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models import talker as talker_mod
    from qwen_tts_tpu.pipeline import Qwen3TTSModel

    talker_cfg = TalkerConfig()
    if args.serving:
        import dataclasses

        talker_cfg = dataclasses.replace(
            talker_cfg, num_code_groups=16,
            code_predictor=dataclasses.replace(
                talker_cfg.code_predictor, num_code_groups=16),
        )
    cfg = TTSConfig(talker=talker_cfg, codec=CodecConfig())
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    model = Qwen3TTSModel(
        cfg,
        talker_mod.init_talker_params(rng, talker_cfg, dtype),
        st_mod.init_subtalker_params(
            jax.random.fold_in(rng, 1), talker_cfg.code_predictor,
            talker_cfg.hidden_size, dtype,
        ),
        codec_mod.init_codec_params(
            jax.random.fold_in(rng, 2), cfg.codec.decoder, jnp.bfloat16
        ),
    )
    if args.serving:
        model.quantize_for_serving(talker=True)

    d = talker_cfg.hidden_size
    np_rng = np.random.default_rng(0)
    prompt = Prompt(
        embeds=np_rng.standard_normal((12, d)).astype(np.float32) * 0.05,
        trailing_text=np_rng.standard_normal((8, d)).astype(np.float32) * 0.05,
        tts_pad_embed=np.zeros(d, np.float32),
    )
    params = GenerationParams(
        max_new_tokens=args.total_frames, min_new_tokens=args.total_frames
    )

    def one_run():
        t0 = time.perf_counter()
        first = None
        chunks = []
        for wav, _sr in model.stream_from_prompt(
            prompt, params,
            first_chunk_frames=args.first_frames,
            chunk_frames=args.chunk_frames,
        ):
            now = time.perf_counter()
            if first is None:
                first = now - t0
            chunks.append(now)
        return first, chunks

    one_run()  # warmup / compile
    firsts, cadences = [], []
    for _ in range(args.runs):
        first, chunks = one_run()
        firsts.append(first)
        if len(chunks) > 2:
            gaps = np.diff(chunks[1:])
            cadences.append(float(np.mean(gaps)))

    # Dispatch-floor estimate: the first packet is ONE fused device program
    # (prefill+decode+codec) plus one blocking device→host fetch, each
    # costing a tunnel round trip (~20-25 ms, CLAUDE.md). Measure the
    # empty-dispatch round trip directly so the artifact is self-describing:
    # p50 numbers below ~2×floor are dominated by transport, not compute —
    # round-over-round regressions must clear that bar before they count.
    tiny = jax.jit(lambda x: x + 1)
    _ = float(tiny(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    n_probe = 5
    for i in range(n_probe):
        float(tiny(jnp.float32(i)))
    dispatch_ms = (time.perf_counter() - t0) / n_probe * 1e3

    fs = np.sort(np.asarray(firsts)) * 1e3
    report = {
        "mode": "serving_int8_16groups" if args.serving else "bf16_parity",
        "n_runs": len(firsts),
        "first_packet_ms_p50": round(float(np.percentile(fs, 50)), 1),
        "first_packet_ms_p10": round(float(np.percentile(fs, 10)), 1),
        "first_packet_ms_p90": round(float(np.percentile(fs, 90)), 1),
        "first_packet_ms_min": round(float(fs[0]), 1),
        # The fused prefill+decode+codec program collapses request→audio to
        # ONE dispatch+blocking-fetch sequence — the probe measures exactly
        # that pattern, so the floor is one roundtrip (measured p50s sit
        # ~8 ms of compute above it).
        "dispatch_roundtrip_ms": round(dispatch_ms, 1),
        "dispatch_floor_ms": round(dispatch_ms, 1),
        "first_packet_audio_ms": args.first_frames * 80,
        "steady_chunk_s": round(float(np.median(cadences)), 4) if cadences else None,
        "steady_chunk_audio_s": args.chunk_frames * 0.08,
        "platform": jax.devices()[0].platform,
        "reference_claim_ms": 97,  # /root/reference/README.md:78
    }
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_streaming.json")
    if report["platform"] != "cpu":
        # Keep both modes in one versioned artifact: flat keys stay the
        # bf16-parity numbers (back-compat), serving lands under "serving".
        merged = {}
        if os.path.exists(out):
            with open(out, encoding="utf-8") as f:
                merged = json.load(f)
            merged.pop("serving", None) if args.serving else None
        if args.serving:
            merged["serving"] = report
        else:
            serving = merged.get("serving")
            merged = dict(report)
            if serving:
                merged["serving"] = serving
        with open(out, "w") as f:
            json.dump(merged, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
