#!/usr/bin/env python3
"""Encode-path benchmarks at flagship dims on the real TPU.

The decode paths have round-measured artifacts (bench_b32.json,
bench_codec_v1.json); this completes perf coverage for the ENCODE side —
everything the voice-clone / data-prep paths run:

  mimi        12 Hz Mimi encoder (SEANet → sliding-window transformer →
              split-RVQ; models/mimi_encoder.py, reference
              modeling_qwen3_tts_tokenizer_v2.py:899-908) — used for ICL
              ref codes and SFT data prep (finetuning/prepare_data.py).
  whisper_vq  25 Hz Whisper-VQ encoder (Whisper-large trunk + grouped VQ;
              models/whisper_vq.py) — benched through the REAL
              encode_waveforms API, i.e. including its per-wav host loop
              and numpy log-mel front-end.
  ecapa       ECAPA-TDNN speaker encoder (models/speaker.py) — the
              x-vector per clone prompt.

Weights are random at the real architecture dims (perf is weight-value
independent); Mimi params come from a randomly initialized
``transformers.MimiModel`` converted through the production loader, so
the benched tree is exactly the serving layout.

Writes bench_encoders.json. Usage:
  python scripts/bench_encoders.py [--batch 8 --seconds 10 --runs 3] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _DictST:
    """Minimal safetensors-reader shim over a torch state_dict."""

    def __init__(self, sd):
        self._sd = sd

    def __contains__(self, name):
        return name in self._sd

    def get_f32(self, name):
        import numpy as np

        return np.asarray(self._sd[name].float().numpy(), np.float32)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--variants", default="mimi,whisper_vq,ecapa")
    p.add_argument("--json-out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_encoders.json"))
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("USE_TF", "0")
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    b = args.batch
    report = {"batch": b, "seconds": args.seconds,
              "platform": jax.devices()[0].platform}

    def timed(run, n):
        t0 = time.perf_counter()
        run(0)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(n):
            run(i + 1)
        return (time.perf_counter() - t0) / n, warm

    variants = args.variants.split(",")

    if "mimi" in variants:
        from transformers import MimiConfig, MimiModel

        from qwen_tts_tpu.models.mimi_encoder import (
            MimiEncoderConfig,
            load_mimi_encoder,
            mimi_encode,
        )

        cfg = MimiEncoderConfig()
        hf = MimiModel(MimiConfig())  # flagship dims == HF defaults
        params = load_mimi_encoder(_DictST(hf.state_dict()), cfg,
                                   dtype=jnp.bfloat16, prefix="")
        del hf
        wav = jnp.asarray(
            rng.standard_normal((b, int(cfg.sampling_rate * args.seconds))),
            jnp.float32) * 0.1
        enc = jax.jit(mimi_encode, static_argnames=("cfg", "num_quantizers"))

        def run_mimi(_):
            codes = enc(params, cfg, wav, num_quantizers=16)
            return int(jnp.sum(codes))

        wall, warm = timed(run_mimi, args.runs)
        report["mimi"] = {
            "ms": round(wall * 1e3, 1), "warmup_s": round(warm, 1),
            "rtf": round(b * args.seconds / wall, 1),
        }
        print(json.dumps({"mimi": report["mimi"]}), flush=True)

    if "whisper_vq" in variants:
        from qwen_tts_tpu.models.whisper_vq import (
            WhisperVQConfig,
            encode_waveforms,
            init_whisper_vq,
        )

        cfg = WhisperVQConfig()
        # f32: the Whisper-VQ encode path is f32-only (token-exact parity
        # vs the reference encoder is pinned at f32 in test_ref_parity_v1).
        params = init_whisper_vq(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
        wavs = [np.asarray(rng.standard_normal(int(16000 * args.seconds)),
                           np.float32) * 0.1 for _ in range(b)]

        def run_wvq(_):
            out = encode_waveforms(params, cfg, wavs)
            return sum(int(c.sum()) for c in out)

        wall, warm = timed(run_wvq, args.runs)
        report["whisper_vq"] = {
            "ms": round(wall * 1e3, 1), "warmup_s": round(warm, 1),
            "rtf": round(b * args.seconds / wall, 1),
            "note": "real encode_waveforms API: per-wav host loop + numpy "
                    "log-mel front-end included",
        }
        print(json.dumps({"whisper_vq": report["whisper_vq"]}), flush=True)

    if "ecapa" in variants:
        from qwen_tts_tpu.config import SpeakerEncoderConfig
        from qwen_tts_tpu.models.speaker import (
            init_speaker_params,
            speaker_encoder_forward,
        )

        cfg = SpeakerEncoderConfig()
        params = init_speaker_params(jax.random.PRNGKey(1), cfg,
                                     dtype=jnp.bfloat16)
        # 24 kHz → mel frames at hop 256 ≈ 93.75 Hz
        t_mel = int(args.seconds * 24000 / 256)
        mels = jnp.asarray(
            rng.standard_normal((b, t_mel, cfg.mel_dim)), jnp.float32) * 0.1
        fwd = jax.jit(speaker_encoder_forward, static_argnames=("cfg",))

        def run_ecapa(_):
            xv = fwd(params, cfg, mels)
            return float(jnp.sum(xv.astype(jnp.float32)))

        wall, warm = timed(run_ecapa, args.runs)
        report["ecapa"] = {
            "ms": round(wall * 1e3, 1), "warmup_s": round(warm, 1),
            "rtf": round(b * args.seconds / wall, 1),
        }
        print(json.dumps({"ecapa": report["ecapa"]}), flush=True)

    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
