#!/usr/bin/env python3
"""One-command acceptance run for a (real or synthetic) checkpoint — the
runbook for the day real weights land (VERDICT r2 item 5; protocol anchor:
the reference's eval recipe, /root/reference/README.md:489).

Stages (each prints PASS/FAIL/SKIP; exit 0 iff nothing FAILed):

  load        from_pretrained + config/shape validation (io/loader.py gates)
  parity      greedy token parity: jitted decode loop vs the independent
              cache-free eager oracle (qwen_tts_tpu/validation.py); when the
              actual reference package is importable (REF_DIR or
              /root/reference), ALSO token-exact vs the reference itself via
              tests/ref_oracle.py
  synthesize  end-to-end custom-voice wav (finite, nonzero, right rate)
  bench       short serving-shape RTF measurement (real device only)
  streaming   first-packet p50 over N runs (real device only)
  wer         optional: synthesize eval_wer cases to a directory for an
              external ASR (--wer-jsonl; scoring via scripts/eval_wer.py)

Usage:
  python scripts/acceptance.py --model-dir CKPT [--speaker aiden]
      [--text "..."] [--max-tokens 64] [--wer-jsonl eval.jsonl --wer-out DIR]
  python scripts/acceptance.py --tiny          # CI / fixture mode (CPU)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []
EXTRAS = {}  # structured stage outputs for the JSON report (--out)


def stage(name, fn, *, skip=None):
    if skip:
        print(f"[acceptance] {name:11s} SKIP  ({skip})")
        RESULTS.append((name, "SKIP", skip))
        return None
    t0 = time.perf_counter()
    try:
        detail = fn()
    except Exception as exc:  # noqa: BLE001 — each stage reports and moves on
        print(f"[acceptance] {name:11s} FAIL  {type(exc).__name__}: {exc}")
        RESULTS.append((name, "FAIL", f"{type(exc).__name__}: {exc}"))
        return None
    dt = time.perf_counter() - t0
    print(f"[acceptance] {name:11s} PASS  ({dt:.1f}s) {detail or ''}")
    RESULTS.append((name, "PASS", detail))
    return detail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir")
    ap.add_argument("--tiny", action="store_true",
                    help="synthesize a tiny fixture checkpoint (CI mode, CPU)")
    ap.add_argument("--text", default=None)
    ap.add_argument("--ids", default=None,
                    help="comma-separated pre-tokenized ids (no tokenizer needed)")
    ap.add_argument("--speaker", default=None)
    ap.add_argument("--language", default="auto")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--ref-dir", default="/root/reference",
                    help="reference package root for ref-in-the-loop parity")
    ap.add_argument("--wer-jsonl", default=None,
                    help="eval_wer-format jsonl: synthesize cases for ASR")
    ap.add_argument("--wer-out", default=None)
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from ckpt_fixture import make_checkpoint
        from test_ref_parity import parity_cfg

        args.model_dir = tempfile.mkdtemp(prefix="qtts_accept_")
        # The parity-layout fixture (1088-id vocab, flagship-style banned
        # tail): required for the reference-in-the-loop comparison — the
        # reference hardcodes a 1024-id suppress ban that must be
        # well-formed (test_ref_parity.py docstring).
        make_checkpoint(args.model_dir, parity_cfg())
        args.speaker = args.speaker or "aiden"
        args.language = "english"
        args.ids = args.ids or "1,2,3,10,11,12,13,14,4,5,1,2,3"
        args.max_tokens = min(args.max_tokens, 16)
    elif not args.model_dir:
        ap.error("need --model-dir (or --tiny)")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # ---- load ------------------------------------------------------------
    model_box = {}

    def do_load():
        from qwen_tts_tpu.pipeline import Qwen3TTSModel

        model_box["m"] = Qwen3TTSModel.from_pretrained(
            args.model_dir,
            talker_dtype=jnp.float32 if args.tiny else jnp.bfloat16,
        )
        m = model_box["m"]
        spk = m.get_supported_speakers()
        return (f"type={m.cfg.tts_model_type} groups="
                f"{m.cfg.talker.num_code_groups} speakers={len(spk)}")

    stage("load", do_load)
    m = model_box.get("m")
    if m is None:
        return _finish(args, 1)

    if args.speaker is None and m.get_supported_speakers():
        args.speaker = m.get_supported_speakers()[0]
    if args.ids is not None:
        ids = np.asarray([int(x) for x in args.ids.split(",")], np.int32)
    else:
        text = args.text or "The acceptance gate says hello."
        ids = m._tokenize(m.build_assistant_text(text))

    # ---- parity ----------------------------------------------------------
    def do_parity():
        from qwen_tts_tpu.generate import build_prompt
        from qwen_tts_tpu.validation import check_parity

        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        res = check_parity(
            m.talker_params, m.subtalker_params, m.cfg, prompt,
            max_new_tokens=args.max_tokens,
        )
        if not res.ok:
            raise AssertionError(res.report())
        detail = f"eager-oracle token-exact @{args.max_tokens}"
        # Reference-in-the-loop when the torch package is importable
        # (tests/ref_oracle.py imports the ACTUAL /root/reference package).
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tests"))
            import ref_oracle

            if args.ref_dir:
                ref_oracle.REF_ROOT = args.ref_dir
            ref_model, _cfg = ref_oracle.load_ref_tts(args.model_dir)
            ref_codes = ref_oracle.ref_generate(
                ref_model, [ids], languages=[args.language],
                speakers=[args.speaker], max_new_tokens=args.max_tokens,
            )[0]
            ours, _ = m.generate_codes_from_prompts(
                [prompt], _greedy_params(args.max_tokens),
            )
            np.testing.assert_array_equal(
                np.asarray(ref_codes, np.int64),
                np.asarray(ours[0], np.int64),
            )
            detail += " + reference token-exact"
        except (ImportError, AssertionError) as exc:
            if isinstance(exc, AssertionError):
                raise
            detail += " (reference package not importable here)"
        except FileNotFoundError:
            detail += " (reference assets missing)"
        return detail

    def _greedy_params(n):
        from qwen_tts_tpu.generate import GenerationParams

        return GenerationParams(
            max_new_tokens=n, do_sample=False, subtalker_do_sample=False,
            repetition_penalty=1.0, min_new_tokens=0,
        )

    stage("parity", do_parity)

    # ---- synthesize ------------------------------------------------------
    def do_synth():
        from qwen_tts_tpu.generate import build_prompt

        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        codes, info = m.generate_codes_from_prompts(
            [prompt], _greedy_params(args.max_tokens))
        wav = m.decode_codes(codes)[0]
        assert wav.size > 0 and np.isfinite(wav).all()
        return (f"{wav.shape[0] / m.sample_rate:.2f}s audio, "
                f"{codes[0].shape[0]} frames, "
                f"stop={'eos' if info['stopped'][0] else 'budget'}")

    stage("synthesize", do_synth)

    on_device = jax.devices()[0].platform != "cpu"

    # ---- bench -----------------------------------------------------------
    def do_bench():
        from qwen_tts_tpu.generate import build_prompt

        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        gp = _greedy_params(args.max_tokens)
        m.generate_codes_from_prompts([prompt] * 8, gp)  # warmup
        t0 = time.perf_counter()
        codes, _ = m.generate_codes_from_prompts([prompt] * 8, gp)
        wavs = m.decode_codes(codes)
        dt = time.perf_counter() - t0
        audio = sum(w.shape[0] for w in wavs) / m.sample_rate
        return f"b8 RTF {audio / dt:.1f}x ({dt * 1e3:.0f} ms wall)"

    stage("bench", do_bench,
          skip=None if on_device else "no accelerator (CPU run)")

    # ---- jacobi ----------------------------------------------------------
    # Convergence of the Jacobi sub-talker decode is a CHECKPOINT property
    # (random weights run ~G-1 iterations; trained weights should converge
    # in a few). Rerun the b8 greedy bench under the gate: the trace must be
    # identical (fixed point == sequential trace) and the RTF delta tells
    # whether Jacobi serving pays on these weights.
    def do_jacobi():
        from qwen_tts_tpu.generate import build_prompt

        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        gp = _greedy_params(args.max_tokens)
        seq_codes, _ = m.generate_codes_from_prompts([prompt] * 8, gp)
        os.environ["QTTS_ST_JACOBI"] = "1"
        try:
            m.generate_codes_from_prompts([prompt] * 8, gp)  # warmup
            t0 = time.perf_counter()
            jac_codes, _ = m.generate_codes_from_prompts([prompt] * 8, gp)
            wavs = m.decode_codes(jac_codes)
            dt = time.perf_counter() - t0
        finally:
            os.environ.pop("QTTS_ST_JACOBI", None)
        for s, j in zip(seq_codes, jac_codes):
            assert np.array_equal(np.asarray(s), np.asarray(j)), \
                "Jacobi trace diverged from the sequential scan"
        audio = sum(w.shape[0] for w in wavs) / m.sample_rate
        return (f"trace exact; b8 RTF {audio / dt:.1f}x under adaptive "
                f"Jacobi (compare to bench stage)")

    stage("jacobi", do_jacobi,
          skip=None if on_device else "no accelerator (CPU run)")

    # ---- jacobi convergence histogram -------------------------------------
    # Per-frame adaptive-Jacobi iteration counts on REAL decode states — the
    # checkpoint property that decides whether the approximate 1-sweep mode
    # (QTTS_ST_JACOBI_ITERS=1, the only in-pipeline Jacobi winner: 590/671x
    # RTF, CLAUDE.md ledger) is safe to serve. Decision table in
    # docs/SERVING.md. Runs on CPU too (numerics, not perf).
    def do_jacobi_conv():
        from qwen_tts_tpu.generate import (
            batch_prompts,
            build_prompt,
            decode_segment,
            init_decode,
        )
        from qwen_tts_tpu.models.subtalker import subtalker_generate_jacobi

        m = model_box["m"]
        tk = m.cfg.talker
        g = tk.code_predictor.num_code_groups
        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        # b=1: the adaptive while_loop's iteration count is batch-global
        # (cond reduces over rows), so single-row probing gives true
        # per-frame counts.
        embeds, mask, trailing, _ = batch_prompts([prompt])
        frames = min(args.max_tokens, 32)
        gp = _greedy_params(frames)
        state, _seg = init_decode(
            m.talker_params, m.subtalker_params, tk,
            jnp.asarray(embeds), jnp.asarray(mask),
            sampling=gp.talker_sampling(),
            st_sampling=gp.subtalker_sampling(),
            max_cache_len=embeds.shape[1] + frames,
            rng=jax.random.PRNGKey(0), first_segment=1,
            trailing=jnp.asarray(trailing),
        )
        probe = jax.jit(lambda h, t: subtalker_generate_jacobi(
            m.subtalker_params, tk.code_predictor,
            m.talker_params["codec_embedding"], h, t, return_iters=True))
        counts = {}
        checked = 0
        for _ in range(frames - 1):
            if bool(np.asarray(state.eos)[0]):
                break
            jac_codes, iters = probe(state.hidden, state.token)
            state, seg = decode_segment(
                m.talker_params, m.subtalker_params, tk, state,
                jnp.asarray(trailing),
                sampling=gp.talker_sampling(),
                st_sampling=gp.subtalker_sampling(), segment=1,
            )
            # Cross-check: the adaptive fixed point must equal the frame the
            # sequential decode actually emitted (exactness on real states).
            if int(np.asarray(state.num_gen)[0]) > checked + 1:
                assert np.array_equal(np.asarray(jac_codes)[0],
                                      np.asarray(seg)[0, 0]), \
                    "adaptive Jacobi diverged from the sequential frame"
            k = int(np.asarray(iters))
            counts[k] = counts.get(k, 0) + 1
            checked += 1
        if not checked:
            return "no frames decoded (instant EOS?) — histogram empty"
        total = sum(counts.values())
        # iters includes the final verification sweep: "converged after k
        # productive sweeps" reports as k+1 (cap g-1 = maybe-unconverged).
        conv1 = counts.get(2, 0) / total
        capped = counts.get(g - 1, 0) / total
        hist = {str(k): v for k, v in sorted(counts.items())}
        if conv1 >= 0.99:
            decision = "jac1-safe"
        elif conv1 >= 0.90:
            decision = "jac1-marginal (quality-eval before enabling)"
        else:
            decision = "jac1-unsafe (keep exact sequential serving)"
        EXTRAS["jacobi_convergence"] = {
            "frames": total, "iters_histogram": hist,
            "converged_1sweep_frac": round(conv1, 4),
            "cap_hit_frac": round(capped, 4), "decision": decision,
        }
        return (f"{total} frames; P(1-sweep)={conv1:.2%}, cap-hit "
                f"{capped:.2%} → {decision}")

    stage("jacobi_conv", do_jacobi_conv)

    # ---- streaming -------------------------------------------------------
    def do_streaming():
        from qwen_tts_tpu.generate import build_prompt

        prompt = build_prompt(
            m.talker_params, m.cfg, ids, language=args.language,
            speaker=args.speaker, st_params=m.subtalker_params,
        )
        gp = _greedy_params(min(args.max_tokens, 30))
        firsts = []
        for _ in range(args.runs + 1):
            t0 = time.perf_counter()
            for _wav, _sr in m.stream_from_prompt(prompt, gp):
                firsts.append(time.perf_counter() - t0)
                break
        firsts = firsts[1:]  # drop compile run
        p50 = sorted(firsts)[len(firsts) // 2] * 1e3
        return f"first packet p50 {p50:.1f} ms (n={len(firsts)})"

    stage("streaming", do_streaming,
          skip=None if on_device else "no accelerator (CPU run)")

    # ---- wer synthesis ---------------------------------------------------
    def do_wer():
        import subprocess

        out_dir = args.wer_out or os.path.join(args.model_dir, "wer_out")
        os.makedirs(out_dir, exist_ok=True)
        report = os.path.join(out_dir, "wer_report.json")
        cmd = [sys.executable,
               os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "eval_wer.py"),
               "--manifest", args.wer_jsonl, "--out-dir", out_dir,
               "--model-dir", args.model_dir, "--synthesize",
               "--report", report,
               "--max-new-tokens", str(args.max_tokens)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if r.returncode not in (0, 2):  # 2 = synthesized, no ASR configured
            raise RuntimeError(r.stderr[-500:])
        return f"wavs in {out_dir} (run an external ASR + eval_wer.py to score)"

    stage("wer", do_wer,
          skip=None if args.wer_jsonl else "no --wer-jsonl given")

    failed = any(s == "FAIL" for _, s, _ in RESULTS)
    return _finish(args, 1 if failed else 0)


def _finish(args, rc):
    report = {
        "model_dir": args.model_dir,
        "stages": [{"stage": n, "status": s, "detail": str(d)}
                   for n, s, d in RESULTS],
        "ok": rc == 0,
        **EXTRAS,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return rc


if __name__ == "__main__":
    sys.exit(main())
