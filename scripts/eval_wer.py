#!/usr/bin/env python3
"""WER evaluation harness (the reference's quality metric — SEED test-zh/en
WER tables, README.md:555-578 there; protocol README.md:489).

Three stages, each usable on its own:

1. --synthesize: read a JSONL manifest ({"id", "text", "speaker", "language",
   ...}) and synthesize one WAV per row with this framework.
2. --asr-cmd: transcribe each WAV with an external ASR command (none ships in
   this image — whisper.cpp / a served ASR endpoint / etc.); "{wav}" in the
   command is replaced per file, stdout is the hypothesis. Or supply
   precomputed hypotheses via --hyp-jsonl ({"id", "text"}).
3. Score: corpus WER (substitutions+insertions+deletions over reference
   words; CER with --cer) + per-utterance details to a JSON report.

Usage:
  python scripts/eval_wer.py --manifest seed.jsonl --out-dir wavs \
      --model-dir CKPT --synthesize \
      --asr-cmd "whisper-cli -f {wav} -nt" --report wer.json
  python scripts/eval_wer.py --manifest seed.jsonl --hyp-jsonl hyps.jsonl \
      --report wer.json
"""

import argparse
import json
import os
import re
import subprocess
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_text(s: str, cer: bool = False):
    """SEED-style scoring normalization: casefold, strip punctuation,
    collapse whitespace; CER splits into characters (for zh)."""
    s = unicodedata.normalize("NFKC", s).casefold()
    s = "".join(c for c in s if not unicodedata.category(c).startswith("P"))
    if cer:
        return [c for c in re.sub(r"\s+", "", s)]
    return s.split()


def edit_distance(ref, hyp):
    """Levenshtein with op counts. Returns (dist, subs, ins, dels)."""
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels)
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cur.append(prev[j - 1])
                continue
            sub = prev[j - 1]
            ins = cur[j - 1]
            dele = prev[j]
            best = min(
                (sub[0] + 1, sub[1] + 1, sub[2], sub[3]),
                (ins[0] + 1, ins[1], ins[2] + 1, ins[3]),
                (dele[0] + 1, dele[1], dele[2], dele[3] + 1),
            )
            cur.append(best)
        prev = cur
    return prev[m]


def score(pairs, cer=False):
    """pairs: list of (id, ref_text, hyp_text) → report dict."""
    total_err = total_ref = 0
    subs = ins = dels = 0
    utts = []
    for uid, ref, hyp in pairs:
        r = normalize_text(ref, cer)
        h = normalize_text(hyp, cer)
        d, s, i, dl = edit_distance(r, h)
        total_err += d
        total_ref += len(r)
        subs += s
        ins += i
        dels += dl
        utts.append({"id": uid, "errors": d, "ref_len": len(r),
                     "wer": d / max(len(r), 1)})
    return {
        "metric": "cer" if cer else "wer",
        "value": round(100.0 * total_err / max(total_ref, 1), 3),
        "unit": "percent",
        "substitutions": subs, "insertions": ins, "deletions": dels,
        "ref_tokens": total_ref, "utterances": len(utts),
        "per_utterance": utts,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True,
                   help="JSONL with id/text (+speaker/language/instruct)")
    p.add_argument("--out-dir", default="wer_wavs")
    p.add_argument("--model-dir")
    p.add_argument("--synthesize", action="store_true")
    p.add_argument("--asr-cmd", help='e.g. "whisper-cli -f {wav} -nt"')
    p.add_argument("--hyp-jsonl", help="precomputed {id, text} hypotheses")
    p.add_argument("--cer", action="store_true", help="character error rate")
    p.add_argument("--report", default="wer_report.json")
    p.add_argument("--max-new-tokens", type=int, default=2048)
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.manifest, encoding="utf-8")
            if l.strip()]

    if args.synthesize:
        if not args.model_dir:
            p.error("--synthesize requires --model-dir")
        from qwen_tts_tpu.io.wav import write_wav
        from qwen_tts_tpu.pipeline import Qwen3TTSModel
        from qwen_tts_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        model = Qwen3TTSModel.from_pretrained(args.model_dir)
        os.makedirs(args.out_dir, exist_ok=True)
        for r in rows:
            if "ids" in r:  # pre-tokenized chat-template ids
                import numpy as np

                from qwen_tts_tpu.generate import build_prompt

                prompt = build_prompt(
                    model.talker_params, model.cfg,
                    np.asarray(r["ids"], np.int32),
                    language=r.get("language", "auto"),
                    speaker=r.get("speaker"),
                    st_params=model.subtalker_params,
                )
                params = model._merge_params(
                    max_new_tokens=args.max_new_tokens, do_sample=False
                )
                codes, _ = model.generate_codes_from_prompts([prompt], params)
                wavs = model.decode_codes(codes)
                sr = model.sample_rate
            else:
                wavs, sr = model.generate_custom_voice(
                    r["text"], r.get("speaker") or
                    model.get_supported_speakers()[0],
                    r.get("language", "auto"),
                    instruct=r.get("instruct"),
                    max_new_tokens=args.max_new_tokens,
                )
            write_wav(os.path.join(args.out_dir, f"{r['id']}.wav"),
                      wavs[0], sr)
        print(f"synthesized {len(rows)} wavs -> {args.out_dir}",
              file=sys.stderr)

    hyps = {}
    if args.hyp_jsonl:
        for l in open(args.hyp_jsonl, encoding="utf-8"):
            if l.strip():
                h = json.loads(l)
                hyps[str(h["id"])] = h["text"]
    elif args.asr_cmd:
        for r in rows:
            wav = os.path.join(args.out_dir, f"{r['id']}.wav")
            cmd = args.asr_cmd.replace("{wav}", wav)
            out = subprocess.run(cmd, shell=True, capture_output=True,
                                 text=True, timeout=600)
            hyps[str(r["id"])] = out.stdout.strip()
    else:
        print("no --asr-cmd / --hyp-jsonl: synthesis only, skipping scoring",
              file=sys.stderr)
        return 0

    pairs = [(str(r["id"]), r["text"], hyps.get(str(r["id"]), ""))
             for r in rows]
    report = score(pairs, cer=args.cer)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("metric", "value", "unit", "utterances")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
