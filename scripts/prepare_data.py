#!/usr/bin/env python3
"""SFT data prep: batch-encode target audio into 12 Hz codec codes
(the reference's finetuning/prepare_data.py — batch-32 encode writing
``audio_codes`` into each JSONL row).

Input JSONL rows: {"audio": wav_path, "text": ..., ["ref_audio": wav_path]}
Output JSONL rows gain "audio_codes" ([T, Q] lists) and, when the checkpoint
has a speaker encoder and ref_audio is present, "speaker_embedding".

Usage:
  python scripts/prepare_data.py --model-path CKPT --input in.jsonl \
      --output out.jsonl [--batch-size 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from qwen_tts_tpu.audio import resample
    from qwen_tts_tpu.codec_encoder import SpeechTokenizerEncoder
    from qwen_tts_tpu.io.wav import read_wav
    from qwen_tts_tpu.pipeline import Qwen3TTSModel

    encoder = SpeechTokenizerEncoder.from_pretrained(
        os.path.join(args.model_path, "speech_tokenizer")
    )
    model = None  # only loaded if speaker embeddings are needed

    with open(args.input, encoding="utf-8") as f:
        rows = [json.loads(line) for line in f if line.strip()]

    out_rows = []
    for start in range(0, len(rows), args.batch_size):
        chunk = rows[start : start + args.batch_size]
        wavs = []
        for row in chunk:
            wav, sr = read_wav(row["audio"])
            wavs.append(resample(wav, sr, encoder.input_sample_rate))
        codes = encoder.encode(wavs, encoder.input_sample_rate)
        for row, c in zip(chunk, codes):
            row = dict(row)
            row["audio_codes"] = c.tolist()
            if "ref_audio" in row:
                if model is None:
                    model = Qwen3TTSModel.from_pretrained(
                        args.model_path, load_tokenizer=False
                    )
                if model.speaker_params is not None:
                    rwav, rsr = read_wav(row["ref_audio"])
                    rwav = resample(rwav, rsr, 24000)
                    row["speaker_embedding"] = model.extract_speaker_embedding(
                        rwav, 24000
                    ).tolist()
            out_rows.append(row)
        print(f"encoded {len(out_rows)}/{len(rows)}", file=sys.stderr)

    with open(args.output, "w", encoding="utf-8") as f:
        for row in out_rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
