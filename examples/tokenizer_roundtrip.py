#!/usr/bin/env python3
"""Standalone speech-tokenizer usage (mirrors the reference's
examples/test_tokenizer_12hz.py): encode audio to codes, decode codes back to
audio, for either tokenizer family."""

import sys

import numpy as np

from qwen_tts_tpu.io.wav import read_wav, write_wav
from qwen_tts_tpu.tokenizer import Qwen3TTSTokenizer


def main(tokenizer_dir: str, wav_path: str) -> None:
    tok = Qwen3TTSTokenizer.from_pretrained(tokenizer_dir)
    print("family:", tok.get_model_type())
    audio, sr = read_wav(wav_path)

    encoded = tok.encode([audio], sr)
    codes = encoded["audio_codes"][0]
    print("codes:", np.asarray(codes).shape)

    if tok.get_model_type() == "qwen3_tts_tokenizer_12hz":
        wavs, out_sr = tok.decode({"audio_codes": [codes]})
    else:
        # 25Hz decode needs the x-vector + reference mel conditioning.
        wavs, out_sr = tok.decode([{
            "audio_codes": codes,
            "xvectors": encoded["xvectors"][0],
            "ref_mels": encoded["ref_mels"][0],
        }])
    write_wav("roundtrip.wav", wavs[0], out_sr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
