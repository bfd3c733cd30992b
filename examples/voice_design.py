#!/usr/bin/env python3
"""VoiceDesign: synthesize with a natural-language voice description (mirrors
the reference's examples/test_model_12hz_voice_design.py)."""

import sys

from qwen_tts_tpu.io.wav import write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.utils import enable_compilation_cache


def main(model_dir: str) -> None:
    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(model_dir)
    wavs, sr = model.generate_voice_design(
        "The quick brown fox jumps over the lazy dog.",
        instruct="A warm, low-pitched narrator voice, speaking slowly.",
        language="english",
    )
    write_wav("voice_design.wav", wavs[0], sr)


if __name__ == "__main__":
    main(sys.argv[1])
