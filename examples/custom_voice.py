#!/usr/bin/env python3
"""CustomVoice synthesis — the canonical usage example (mirrors the
reference's examples/test_model_12hz_custom_voice.py)."""

import sys

from qwen_tts_tpu.io.wav import write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.utils import enable_compilation_cache


def main(model_dir: str) -> None:
    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(model_dir)
    print("speakers:", model.get_supported_speakers())
    print("languages:", model.get_supported_languages())

    # Single utterance
    wavs, sr = model.generate_custom_voice(
        "Hello! This is the TPU-native Qwen3-TTS engine.",
        speaker=model.get_supported_speakers()[0],
        language="english",
    )
    write_wav("custom_voice.wav", wavs[0], sr)

    # Batched — one device program for the whole batch
    texts = ["First sentence.", "Second sentence, a bit longer than the first."]
    wavs, sr = model.generate_custom_voice(
        texts, speaker=model.get_supported_speakers()[0], language="english"
    )
    for i, w in enumerate(wavs):
        write_wav(f"custom_voice_{i}.wav", w, sr)

    # Low-latency streaming
    chunks = []
    for chunk, sr in model.stream_custom_voice(
        "Streaming synthesis emits audio as frames decode.",
        speaker=model.get_supported_speakers()[0],
    ):
        chunks.append(chunk)
    import numpy as np

    write_wav("custom_voice_stream.wav", np.concatenate(chunks), sr)


if __name__ == "__main__":
    main(sys.argv[1])
