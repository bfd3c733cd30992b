#!/usr/bin/env python3
"""Voice clone (Base checkpoints): prompt creation + generation (mirrors the
reference's examples/test_model_12hz_base.py — ICL and x-vector-only modes)."""

import sys

from qwen_tts_tpu.io.wav import read_wav, write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.utils import enable_compilation_cache


def main(model_dir: str, ref_wav_path: str, ref_text: str) -> None:
    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(model_dir)
    ref_audio, sr = read_wav(ref_wav_path)

    # Full ICL clone: reference codes + x-vector spliced into the prefix.
    prompt = model.create_voice_clone_prompt(ref_audio, ref_text=ref_text,
                                             sample_rate=sr)
    wavs, out_sr = model.generate_voice_clone(
        "This sentence is spoken in the cloned voice.", prompt,
        language="auto",
    )
    write_wav("clone_icl.wav", wavs[0], out_sr)

    # x-vector-only mode (timbre only, no ICL splice) — prompt is reusable
    # across many generations.
    prompt_xv = model.create_voice_clone_prompt(
        ref_audio, sample_rate=sr, x_vector_only_mode=True
    )
    wavs, out_sr = model.generate_voice_clone(
        "Same voice, x-vector conditioning only.", prompt_xv, language="auto"
    )
    write_wav("clone_xvec.wav", wavs[0], out_sr)

    # Persist the cloned voice as a reusable voice file (.pt is
    # byte-compatible with the reference demo's Save Voice flow) and
    # synthesize later without the reference audio.
    model.save_voice_clone_prompt(prompt, "my_voice.pt")
    wavs, out_sr = model.generate_voice_clone(
        "Generated from the saved voice file.",
        model.load_voice_clone_prompt("my_voice.pt"), language="auto",
    )
    write_wav("clone_from_file.wav", wavs[0], out_sr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
