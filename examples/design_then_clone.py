#!/usr/bin/env python3
"""Voice Design → Clone: the reference README's "Voice Design then Clone"
workflow (README.md:312-380): (1) synthesize a short reference clip in a
designed persona with a VoiceDesign checkpoint, (2) build a reusable clone
prompt from it with a Base checkpoint, (3) generate any number of lines in
that voice — single calls and one batched call.

Usage: python examples/design_then_clone.py DESIGN_CKPT BASE_CKPT
"""

import sys

from qwen_tts_tpu.io.wav import write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.utils import enable_compilation_cache


def main(design_dir: str, base_dir: str) -> None:
    enable_compilation_cache()

    # 1) Design a reference clip in the target persona.
    design_model = Qwen3TTSModel.from_pretrained(design_dir)
    ref_text = ("H-hey! You dropped your... uh... calculus notebook? "
                "I mean, I think it's yours? Maybe?")
    ref_instruct = ("Male, 17 years old, tenor range, gaining confidence - "
                    "deeper breath support now, though vowels still tighten "
                    "when nervous")
    ref_wavs, sr = design_model.generate_voice_design(
        ref_text, ref_instruct, language="english"
    )
    write_wav("voice_design_reference.wav", ref_wavs[0], sr)

    # 2) Build a reusable clone prompt from the designed reference.
    clone_model = Qwen3TTSModel.from_pretrained(base_dir)
    prompt = clone_model.create_voice_clone_prompt(
        (ref_wavs[0], sr), ref_text=ref_text
    )

    sentences = [
        "No problem! I actually... kinda finished those already? If you "
        "want to compare answers or something...",
        "What? No! I mean yes but not like... I just think you're... your "
        "titration technique is really precise!",
    ]

    # 3a) Reuse the prompt for single calls (no re-extraction per call).
    for i, line in enumerate(sentences):
        wavs, out_sr = clone_model.generate_voice_clone(
            line, prompt, language="english"
        )
        write_wav(f"clone_single_{i + 1}.wav", wavs[0], out_sr)

    # 3b) Or batch them in one call (a 1-item prompt broadcasts over texts).
    wavs, out_sr = clone_model.generate_voice_clone(
        sentences, prompt, language=["english", "english"]
    )
    for i, w in enumerate(wavs):
        write_wav(f"clone_batch_{i}.wav", w, out_sr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
