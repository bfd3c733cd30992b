"""qwen3-tts-tpu: TPU-native Qwen3-TTS framework (JAX/XLA).

Public surface:

    from qwen_tts_tpu import Qwen3TTSModel, Qwen3TTSTokenizer

    model = Qwen3TTSModel.from_pretrained(ckpt_dir)
    wavs, sr = model.generate_custom_voice("Hello!", speaker="aiden")

Heavy imports are deferred: importing the package is cheap; model classes load
jax lazily on first use.
"""

import os as _os

# transformers (used for the optional HF tokenizer and the torch Mimi
# fallback) imports TensorFlow when it is installed — and libtensorflow_cc
# bundles a SECOND copy of XLA/LLVM/absl that corrupts later jaxlib CPU
# compiles (delayed segfault in backend_compile_and_load; root-caused from a
# core dump in round 3). A JAX framework never wants TF in-process; opt out
# before any transformers import unless the user explicitly set USE_TF.
_os.environ.setdefault("USE_TF", "0")

__version__ = "0.1.0"

__all__ = [
    "Qwen3TTSModel",
    "Qwen3TTSTokenizer",
    "GenerationParams",
    "ServingEngine",
    "ContinuousBatchingEngine",
    "save_voice_clone_prompt",
    "load_voice_clone_prompt",
]


def __getattr__(name):
    if name == "Qwen3TTSModel":
        from qwen_tts_tpu.pipeline import Qwen3TTSModel

        return Qwen3TTSModel
    if name == "Qwen3TTSTokenizer":
        from qwen_tts_tpu.tokenizer import Qwen3TTSTokenizer

        return Qwen3TTSTokenizer
    if name == "GenerationParams":
        from qwen_tts_tpu.generate import GenerationParams

        return GenerationParams
    if name == "ServingEngine":
        from qwen_tts_tpu.serving import ServingEngine

        return ServingEngine
    if name == "ContinuousBatchingEngine":
        from qwen_tts_tpu.continuous import ContinuousBatchingEngine

        return ContinuousBatchingEngine
    if name in ("save_voice_clone_prompt", "load_voice_clone_prompt"):
        from qwen_tts_tpu import voice_prompt

        return getattr(voice_prompt, name)
    raise AttributeError(f"module 'qwen_tts_tpu' has no attribute {name!r}")
