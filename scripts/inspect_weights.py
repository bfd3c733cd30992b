#!/usr/bin/env python3
"""Dump safetensors tensor names/dtypes/shapes from a checkpoint directory
(analog of the reference's test/inspect_weights.py). Filters to the load-
bearing tensors by default; --all dumps everything."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen_tts_tpu.io.safetensors import MultiSafeTensors  # noqa: E402

KEY_PATTERNS = (
    "codec_embedding", "text_embedding", "text_projection", "codec_head",
    "small_to_mtp", "lm_head.0.", "lm_head.1.", "codec_embedding.0",
    "codec_embedding.1", "norm.weight", "quantizer", "pre_conv",
    "decoder.decoder.0", "speaker_encoder.fc",
)


def dump(d: str, show_all: bool):
    st = MultiSafeTensors(d)
    for name in sorted(st.keys()):
        if show_all or any(p in name for p in KEY_PATTERNS):
            dtype, shape = st.info(name)
            print(f"{name}  {dtype}  {list(shape)}")
    st.close()


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    show_all = "--all" in sys.argv
    if len(args) != 1:
        print("usage: inspect_weights.py MODEL_DIR [--all]", file=sys.stderr)
        return 2
    model_dir = args[0]
    dump(model_dir, show_all)
    st_dir = os.path.join(model_dir, "speech_tokenizer")
    if os.path.isdir(st_dir):
        print("--- speech_tokenizer ---")
        dump(st_dir, show_all)
    return 0


if __name__ == "__main__":
    sys.exit(main())
