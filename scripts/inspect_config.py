#!/usr/bin/env python3
"""Dump config dims from a checkpoint directory (porting-validation tool,
analog of the reference's test/inspect_config.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen_tts_tpu.config import TTSConfig  # noqa: E402


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: inspect_config.py MODEL_DIR", file=sys.stderr)
        return 2
    cfg = TTSConfig.from_pretrained(sys.argv[1])
    tk, cp, dec = cfg.talker, cfg.talker.code_predictor, cfg.codec.decoder
    print(json.dumps({
        "talker": {
            "vocab_size": tk.vocab_size, "hidden": tk.hidden_size,
            "intermediate": tk.intermediate_size, "layers": tk.num_hidden_layers,
            "heads": tk.num_attention_heads, "kv_heads": tk.num_key_value_heads,
            "head_dim": tk.head_dim, "num_code_groups": tk.num_code_groups,
            "text_hidden": tk.text_hidden_size, "text_vocab": tk.text_vocab_size,
            "mrope_section": list(tk.mrope_section),
            "codec_tokens": {
                "pad": tk.codec_pad_id, "bos": tk.codec_bos_id,
                "eos": tk.codec_eos_token_id, "think": tk.codec_think_id,
                "nothink": tk.codec_nothink_id,
                "think_bos": tk.codec_think_bos_id,
                "think_eos": tk.codec_think_eos_id,
            },
            "speakers": len(tk.spk_id), "languages": len(tk.codec_language_id),
        },
        "code_predictor": {
            "vocab_size": cp.vocab_size, "hidden": cp.hidden_size,
            "intermediate": cp.intermediate_size, "layers": cp.num_hidden_layers,
            "heads": cp.num_attention_heads, "kv_heads": cp.num_key_value_heads,
            "head_dim": cp.head_dim,
        },
        "codec_decoder": {
            "codebook_size": dec.codebook_size, "codebook_dim": dec.codebook_dim,
            "hidden": dec.hidden_size, "latent": dec.latent_dim,
            "layers": dec.num_hidden_layers, "sliding_window": dec.sliding_window,
            "num_quantizers": dec.num_quantizers,
            "upsample_rates": list(dec.upsample_rates),
            "upsampling_ratios": list(dec.upsampling_ratios),
            "decoder_dim": dec.decoder_dim, "total_upsample": dec.total_upsample,
        },
        "model_type": cfg.tts_model_type,
        "tokenizer_type": cfg.tokenizer_type,
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
