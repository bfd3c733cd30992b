#!/usr/bin/env python3
"""Greedy EOS/token parity: the production jitted decode loop vs the
independent cache-free eager decoder (qwen_tts_tpu/validation.py) — the
framework's analog of the reference's C-vs-Python parity gate
(scripts/validate_eos_parity.py there).

Usage:
  python scripts/validate_eos_parity.py -d MODEL_DIR -t 1,2,3,... [-s spk]
      [-l lang] [--max-tokens N]
  python scripts/validate_eos_parity.py --tiny        # synthetic checkpoint
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-d", dest="model_dir")
    p.add_argument("-t", dest="tokens")
    p.add_argument("-f", dest="token_file")
    p.add_argument("-s", dest="speaker", default=None)
    p.add_argument("-l", dest="language", default="auto")
    p.add_argument("--max-tokens", type=int, default=32)
    p.add_argument("--tiny", action="store_true",
                   help="run on a synthetic tiny checkpoint (CI mode)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu or args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from qwen_tts_tpu.generate import build_prompt
    from qwen_tts_tpu.pipeline import Qwen3TTSModel
    from qwen_tts_tpu.validation import check_parity

    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from ckpt_fixture import make_checkpoint

        model_dir = tempfile.mkdtemp(prefix="qtts_parity_")
        make_checkpoint(model_dir)
        ids = np.array([1, 2, 3, 10, 11, 12, 13, 14, 4, 5, 1, 2, 3], np.int32)
        speaker, language = "aiden", "english"
    else:
        if not args.model_dir:
            p.error("need -d MODEL_DIR (or --tiny)")
        model_dir = args.model_dir
        if args.tokens:
            ids = np.asarray([int(x) for x in args.tokens.split(",")], np.int32)
        elif args.token_file:
            with open(args.token_file) as f:
                ids = np.asarray(
                    [int(x) for x in f.read().replace(",", "\n").split()], np.int32
                )
        else:
            p.error("need -t or -f")
        speaker, language = args.speaker, args.language

    # Parity runs in f32 (the reference validates in f32 too — SURVEY.md §7).
    model = Qwen3TTSModel.from_pretrained(
        model_dir, talker_dtype=jnp.float32, load_tokenizer=False
    )
    prompt = build_prompt(
        model.talker_params, model.cfg, ids, language=language, speaker=speaker,
        st_params=model.subtalker_params,
    )
    result = check_parity(
        model.talker_params, model.subtalker_params, model.cfg, prompt,
        args.max_tokens,
    )
    print(result.report())
    return 0 if result.ok else 1


if __name__ == "__main__":
    sys.exit(main())
