"""``python -m qwen_tts_tpu`` — entry-point directory.

Mirrors the reference's package entry (qwen_tts/__main__.py:16-21), which
prints its CLI entrypoints; ours lists every runnable surface of the
framework.
"""


def main() -> None:
    print(
        "qwen_tts_tpu package (TPU-native Qwen3-TTS).\n"
        "Entry points:\n"
        "  - python -m qwen_tts_tpu.cli      synthesis CLI (WAV out, bench)\n"
        "  - python -m qwen_tts_tpu.server   HTTP serving (/tts /stream ...)\n"
        "  - python demo.py                  Gradio demo (needs gradio)\n"
        "  - python bench.py                 one-line RTF benchmark\n"
        "  - scripts/                        acceptance, benchmarks, SFT, soak\n"
    )


if __name__ == "__main__":
    main()
