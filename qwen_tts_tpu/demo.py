"""``qwen-tts-demo`` — Gradio UI mirroring the reference demo
(qwen_tts/cli/demo.py): model-kind autodetection with per-kind tabs
(CustomVoice / VoiceDesign / Base voice clone) and generation-parameter
controls. Gradio is an optional dependency; a clear error explains how to get
the UI when it's absent (this image does not ship it)."""

from __future__ import annotations

import argparse
import sys


def detect_model_kind(model) -> str:
    """Reference autodetect (demo.py:246-252): by tts_model_type."""
    kind = (model.cfg.tts_model_type or "").lower()
    if "custom" in kind:
        return "custom_voice"
    if "design" in kind:
        return "voice_design"
    if kind == "base":
        return "base"
    return "custom_voice"


def build_demo(model):
    import gradio as gr

    kind = detect_model_kind(model)

    def gen_kwargs_inputs():
        return [
            gr.Slider(1, 4096, value=2048, step=1, label="max_new_tokens"),
            gr.Slider(0.0, 2.0, value=0.9, step=0.05, label="temperature"),
            gr.Slider(0, 200, value=50, step=1, label="top_k"),
            gr.Slider(0.0, 1.0, value=1.0, step=0.01, label="top_p"),
            gr.Slider(1.0, 2.0, value=1.05, step=0.01,
                      label="repetition_penalty"),
        ]

    def unpack(mnt, temp, tk, tp, rp):
        return dict(max_new_tokens=int(mnt), temperature=temp, top_k=int(tk),
                    top_p=tp, repetition_penalty=rp)

    with gr.Blocks(title="Qwen3-TTS (TPU)") as demo:
        gr.Markdown("# Qwen3-TTS — TPU-native inference")
        if kind == "custom_voice":
            with gr.Tab("CustomVoice"):
                text = gr.Textbox(label="Text", lines=3)
                speaker = gr.Dropdown(model.get_supported_speakers(),
                                      label="Speaker")
                language = gr.Dropdown(model.get_supported_languages(),
                                       value="auto", label="Language")
                controls = gen_kwargs_inputs()
                audio = gr.Audio(label="Output", type="numpy")

                def run_cv(text, speaker, language, *ctl):
                    wavs, sr = model.generate_custom_voice(
                        text, speaker, language, **unpack(*ctl)
                    )
                    return (sr, wavs[0])

                gr.Button("Generate").click(
                    run_cv, [text, speaker, language, *controls], audio
                )
        elif kind == "voice_design":
            with gr.Tab("VoiceDesign"):
                text = gr.Textbox(label="Text", lines=3)
                instruct = gr.Textbox(label="Voice description", lines=2)
                language = gr.Dropdown(model.get_supported_languages(),
                                       value="auto", label="Language")
                controls = gen_kwargs_inputs()
                audio = gr.Audio(label="Output", type="numpy")

                def run_vd(text, instruct, language, *ctl):
                    wavs, sr = model.generate_voice_design(
                        text, instruct, language, **unpack(*ctl)
                    )
                    return (sr, wavs[0])

                gr.Button("Generate").click(
                    run_vd, [text, instruct, language, *controls], audio
                )
        else:  # base: voice clone (file upload or mic)
            with gr.Tab("Voice clone"):
                ref = gr.Audio(label="Reference audio", type="numpy",
                               sources=["upload", "microphone"])
                ref_text = gr.Textbox(label="Reference transcript", lines=2)
                text = gr.Textbox(label="Text to speak", lines=3)
                language = gr.Dropdown(model.get_supported_languages(),
                                       value="auto", label="Language")
                xvec_only = gr.Checkbox(label="x-vector only (no ICL)")
                controls = gen_kwargs_inputs()
                audio = gr.Audio(label="Output", type="numpy")

                def run_clone(ref, ref_text, text, language, xvec_only, *ctl):
                    sr_in, wav = ref
                    import numpy as np

                    from qwen_tts_tpu.audio import resample

                    wav = np.asarray(wav, np.float32)
                    if wav.ndim > 1:
                        wav = wav.mean(axis=-1)
                    if np.abs(wav).max() > 1.5:  # int PCM from gradio
                        wav = wav / 32768.0
                    wav = resample(wav, sr_in, 24000)
                    prompt = model.create_voice_clone_prompt(
                        wav, ref_text=ref_text,
                        x_vector_only_mode=bool(xvec_only),
                    )
                    wavs, sr = model.generate_voice_clone(
                        text, prompt, language, **unpack(*ctl)
                    )
                    return (sr, wavs[0])

                gr.Button("Generate").click(
                    run_clone,
                    [ref, ref_text, text, language, xvec_only, *controls],
                    audio,
                )
    return demo


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen-tts-demo")
    p.add_argument("-d", "--model-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    # SSL / serving flags (reference cli/demo.py surface).
    p.add_argument("--ssl-certfile", default=None)
    p.add_argument("--ssl-keyfile", default=None)
    p.add_argument("--no-ssl-verify", action="store_true")
    p.add_argument("--concurrency", type=int, default=1,
                   help="max concurrent generation requests")
    args = p.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError:
        print(
            "gradio is not installed in this environment. Install it "
            "(pip install gradio) to use the web demo, or use the CLI "
            "(python -m qwen_tts_tpu.cli) / HTTP server "
            "(python -m qwen_tts_tpu.server) instead.",
            file=sys.stderr,
        )
        return 3

    from qwen_tts_tpu.pipeline import Qwen3TTSModel
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(args.model_dir)
    demo = build_demo(model)
    demo.queue(default_concurrency_limit=args.concurrency)
    demo.launch(
        server_name=args.host, server_port=args.port, share=args.share,
        ssl_certfile=args.ssl_certfile, ssl_keyfile=args.ssl_keyfile,
        ssl_verify=not args.no_ssl_verify,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
