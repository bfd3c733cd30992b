"""Execute the Gradio demo's UI builder and generation callbacks under a
minimal gradio stub — gradio isn't in this image, so this is what keeps
demo.py from being never-executed code: every tab's callback (clone,
custom-voice, save-voice, load-voice-and-generate) runs end-to-end against
the tiny fixture model."""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel


class _Component:
    def __init__(self, *a, **k):
        self.args = a
        self.kwargs = k


class _Button(_Component):
    def click(self, fn, inputs, outputs):
        _REGISTRY.append((fn, inputs, outputs))


_REGISTRY = []


class _Ctx:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _install_gradio_stub():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Ctx
    gr.Tab = _Ctx
    gr.Tabs = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Component
    gr.Textbox = _Component
    gr.Dropdown = _Component
    gr.Slider = _Component
    gr.Checkbox = _Component
    gr.Audio = _Component
    gr.File = _Component
    gr.Button = _Button
    sys.modules["gradio"] = gr
    return gr


@pytest.fixture(scope="module")
def base_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


def _ctl():
    # (max_new_tokens, temperature, top_k, top_p, repetition_penalty)
    return (5, 0.9, 2, 1.0, 1.0)


def _ref_pcm16():
    rng = np.random.default_rng(0)
    ref_wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    return (16000, (ref_wav * 32767).astype(np.int16))


def _patch_ids(monkeypatch, model):
    monkeypatch.setattr(
        model, "_tokenize",
        lambda s: np.array([1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3], np.int32),
    )


def test_demo_base_clone_callback_end_to_end(base_model, monkeypatch):
    _install_gradio_stub()
    _REGISTRY.clear()
    from qwen_tts_tpu import demo as demo_mod

    # The fixture ships speaker+Mimi encoders → "base" kind → clone tab.
    assert demo_mod.detect_model_kind(base_model) == "base"
    _patch_ids(monkeypatch, base_model)
    demo_mod.build_demo(base_model)
    # Clone tab + Save/Load tab register 3 callbacks.
    assert len(_REGISTRY) == 3
    run_clone, inputs, outputs = _REGISTRY[0]

    (sr, wav), status = run_clone(
        _ref_pcm16(),  # gradio-style int PCM
        "reference transcript", False, "text to speak", "english", *_ctl()
    )
    assert status == "Finished."
    assert sr == 24000
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.isfinite(wav).all()

    # Errors surface in the Status box, not as exceptions (demo.py status
    # pattern mirrors reference cli/demo.py:317-338).
    out, status = run_clone(None, "t", False, "text", "english", *_ctl())
    assert out is None and "required" in status


def test_demo_save_load_voice_tab(base_model, monkeypatch, tmp_path):
    _install_gradio_stub()
    _REGISTRY.clear()
    from qwen_tts_tpu import demo as demo_mod

    _patch_ids(monkeypatch, base_model)
    demo_mod.build_demo(base_model)
    save_voice = _REGISTRY[1][0]
    load_and_gen = _REGISTRY[2][0]

    path, status = save_voice(_ref_pcm16(), "reference transcript", False)
    assert status == "Finished." and path.endswith(".pt")

    (sr, wav), status = load_and_gen(path, "text to speak", "english")
    assert status == "Finished."
    assert sr == 24000 and wav.shape[0] > 0 and np.isfinite(wav).all()

    # Missing file / missing text are reported, not raised.
    out, status = load_and_gen(None, "text", "english")
    assert out is None and "required" in status
    out, status = load_and_gen(path, "  ", "english")
    assert out is None and "required" in status


def test_demo_custom_voice_callback(base_model, monkeypatch):
    _install_gradio_stub()
    _REGISTRY.clear()
    from qwen_tts_tpu import demo as demo_mod

    import dataclasses

    monkeypatch.setattr(
        base_model, "cfg",
        dataclasses.replace(base_model.cfg, tts_model_type="custom_voice"),
    )
    _patch_ids(monkeypatch, base_model)
    demo_mod.build_demo(base_model)
    run_cv, _, _ = _REGISTRY[0]
    (sr, wav), status = run_cv("hello there", "aiden", "english", *_ctl())
    assert status == "Finished."
    assert sr == 24000
    assert wav.shape[0] > 0 and np.isfinite(wav).all()


def test_normalize_gradio_audio_int_dtypes():
    from qwen_tts_tpu.demo import normalize_gradio_audio

    # Signed 16-bit full-range (reference demo.py:196-199).
    y = normalize_gradio_audio(np.array([-32768, 0, 32767], np.int16))
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, [-1.0, 0.0, 32767 / 32768], atol=1e-6)
    # Unsigned 8-bit: midpoint-centred (reference demo.py:200-202).
    y = normalize_gradio_audio(np.array([0, 128, 255], np.uint8))
    np.testing.assert_allclose(y, [-1.0, 0.0, 127 / 128], atol=1e-6)
    # Float above 1 is peak-normalized; stereo is downmixed.
    y = normalize_gradio_audio(np.array([[2.0, 0.0], [0.0, -2.0]]))
    assert y.shape == (2,) and np.abs(y).max() <= 1.0


def test_demo_parser_reference_surface():
    from qwen_tts_tpu.demo import build_parser, collect_gen_defaults

    args = build_parser().parse_args([
        "/tmp/ckpt", "--temperature", "0.7", "--subtalker-top-k", "8",
        "--ip", "0.0.0.0", "--port", "8000",
    ])
    assert args.checkpoint_pos == "/tmp/ckpt"
    assert args.host == "0.0.0.0" and args.port == 8000
    gd = collect_gen_defaults(args)
    assert gd == {"temperature": 0.7, "subtalker_top_k": 8}
    # -d/--model-dir kept as aliases for round-1 compatibility.
    args = build_parser().parse_args(["-d", "/x"])
    assert args.checkpoint == "/x"
