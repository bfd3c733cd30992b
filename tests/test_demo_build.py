"""Execute the Gradio demo's UI builder and generation callbacks under a
minimal gradio stub — gradio isn't in this image, so this is what keeps
demo.py from being never-executed code: every tab's callback runs end-to-end
against the tiny fixture model."""

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
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.clicks = []

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
    gr.Markdown = _Component
    gr.Textbox = _Component
    gr.Dropdown = _Component
    gr.Slider = _Component
    gr.Checkbox = _Component
    gr.Audio = _Component
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


def test_demo_base_clone_callback_end_to_end(base_model, monkeypatch):
    _install_gradio_stub()
    _REGISTRY.clear()
    from qwen_tts_tpu import demo as demo_mod

    # The fixture ships speaker+Mimi encoders → "base" kind → clone tab.
    assert demo_mod.detect_model_kind(base_model) == "base"
    # Demo tokenizes text; the fixture has no HF tokenizer — patch in ids.
    monkeypatch.setattr(
        base_model, "_tokenize",
        lambda s: np.array([1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3], np.int32),
    )
    demo_mod.build_demo(base_model)
    assert len(_REGISTRY) == 1
    run_clone, inputs, outputs = _REGISTRY[0]

    rng = np.random.default_rng(0)
    ref_wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    sr, wav = run_clone(
        (16000, (ref_wav * 32767).astype(np.int16)),  # gradio-style int PCM
        "reference transcript", "text to speak", "english", False, *_ctl()
    )
    assert sr == 24000
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.isfinite(wav).all()


def test_demo_custom_voice_callback(base_model, monkeypatch):
    _install_gradio_stub()
    _REGISTRY.clear()
    from qwen_tts_tpu import demo as demo_mod

    import dataclasses

    monkeypatch.setattr(
        base_model, "cfg",
        dataclasses.replace(base_model.cfg, tts_model_type="custom_voice"),
    )
    monkeypatch.setattr(
        base_model, "_tokenize",
        lambda s: np.array([1, 2, 3, 20, 21, 4, 5, 1, 2, 3], np.int32),
    )
    demo_mod.build_demo(base_model)
    run_cv, _, _ = _REGISTRY[0]
    sr, wav = run_cv("hello there", "aiden", "english", *_ctl())
    assert sr == 24000
    assert wav.shape[0] > 0 and np.isfinite(wav).all()
