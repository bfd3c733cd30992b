"""Voice-file serialization: save/load roundtrip in both containers (.pt
torch payload — byte-compatible with the reference demo's Save Voice flow,
cli/demo.py:501-583 — and the torch-free .npz), interop with a payload
written exactly the way the reference writes it, and greedy generation
parity between a fresh prompt and its reloaded copy."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.voice_prompt import (
    load_voice_clone_prompt,
    save_voice_clone_prompt,
)
from test_voice_clone import FakeTokenizer


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("vp_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    m = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    m.tokenizer = FakeTokenizer()
    return m


@pytest.fixture(scope="module")
def prompt(model):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    return model.create_voice_clone_prompt(wav, ref_text="ref")


def _assert_prompt_equal(a, b):
    assert len(a["ref_spk_embedding"]) == len(b["ref_spk_embedding"])
    for i in range(len(a["ref_spk_embedding"])):
        np.testing.assert_array_equal(
            np.asarray(a["ref_spk_embedding"][i], np.float32),
            b["ref_spk_embedding"][i],
        )
        if a["ref_code"][i] is None:
            assert b["ref_code"][i] is None
        else:
            np.testing.assert_array_equal(
                np.asarray(a["ref_code"][i], np.int32), b["ref_code"][i]
            )
        assert a["ref_text"][i] == b["ref_text"][i]
        assert a["icl_mode"][i] == b["icl_mode"][i]
        assert a["x_vector_only_mode"][i] == b["x_vector_only_mode"][i]


@pytest.mark.parametrize("suffix", [".pt", ".npz"])
def test_roundtrip(model, prompt, tmp_path, suffix):
    path = str(tmp_path / f"voice{suffix}")
    assert save_voice_clone_prompt(prompt, path) == path
    loaded = load_voice_clone_prompt(path)
    _assert_prompt_equal(prompt, loaded)

    kw = dict(language="english", max_new_tokens=4,
              do_sample=False, subtalker_dosample=False)
    ref_wavs, _ = model.generate_voice_clone("hi", prompt, **kw)
    got_wavs, _ = model.generate_voice_clone("hi", loaded, **kw)
    np.testing.assert_array_equal(ref_wavs[0], got_wavs[0])


def test_loads_reference_demo_payload(tmp_path):
    """A file written the way the reference demo writes it (torch.save of
    {"items": [dict with torch tensors]}, cli/demo.py:514-521) loads."""
    import torch

    payload = {"items": [{
        "ref_code": torch.arange(12, dtype=torch.int64).reshape(3, 4),
        "ref_spk_embedding": torch.linspace(-1, 1, 8),
        "ref_text": "hello",
        "icl_mode": True,
        "x_vector_only_mode": False,
    }]}
    path = str(tmp_path / "ref_voice.pt")
    torch.save(payload, path)
    p = load_voice_clone_prompt(path)
    assert p["ref_code"][0].shape == (3, 4)
    assert p["ref_code"][0].dtype == np.int32
    assert p["ref_spk_embedding"][0].dtype == np.float32
    assert p["ref_text"] == ["hello"]
    assert p["icl_mode"] == [True] and p["x_vector_only_mode"] == [False]


def test_reference_can_read_our_pt(model, prompt, tmp_path):
    """Symmetric interop: our .pt parses under the reference demo's loader
    semantics (torch.load weights_only=True + per-item field checks,
    cli/demo.py:526-560)."""
    import torch

    path = str(tmp_path / "ours.pt")
    save_voice_clone_prompt(prompt, path)
    payload = torch.load(path, map_location="cpu", weights_only=True)
    assert isinstance(payload, dict) and "items" in payload
    for d in payload["items"]:
        assert torch.is_tensor(d["ref_spk_embedding"])
        assert d["ref_code"] is None or torch.is_tensor(d["ref_code"])
        assert isinstance(d["x_vector_only_mode"], bool)


def test_xvec_only_prompt_roundtrip(model, tmp_path):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    p = model.create_voice_clone_prompt(wav, x_vector_only_mode=True)
    for suffix in (".pt", ".npz"):
        path = str(tmp_path / f"x{suffix}")
        save_voice_clone_prompt(p, path)
        loaded = load_voice_clone_prompt(path)
        assert loaded["ref_code"] == [None]
        assert loaded["x_vector_only_mode"] == [True]
        assert loaded["icl_mode"] == [False]


def test_invalid_files_rejected(tmp_path):
    import torch

    bad = str(tmp_path / "bad.pt")
    torch.save({"nope": 1}, bad)
    with pytest.raises(ValueError, match="items"):
        load_voice_clone_prompt(bad)
    empty = str(tmp_path / "empty.pt")
    torch.save({"items": []}, empty)
    with pytest.raises(ValueError, match="empty"):
        load_voice_clone_prompt(empty)


def test_generate_accepts_reference_item_forms(model, prompt):
    """generate_voice_clone takes the reference's prompt forms
    (qwen3_tts_model.py:470-487): items list / single item / flat dict —
    all equal to the dict layout, greedy."""
    kw = dict(language="english", max_new_tokens=3,
              do_sample=False, subtalker_dosample=False)
    want, _ = model.generate_voice_clone("hi", prompt, **kw)

    item = {
        "ref_code": prompt["ref_code"][0],
        "ref_spk_embedding": prompt["ref_spk_embedding"][0],
        "ref_text": prompt["ref_text"][0],
        "icl_mode": True,
        "x_vector_only_mode": False,
    }
    for form in ([item], item):
        got, _ = model.generate_voice_clone("hi", form, **kw)
        np.testing.assert_array_equal(want[0], got[0])


def test_generate_builds_prompt_from_ref_audio(model):
    """The reference's inline path: generate_voice_clone(ref_audio=...)
    without a prebuilt prompt (qwen3_tts_model.py:560-588)."""
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    kw = dict(language="english", max_new_tokens=3,
              do_sample=False, subtalker_dosample=False)
    two_step, _ = model.generate_voice_clone(
        "hi", model.create_voice_clone_prompt((wav, 24000), ref_text="ref"),
        **kw,
    )
    inline, _ = model.generate_voice_clone(
        "hi", ref_audio=(wav, 24000), ref_text="ref", **kw,
    )
    np.testing.assert_array_equal(two_step[0], inline[0])
    with pytest.raises(ValueError, match="ref_audio"):
        model.generate_voice_clone("hi", **kw)
