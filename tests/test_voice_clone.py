"""Voice clone end-to-end on the with-encoders fixture: x-vector extraction,
12 Hz reference encoding, ICL prompt, clone generation with wav-prefix cut."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel


class FakeTokenizer:
    """Maps text deterministically to ids in the tiny text-vocab range."""

    def __call__(self, text):
        ids = [1, 2, 3] + [10 + (ord(c) % 40) for c in text[:6]] + [4, 5]
        if text.endswith("assistant\n") and text.count("<|im_start|>") > 1:
            ids += [1, 2, 3]
        return {"input_ids": ids}


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("vc_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    m = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    m.tokenizer = FakeTokenizer()
    return m


def test_base_model_loads_speaker_encoder(model):
    assert model.speaker_params is not None
    assert model.cfg.tts_model_type == "base"


def test_extract_speaker_embedding(model):
    wav = (0.1 * np.sin(np.linspace(0, 200, 24000))).astype(np.float32)
    xvec = model.extract_speaker_embedding(wav, 24000)
    assert xvec.shape == (model.cfg.speaker_encoder.enc_dim,)
    assert np.isfinite(xvec).all()


def test_create_voice_clone_prompt_icl(model):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, ref_text="hello")
    assert prompt["icl_mode"] == [True]
    codes = prompt["ref_code"][0]
    assert codes.shape[1] == model.cfg.talker.num_code_groups
    assert codes.shape[0] == -(-4800 // model.cfg.codec.encode_downsample_rate)
    assert prompt["ref_spk_embedding"][0].shape == (
        model.cfg.speaker_encoder.enc_dim,
    )


def test_generate_voice_clone_end_to_end(model):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, ref_text="ref")
    wavs, sr = model.generate_voice_clone(
        "hi", prompt, language="english",
        max_new_tokens=4, do_sample=False, subtalker_dosample=False,
    )
    assert sr == 24000
    assert len(wavs) == 1
    # The reference-proportional wav prefix is cut (qwen3_tts_model.py:622-631):
    # output length == generated frames × upsample (ref frames removed).
    up = model.cfg.codec.decode_upsample_rate
    assert wavs[0].shape[0] % up == 0
    assert np.isfinite(wavs[0]).all()


def test_x_vector_only_mode(model):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, x_vector_only_mode=True)
    assert prompt["icl_mode"] == [False]
    assert prompt["ref_code"] == [None]
    wavs, sr = model.generate_voice_clone(
        "hi", prompt, language="auto",
        max_new_tokens=3, do_sample=False, subtalker_dosample=False,
    )
    assert len(wavs) == 1


def test_generate_voice_clone_broadcasts_single_prompt(model):
    """One prompt item over N texts broadcasts (reference repeats
    prompt_items * len(texts), qwen3_tts_model.py:570-586); a 2-vs-3
    mismatch raises a clear ValueError instead of an IndexError."""
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, ref_text="ref")
    wavs, sr = model.generate_voice_clone(
        ["hi there", "second text"], voice_clone_prompt=prompt,
        max_new_tokens=4, do_sample=False, subtalker_dosample=False,
    )
    assert len(wavs) == 2
    assert all(w.size > 0 for w in wavs)

    two = {k: (list(v) * 2 if v else v) for k, v in prompt.items()}
    with pytest.raises(ValueError, match="2 item"):
        model.generate_voice_clone(
            ["a", "b", "c"], voice_clone_prompt=two,
            max_new_tokens=4, do_sample=False, subtalker_dosample=False,
        )
