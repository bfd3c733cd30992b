"""Checkpoint loader + end-to-end pipeline from a synthetic on-disk checkpoint
in the reference format."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.config import TTSConfig
from qwen_tts_tpu.io.loader import load_checkpoint
from qwen_tts_tpu.io.safetensors import MultiSafeTensors
from qwen_tts_tpu.io.wav import read_wav, write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = make_checkpoint(str(d))
    return str(d), cfg


def test_config_roundtrip(ckpt):
    model_dir, cfg = ckpt
    loaded = TTSConfig.from_pretrained(model_dir)
    assert loaded.talker.vocab_size == cfg.talker.vocab_size
    assert loaded.talker.mrope_section == cfg.talker.mrope_section
    assert loaded.talker.speaker_codec_id("Aiden") == 100
    assert loaded.talker.language_codec_id("english") == 201
    assert loaded.codec.decoder.upsample_rates == cfg.codec.decoder.upsample_rates


def test_safetensors_zero_copy_and_shapes(ckpt):
    model_dir, cfg = ckpt
    st = MultiSafeTensors(model_dir)
    w = st.get("talker.model.codec_embedding.weight")
    assert w.shape == (cfg.talker.vocab_size, cfg.talker.hidden_size)
    assert not w.flags.owndata  # view into the mmap, no copy
    st.close()


def test_loader_layouts_and_precompute(ckpt):
    model_dir, cfg = ckpt
    _, talker, subtalker, codec, _spk = load_checkpoint(
        model_dir, talker_dtype=jnp.float32
    )
    st = MultiSafeTensors(model_dir)
    # Linear transpose [out,in] → [in,out].
    raw = st.get("talker.model.layers.0.self_attn.q_proj.weight")
    np.testing.assert_allclose(np.asarray(talker["trunk"]["wq"][0]), raw.T, atol=1e-6)
    st.close()

    stc = MultiSafeTensors(f"{model_dir}/speech_tokenizer")
    # Snake pre-exponentiation.
    a = stc.get("decoder.decoder.1.block.0.alpha")
    np.testing.assert_allclose(
        np.asarray(codec["blocks"][0]["alpha"]), np.exp(np.asarray(a)), rtol=1e-5
    )
    # RVQ fold: effective = (sum / clamp(usage)) @ proj.T.
    usage = np.asarray(stc.get("decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"))
    esum = np.asarray(stc.get("decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"))
    proj = np.asarray(stc.get("decoder.quantizer.rvq_first.output_proj.weight"))[:, :, 0]
    want = (esum / np.clip(usage, 1e-5, None)[:, None]) @ proj.T
    np.testing.assert_allclose(np.asarray(codec["codebooks"][0]), want, rtol=1e-4)
    stc.close()

    assert subtalker["embeds"].shape == (
        cfg.talker.num_code_groups - 1,
        cfg.talker.code_predictor.vocab_size,
        cfg.talker.hidden_size,
    )


def test_pipeline_end_to_end_from_disk(ckpt, tmp_path):
    model_dir, cfg = ckpt
    model = Qwen3TTSModel.from_pretrained(
        model_dir, talker_dtype=jnp.float32, load_tokenizer=False
    )
    assert model.get_supported_speakers() == ["aiden", "serena"]
    assert "english" in model.get_supported_languages()

    # Pre-tokenized path (no HF tokenizer needed for the tiny fixture).
    ids = np.array([1, 2, 3, 10, 11, 12, 13, 4, 5, 1, 2, 3], np.int32)
    from qwen_tts_tpu.generate import build_prompt

    prompt = build_prompt(
        model.talker_params, model.cfg, ids, language="english", speaker="aiden"
    )
    params = model._merge_params(max_new_tokens=4, do_sample=False,
                                 subtalker_dosample=False)
    codes, info = model.generate_codes_from_prompts([prompt], params)
    assert codes[0].shape[1] == cfg.talker.num_code_groups
    wavs = model.decode_codes(codes)
    up = cfg.codec.decode_upsample_rate
    assert wavs[0].shape == (codes[0].shape[0] * up,)
    assert np.isfinite(wavs[0]).all()
    assert (np.abs(wavs[0]) <= 1.0).all()

    # WAV round trip.
    path = str(tmp_path / "out.wav")
    write_wav(path, wavs[0], model.sample_rate)
    back, rate = read_wav(path)
    assert rate == model.sample_rate
    if wavs[0].size:
        np.testing.assert_allclose(back, wavs[0], atol=1e-3)


def test_decode_codes_bucketed_matches_exact(ckpt):
    """bucket= pads the codec input length to a multiple (bounding compiled
    serving shapes); the codec is causal, so the trimmed waveform must equal
    the exact-length decode for every row length."""
    model_dir, cfg = ckpt
    model = Qwen3TTSModel.from_pretrained(
        model_dir, talker_dtype=jnp.float32, load_tokenizer=False
    )
    rng = np.random.default_rng(0)
    nq = cfg.codec.decoder.num_quantizers
    codes = [
        rng.integers(0, cfg.codec.decoder.codebook_size, (t, nq)).astype(np.int32)
        for t in (3, 7, 5)
    ]
    exact = model.decode_codes(codes)
    bucketed = model.decode_codes(codes, bucket=8)
    for e, b in zip(exact, bucketed):
        assert e.shape == b.shape
        np.testing.assert_allclose(e, b, atol=1e-5)


def test_voice_clone_icl_path(ckpt):
    model_dir, cfg = ckpt
    model = Qwen3TTSModel.from_pretrained(
        model_dir, talker_dtype=jnp.float32, load_tokenizer=False
    )
    g = cfg.talker.num_code_groups
    ref_code = np.random.default_rng(0).integers(
        0, cfg.talker.code_predictor.vocab_size, (5, g)
    ).astype(np.int32)
    ref_ids = np.array([1, 2, 3, 20, 21, 4, 5], np.int32)
    ids = np.array([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
    from qwen_tts_tpu.generate import build_prompt

    p = build_prompt(
        model.talker_params, model.cfg, ids, language="auto",
        speaker_embed=np.zeros(cfg.talker.hidden_size, np.float32),
        ref_ids=ref_ids, ref_codes=ref_code, st_params=model.subtalker_params,
    )
    # prefix: role 3 + (think3 + spk + pad = 5 − counting codec ids 3+1+2 −1=5)
    # + ICL block — just sanity-check it built and decodes.
    params = model._merge_params(max_new_tokens=3, do_sample=False,
                                 subtalker_dosample=False)
    codes, _ = model.generate_codes_from_prompts([p], params)
    assert codes[0].shape[1] == g
