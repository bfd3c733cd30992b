"""Reference-in-the-loop parity: this framework vs the ACTUAL reference
implementation (/root/reference's qwen_tts PyTorch package) on a shared
fixture checkpoint.

The fixture uses a 1088-token talker vocab so the reference's hardcoded
1024-id suppress ban (modeling_qwen3_tts.py:2059-2063) is well-formed, and
special ids live in the banned tail exactly like the flagship layout.

Contract (VERDICT round-1 item 2): token-exact greedy codes (all groups) +
EOS step across prompt schemas, and codec waveforms within f32 tolerance.
"""

import dataclasses

import numpy as np
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.config import TTSConfig, tiny_tts_config
from qwen_tts_tpu.generate import (
    GenerationParams,
    batch_prompts,
    build_prompt,
    generate_codes,
)
from qwen_tts_tpu.io.loader import load_checkpoint

import ref_oracle

import jax
import jax.numpy as jnp


def parity_cfg() -> TTSConfig:
    """Tiny dims, flagship-style vocab layout: 1088 ids, last 1024 banned,
    special ids inside the banned band (cf. configuration_qwen3_tts.py
    defaults 4196-4205 with the real >5k-row embedding)."""
    base = tiny_tts_config()
    tk = dataclasses.replace(
        base.talker,
        vocab_size=1088,
        suppress_tail=1024,
        codec_pad_id=1056,
        codec_bos_id=1057,
        codec_eos_token_id=1058,
        codec_think_id=1062,
        codec_nothink_id=1063,
        codec_think_bos_id=1064,
        codec_think_eos_id=1065,
        spk_id=(("aiden", 900), ("serena", 901)),
        spk_is_dialect=(("aiden", ""), ("serena", "")),
        codec_language_id=(("chinese", 950), ("english", 951)),
    )
    # extract_speaker_embedding hardcodes 128 mel bins
    # (modeling_qwen3_tts.py:1944-1949) — the parity fixture must match.
    spk = dataclasses.replace(base.speaker_encoder, mel_dim=128)
    return dataclasses.replace(base, talker=tk, speaker_encoder=spk)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ref_parity_ckpt"))
    cfg = make_checkpoint(d, parity_cfg(), with_encoders=True)
    return d, cfg


@pytest.fixture(scope="module")
def ref_model(ckpt):
    model_dir, _ = ckpt
    model, _cfg = ref_oracle.load_ref_tts(model_dir)
    return model


@pytest.fixture(scope="module")
def jx(ckpt):
    model_dir, _ = ckpt
    cfg, talker, subtalker, codec, speaker = load_checkpoint(
        model_dir, talker_dtype=jnp.float32, codec_dtype=jnp.float32
    )
    return cfg, talker, subtalker, codec, speaker


def _text_ids(n_content=6, base=10):
    # [im_start, assistant, \n] + content + [im_end, \n, im_start, assistant, \n]
    return np.array(
        [1, 2, 3] + list(range(base, base + n_content)) + [4, 5, 1, 2, 3],
        np.int32,
    )


GREEDY = GenerationParams(
    max_new_tokens=24, do_sample=False, subtalker_do_sample=False,
    repetition_penalty=1.05, min_new_tokens=2,
)


def _ours(jx_bundle, prompts, params=GREEDY):
    cfg, talker, subtalker, _codec, _spk = jx_bundle
    embeds, mask, trailing, _ = batch_prompts(prompts)
    out = generate_codes(
        talker, subtalker, cfg.talker,
        jnp.asarray(embeds, jnp.float32), jnp.asarray(mask),
        jnp.asarray(trailing, jnp.float32),
        sampling=params.talker_sampling(),
        st_sampling=params.subtalker_sampling(),
        max_new_tokens=params.max_new_tokens,
        rng=jax.random.PRNGKey(0),
    )
    codes = np.asarray(out.codes)
    num_gen = np.asarray(out.num_gen)
    return [codes[i, : num_gen[i]] for i in range(codes.shape[0])], np.asarray(out.stopped)


def _check(ours_list, ref_list):
    assert len(ours_list) == len(ref_list)
    for i, (a, b) in enumerate(zip(ours_list, ref_list)):
        assert a.shape == b.shape, (
            f"row {i}: frames ours={a.shape} ref={b.shape}; "
            f"cb0 ours={a[:, 0] if a.size else a} ref={b[:, 0] if b.size else b}"
        )
        div = np.argwhere(a.astype(np.int64) != b.astype(np.int64))
        assert div.size == 0, (
            f"row {i}: first divergence at frame/group {div[0]}: "
            f"ours={a[tuple(div[0])]} ref={b[tuple(div[0])]}"
        )


def test_custom_voice_speaker_language(ckpt, ref_model, jx):
    _, cfg = ckpt
    ids = _text_ids()
    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["english"], speakers=["aiden"],
        max_new_tokens=24, repetition_penalty=1.05,
    )
    prompt = build_prompt(jx[1], jx[0], ids, language="english", speaker="aiden")
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref)


def test_auto_language_no_speaker(ckpt, ref_model, jx):
    ids = _text_ids(n_content=5, base=30)
    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["auto"], speakers=[None],
        max_new_tokens=24, repetition_penalty=1.05,
    )
    prompt = build_prompt(jx[1], jx[0], ids, language="auto", speaker=None)
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref)


def test_non_streaming_mode(ckpt, ref_model, jx):
    ids = _text_ids(n_content=7, base=50)
    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["english"], speakers=["serena"],
        max_new_tokens=24, repetition_penalty=1.05, non_streaming_mode=True,
    )
    prompt = build_prompt(
        jx[1], jx[0], ids, language="english", speaker="serena",
        non_streaming=True,
    )
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref)


def test_batch_left_padding(ckpt, ref_model, jx):
    """Two different-length prompts in one batch: left-padding + per-row
    trailing-text alignment (modeling_qwen3_tts.py:2239-2269)."""
    ids_a = _text_ids(n_content=4, base=10)
    ids_b = _text_ids(n_content=9, base=70)
    ref = ref_oracle.ref_generate(
        ref_model, [ids_a, ids_b], languages=["english", "chinese"],
        speakers=["aiden", "serena"], max_new_tokens=24,
        repetition_penalty=1.05,
    )
    prompts = [
        build_prompt(jx[1], jx[0], ids_a, language="english", speaker="aiden"),
        build_prompt(jx[1], jx[0], ids_b, language="chinese", speaker="serena"),
    ]
    ours, _ = _ours(jx, prompts)
    _check(ours, ref)


def test_icl_voice_clone(ckpt, ref_model, jx):
    """ICL prompt splice (modeling_qwen3_tts.py:1968-2019): ref text + ref
    codec Σ-embeddings, x-vector in the speaker slot."""
    cfg = jx[0]
    g = cfg.talker.num_code_groups
    rng = np.random.default_rng(7)
    ids = _text_ids(n_content=6, base=90)
    ref_ids = _text_ids(n_content=4, base=120)
    ref_code = rng.integers(0, 64, (5, g)).astype(np.int64)
    ref_code[:, 1:] = rng.integers(
        0, cfg.talker.code_predictor.vocab_size, (5, g - 1)
    )
    xvec = rng.standard_normal(cfg.talker.hidden_size).astype(np.float32)

    import torch

    vcp = {
        "ref_code": [torch.as_tensor(ref_code)],
        "ref_spk_embedding": [torch.as_tensor(xvec)],
        "icl_mode": [True],
        "x_vector_only_mode": [False],
    }
    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["english"], speakers=[None],
        max_new_tokens=24, repetition_penalty=1.05,
        ref_ids=[ref_ids], voice_clone_prompt=vcp,
    )
    prompt = build_prompt(
        jx[1], jx[0], ids, language="english", speaker=None,
        speaker_embed=xvec, ref_ids=ref_ids, ref_codes=ref_code,
        st_params=jx[2],
    )
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref)


def test_codec_waveform_vs_reference(ckpt, jx):
    from qwen_tts_tpu.models import codec as codec_mod

    model_dir, _ = ckpt
    cfg = jx[0]
    ref_codec = ref_oracle.load_ref_codec(model_dir + "/speech_tokenizer")

    import torch

    rng = np.random.default_rng(3)
    nq = cfg.codec.decoder.num_quantizers
    t = 9
    codes = rng.integers(0, cfg.codec.decoder.codebook_size, (2, t, nq))
    codes[1, 6:] = -1  # padded row — reference trims by length
    with torch.no_grad():
        ref_out = ref_codec.decode(torch.as_tensor(codes), return_dict=True)
    ref_wavs = [w.numpy() for w in ref_out.audio_values]

    batch = np.maximum(codes, 0).astype(np.int32)
    wav = np.asarray(
        codec_mod.codec_decode(jx[3], cfg.codec.decoder, jnp.asarray(batch))
    )
    up = cfg.codec.decode_upsample_rate
    lengths = [(codes[i, :, 0] > -1).sum() * up for i in range(2)]
    for i in range(2):
        a, b = wav[i, : lengths[i]], ref_wavs[i]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_mimi_encode_vs_reference(ckpt, jx):
    """12 Hz encode: our JAX Mimi port vs the reference V2 model's encode
    (modeling_...v2.py:961-991) incl. quantizer slice + length trim."""
    from qwen_tts_tpu.codec_encoder import SpeechTokenizerEncoder

    model_dir, _ = ckpt
    ref_codec = ref_oracle.load_ref_codec(model_dir + "/speech_tokenizer")

    import torch

    rng = np.random.default_rng(11)
    sr = 24000
    wav = (0.1 * rng.standard_normal(sr // 4)).astype(np.float32)
    enc = SpeechTokenizerEncoder.from_pretrained(
        model_dir + "/speech_tokenizer"
    )
    ours = enc.encode([wav], sr)[0]

    x = torch.as_tensor(wav).view(1, -1)
    mask = torch.ones_like(x, dtype=torch.long)
    with torch.no_grad():
        ref = ref_codec.encode(x, padding_mask=mask, return_dict=True)
    ref_codes = ref.audio_codes[0].numpy()
    assert ours.shape == ref_codes.shape, (ours.shape, ref_codes.shape)
    np.testing.assert_array_equal(np.asarray(ours), ref_codes)


def test_speaker_xvector_vs_reference(ckpt, ref_model, jx):
    """ECAPA x-vector via the reference's extract_speaker_embedding (mel +
    speaker_encoder, modeling_qwen3_tts.py:1940-1954) vs our JAX port."""
    from qwen_tts_tpu.models.speaker import (
        mel_spectrogram,
        speaker_encoder_forward,
    )

    cfg, _t, _s, _c, speaker_params = jx
    if speaker_params is None:
        pytest.skip("fixture has no speaker encoder")
    rng = np.random.default_rng(5)
    wav = (0.1 * rng.standard_normal(24000 // 2)).astype(np.float32)
    ref_vec = ref_model.extract_speaker_embedding(wav, 24000).numpy().ravel()
    mels = mel_spectrogram(
        jnp.asarray(wav[None]), n_fft=1024,
        num_mels=cfg.speaker_encoder.mel_dim, sampling_rate=24000,
        hop_size=256, win_size=1024, fmin=0, fmax=12000,
    )
    ours = np.asarray(
        speaker_encoder_forward(speaker_params, cfg.speaker_encoder, mels)
    ).ravel()
    assert ours.shape == ref_vec.shape
    np.testing.assert_allclose(ours, ref_vec, atol=2e-4, rtol=2e-3)


def test_instruct_prefix(ckpt, ref_model, jx):
    """Instruct ids prepend their projected text embeddings before the role
    header (modeling_qwen3_tts.py:2076-2082)."""
    ids = _text_ids(n_content=5, base=140)
    instruct = np.arange(160, 166, dtype=np.int32)

    import torch

    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["english"], speakers=["aiden"],
        max_new_tokens=24, repetition_penalty=1.05,
    )
    # reference instruct path: instruct_ids list aligned with input_ids
    with torch.no_grad():
        codes_list, _ = ref_model.generate(
            input_ids=[torch.as_tensor(np.asarray(ids)).view(1, -1)],
            instruct_ids=[torch.as_tensor(np.asarray(instruct)).view(1, -1)],
            languages=["english"], speakers=["aiden"],
            max_new_tokens=24, do_sample=False, subtalker_dosample=False,
            repetition_penalty=1.05,
        )
    ref_instr = [c.cpu().numpy() for c in codes_list]
    # sanity: the instruct prefix must actually change the trace on this
    # fixture (otherwise the comparison below proves nothing)
    different = (ref[0].shape != ref_instr[0].shape
                 or (ref[0] != ref_instr[0]).any())
    assert different, "instruct prefix had no effect on the reference trace"

    prompt = build_prompt(
        jx[1], jx[0], ids, language="english", speaker="aiden",
        instruct_ids=instruct,
    )
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref_instr)


def test_x_vector_only_clone(ckpt, ref_model, jx):
    """x-vector-only voice clone: speaker slot filled from the embedding, no
    ICL splice (modeling_qwen3_tts.py:2103-2106 x_vector_only_mode)."""
    cfg = jx[0]
    rng = np.random.default_rng(9)
    ids = _text_ids(n_content=6, base=150)
    xvec = rng.standard_normal(cfg.talker.hidden_size).astype(np.float32)

    import torch

    vcp = {
        "ref_code": None,
        "ref_spk_embedding": [torch.as_tensor(xvec)],
        "icl_mode": [False],
        "x_vector_only_mode": [True],
    }
    ref = ref_oracle.ref_generate(
        ref_model, [ids], languages=["english"], speakers=[None],
        max_new_tokens=24, repetition_penalty=1.05,
        voice_clone_prompt=vcp,
    )
    prompt = build_prompt(
        jx[1], jx[0], ids, language="english", speaker=None,
        speaker_embed=xvec,
    )
    ours, _ = _ours(jx, [prompt])
    _check(ours, ref)
