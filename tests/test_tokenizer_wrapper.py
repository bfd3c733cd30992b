"""Unified Qwen3TTSTokenizer wrapper: 12Hz and 25Hz families from disk."""

import numpy as np
import pytest

from ckpt_fixture import make_checkpoint
from ckpt_fixture_v1 import make_v1_checkpoint
from test_codec_v1 import TINY_V1
from qwen_tts_tpu.tokenizer import Qwen3TTSTokenizer


def test_v1_tokenizer_from_disk(tmp_path):
    d = str(tmp_path / "v1")
    make_v1_checkpoint(d, TINY_V1)
    tok = Qwen3TTSTokenizer.from_pretrained(d)
    assert tok.get_model_type() == "qwen3_tts_tokenizer_25hz"
    assert tok.get_output_sample_rate() == 24000

    rng = np.random.default_rng(0)
    payload = [
        {
            "audio_codes": rng.integers(0, TINY_V1.dit.num_embeds, (5,)),
            "xvectors": rng.standard_normal(TINY_V1.dit.enc_emb_dim).astype(np.float32),
            "ref_mels": (0.1 * rng.standard_normal((9, TINY_V1.dit.mel_dim))).astype(np.float32),
        },
        {
            "audio_codes": rng.integers(0, TINY_V1.dit.num_embeds, (3,)),
            "xvectors": rng.standard_normal(TINY_V1.dit.enc_emb_dim).astype(np.float32),
            "ref_mels": (0.1 * rng.standard_normal((9, TINY_V1.dit.mel_dim))).astype(np.float32),
        },
    ]
    wavs, sr = tok.decode(payload)
    assert sr == 24000
    assert wavs[0].shape[0] == 5 * TINY_V1.decode_upsample_rate
    assert wavs[1].shape[0] == 3 * TINY_V1.decode_upsample_rate
    for w in wavs:
        assert np.isfinite(w).all()
        assert (np.abs(w) <= 1.0).all()

    # This fixture ships no encoder tensors — encode must fail loudly.
    with pytest.raises((KeyError, FileNotFoundError)):
        tok.encode([np.zeros(1000, np.float32)], 16000)


def test_v1_encode_from_disk(tmp_path):
    from qwen_tts_tpu.models.whisper_vq import WhisperVQConfig
    from test_whisper_vq import TINY as TINY_ENC

    d = str(tmp_path / "v1e")
    make_v1_checkpoint(d, TINY_V1, enc_cfg=TINY_ENC)
    tok = Qwen3TTSTokenizer.from_pretrained(d)
    wav = (0.2 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    out = tok.encode([wav], 16000)
    codes = out["audio_codes"][0]
    assert codes.shape[0] == -(-16000 // (160 * 2 * TINY_ENC.audio_vq_ds_rate))
    assert (codes >= 0).all() and (codes < TINY_ENC.audio_vq_codebook_size).all()
    ref_mel = out["ref_mels"][0]
    assert ref_mel.shape[1] == 80
    assert out["xvectors"] is None  # CAM++ ONNX asset gated


def test_v2_tokenizer_from_disk(tmp_path):
    d = str(tmp_path / "v2")
    cfg = make_checkpoint(d)
    tok = Qwen3TTSTokenizer.from_pretrained(str(tmp_path / "v2" / "speech_tokenizer"))
    assert tok.get_model_type() == "qwen3_tts_tokenizer_12hz"
    nq = cfg.codec.decoder.num_quantizers
    codes = np.random.default_rng(1).integers(0, 64, (4, nq))
    wavs, sr = tok.decode({"audio_codes": [codes]})
    assert sr == 24000
    assert wavs[0].shape[0] == 4 * cfg.codec.decode_upsample_rate


def test_v1_encode_with_campplus_asset(tmp_path):
    """When campplus.onnx ships with the checkpoint, encode returns
    L2-normalized x-vectors through the native ONNX executor
    (modeling_...v1.py:1426-1446)."""
    from test_onnx_native import _make_tdnn_onnx
    from test_whisper_vq import TINY as TINY_ENC

    d = str(tmp_path / "v1x")
    make_v1_checkpoint(d, TINY_V1, enc_cfg=TINY_ENC)
    rng = np.random.default_rng(2)
    blob, _, _ = _make_tdnn_onnx(rng)
    with open(f"{d}/campplus.onnx", "wb") as f:
        f.write(blob)
    tok = Qwen3TTSTokenizer.from_pretrained(d)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    out = tok.encode([wav], 16000)
    xv = out["xvectors"][0]
    assert xv.shape == (8,)
    assert abs(np.linalg.norm(xv) - 1.0) < 1e-5


def test_v1_encode_accepts_paths_and_base64(tmp_path):
    """Reference input parity (qwen3_tts_tokenizer.py:122-207): encode takes
    wav paths / base64 strings / (ndarray, sr) and resamples to the model
    input rate; load_audio is public."""
    import base64

    from qwen_tts_tpu.io.wav import write_wav
    from test_whisper_vq import TINY as TINY_ENC

    d = str(tmp_path / "v1p")
    make_v1_checkpoint(d, TINY_V1, enc_cfg=TINY_ENC)
    tok = Qwen3TTSTokenizer.from_pretrained(d)

    wav = (0.2 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    ref = tok.encode([wav], 16000)["audio_codes"][0]

    p = str(tmp_path / "ref.wav")
    write_wav(p, wav, 16000)
    rt = tok.load_audio(p, target_sr=16000)  # int16 roundtrip quantization
    want = tok.encode([rt], 16000)["audio_codes"][0]

    got_path = tok.encode(p)["audio_codes"][0]
    np.testing.assert_array_equal(got_path, want)

    b64 = base64.b64encode(open(p, "rb").read()).decode()
    got_b64 = tok.encode(b64)["audio_codes"][0]
    np.testing.assert_array_equal(got_b64, want)

    # quantization must not perturb the tiny fixture's codes
    np.testing.assert_array_equal(ref, want)

    # 48k path input resamples down to the 16k model rate
    wav48 = np.repeat(wav, 3)
    p48 = str(tmp_path / "ref48.wav")
    write_wav(p48, wav48, 48000)
    got_48 = tok.encode(p48)["audio_codes"][0]
    assert got_48.shape == want.shape

    with pytest.raises(ValueError):
        tok.encode(wav)  # bare ndarray without sample_rate
