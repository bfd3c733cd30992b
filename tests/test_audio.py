"""Audio input plumbing: polyphase resampler quality + input-form
normalization (path / base64 / (np, sr)) through the voice-clone prompt
path (reference: inference/qwen3_tts_model.py:188-264, 440-444)."""

import base64
import io
import wave

import numpy as np
import jax.numpy as jnp
import pytest

from qwen_tts_tpu.audio import normalize_audio_inputs, resample
from ckpt_fixture import make_checkpoint


def _tone(freq, sr, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_resample_preserves_passband_tone():
    sr_in, sr_out, f = 16000, 24000, 1000.0
    x = _tone(f, sr_in)
    y = resample(x, sr_in, sr_out)
    assert y.shape[0] == int(np.ceil(x.shape[0] * sr_out / sr_in))
    want = _tone(f, sr_out)[: y.shape[0]]
    # Trim filter edges, compare against the ideal tone.
    s = slice(200, -200)
    corr = np.dot(y[s], want[s]) / (
        np.linalg.norm(y[s]) * np.linalg.norm(want[s])
    )
    assert corr > 0.9999


def test_resample_rejects_aliases_on_downsample():
    """A 10 kHz tone downsampled 24k→16k lies above the new Nyquist (8 kHz)
    and must be suppressed, not folded to 6 kHz (what linear interpolation
    does)."""
    sr_in, sr_out = 24000, 16000
    x = _tone(10000.0, sr_in)
    y = resample(x, sr_in, sr_out)
    rms_in = np.sqrt(np.mean(x**2))
    rms_out = np.sqrt(np.mean(y[200:-200] ** 2))
    assert rms_out < 0.01 * rms_in, f"alias energy leaked: {rms_out/rms_in:.3f}"


def test_resample_identity():
    x = _tone(440.0, 24000)
    np.testing.assert_array_equal(resample(x, 24000, 24000), x)


def _wav_bytes(x, sr):
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_normalize_audio_inputs_forms(tmp_path):
    x = _tone(440.0, 16000, 0.1)
    path = tmp_path / "ref.wav"
    path.write_bytes(_wav_bytes(x, 16000))
    b64 = "data:audio/wav;base64," + base64.b64encode(
        _wav_bytes(x, 16000)
    ).decode()

    out = normalize_audio_inputs([str(path), b64, (x, 16000)])
    assert len(out) == 3
    for wav, sr in out:
        assert sr == 16000
        assert wav.dtype == np.float32
        # PCM16 round-trip tolerance for the file/base64 forms.
        assert wav.shape == x.shape
        np.testing.assert_allclose(wav, x, atol=2e-4)

    with pytest.raises(ValueError):
        normalize_audio_inputs(x)  # bare ndarray needs (audio, sr)


def test_voice_clone_prompt_from_16k_wav_path(tmp_path):
    """A 16 kHz WAV file path produces the same codes/x-vector as passing the
    equivalent waveform directly — the full path→load→sinc-resample→encode
    plumbing (reference: qwen3_tts_model.py:355-458)."""
    from qwen_tts_tpu.pipeline import Qwen3TTSModel

    d = tmp_path / "ckpt"
    make_checkpoint(str(d), with_encoders=True)
    model = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(16000 // 2)).astype(np.float32)
    path = tmp_path / "ref16k.wav"
    path.write_bytes(_wav_bytes(x, 16000))

    via_path = model.create_voice_clone_prompt(str(path), ref_text="hello")
    via_tuple = model.create_voice_clone_prompt((x, 16000), ref_text="hello")

    np.testing.assert_array_equal(
        via_path["ref_code"][0], via_tuple["ref_code"][0]
    )
    # x-vector matches to PCM16-quantization noise.
    np.testing.assert_allclose(
        via_path["ref_spk_embedding"][0], via_tuple["ref_spk_embedding"][0],
        atol=1e-2, rtol=1e-2,
    )
    assert via_path["icl_mode"] == [True]
