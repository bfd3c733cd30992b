"""25 Hz Whisper-VQ encoder vs torch oracles."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from qwen_tts_tpu.models import whisper_vq as wvq

RNG = np.random.default_rng(0)

TINY = wvq.WhisperVQConfig(
    n_mels=16,
    n_ctx=64,
    n_state=32,
    n_head=4,
    n_layer=4,
    n_window=8,
    audio_vq_layers=2,
    audio_vq_codebook_size=32,
    audio_vq_codebook_dim=12,
    audio_vq_ds_rate=2,
)


def test_log_mel_matches_torch_stft():
    wav = (0.3 * np.sin(np.linspace(0, 500, 16000))).astype(np.float32)
    got = wvq.whisper_log_mel(wav, n_mels=16, padding=160)

    audio = F.pad(torch.from_numpy(wav), (0, 160))
    window = torch.hann_window(wvq.N_FFT)
    stft = torch.stft(audio, wvq.N_FFT, wvq.HOP, window=window,
                      return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    mel = torch.from_numpy(
        wvq.mel_filterbank(16000, wvq.N_FFT, 16, 0, 8000)
    )
    mel_spec = mel @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    want = (log_spec + 4.0) / 4.0
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(got, want.numpy(), atol=2e-4)


def test_conv_stem_matches_torch():
    params = wvq.init_whisper_vq(jax.random.PRNGKey(0), TINY)
    mel = RNG.standard_normal((2, 16, TINY.n_mels)).astype(np.float32)
    got = wvq._conv_stem(params, jnp.asarray(mel))
    assert got.shape == (2, 8, TINY.n_state)

    x = torch.from_numpy(mel).permute(0, 2, 1)
    w1 = torch.from_numpy(np.asarray(params["conv1_w"])).permute(2, 1, 0)
    w2 = torch.from_numpy(np.asarray(params["conv2_w"])).permute(2, 1, 0)
    h = F.gelu(F.conv1d(x, w1, torch.from_numpy(np.asarray(params["conv1_b"])),
                        padding=1))
    h = F.gelu(F.conv1d(h, w2, torch.from_numpy(np.asarray(params["conv2_b"])),
                        stride=2, padding=1))
    np.testing.assert_allclose(np.asarray(got), h.permute(0, 2, 1).numpy(),
                               atol=1e-4)


def test_trunk_matches_torch():
    params = wvq.init_whisper_vq(jax.random.PRNGKey(1), TINY)
    x = RNG.standard_normal((3, TINY.n_window, TINY.n_state)).astype(np.float32)
    mask = np.ones((3, TINY.n_window), bool)
    mask[2, 5:] = False
    got = wvq.encoder_trunk(params, TINY, jnp.asarray(x), jnp.asarray(mask))

    xt = torch.from_numpy(x)
    for layer in params["layers"][: TINY.audio_vq_layers]:
        t = lambda k: torch.from_numpy(np.asarray(layer[k]))  # noqa: E731
        h = F.layer_norm(xt, (TINY.n_state,), t("attn_ln_w"), t("attn_ln_b"))
        b, s, d = h.shape
        hd = d // TINY.n_head
        q = (h @ t("wq") + t("bq")).view(b, s, TINY.n_head, hd)
        k = (h @ t("wk")).view(b, s, TINY.n_head, hd)
        v = (h @ t("wv") + t("bv")).view(b, s, TINY.n_head, hd)
        scores = torch.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(hd)
        m = torch.from_numpy(mask)[:, None, None, :]
        scores = scores.masked_fill(~m, -1e9)
        attn = torch.einsum("bhij,bjhd->bihd", scores.softmax(-1), v)
        xt = xt + attn.reshape(b, s, d) @ t("wo") + t("bo")
        h = F.layer_norm(xt, (TINY.n_state,), t("mlp_ln_w"), t("mlp_ln_b"))
        xt = xt + (F.gelu(h @ t("mlp1_w") + t("mlp1_b")) @ t("mlp2_w")
                   + t("mlp2_b"))
    # Padded positions diverge (they attend to nothing real) — compare valid.
    np.testing.assert_allclose(np.asarray(got[:2]), xt[:2].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[2, :5]), xt[2, :5].numpy(),
                               atol=2e-4)


def test_vq_encode_nearest_neighbour():
    params = wvq.init_whisper_vq(jax.random.PRNGKey(2), TINY)
    # Feed codebook rows through the inverse projection? Simpler: verify the
    # argmin against an explicit distance computation.
    x = RNG.standard_normal((10, TINY.n_state)).astype(np.float32)
    got = wvq.vq_encode(params, TINY, jnp.asarray(x))
    proj = x @ np.asarray(params["vq_proj_in_w"]) + np.asarray(params["vq_proj_in_b"])
    embed = np.asarray(params["vq_embed"])
    dist = ((proj[:, None] - embed[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(got), dist.argmin(-1))


def test_encode_waveforms_end_to_end():
    params = wvq.init_whisper_vq(jax.random.PRNGKey(3), TINY)
    wavs = [
        (0.2 * np.sin(np.linspace(0, 80, 16000))).astype(np.float32),
        (0.2 * np.sin(np.linspace(0, 40, 9000))).astype(np.float32),
    ]
    codes = wvq.encode_waveforms(params, TINY, wavs)
    # Frame math: audio padded to a multiple of 160*2*ds → mel frames multiple
    # of 2*ds → codes = ceil(L / 640).
    for wav, c in zip(wavs, codes):
        assert c.shape[0] == math.ceil(len(wav) / (wvq.HOP * 2 * TINY.audio_vq_ds_rate))
        assert (c >= 0).all() and (c < TINY.audio_vq_codebook_size).all()
