"""ECAPA-TDNN speaker encoder + mel frontend vs torch oracles."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from qwen_tts_tpu.config import SpeakerEncoderConfig
from qwen_tts_tpu.models import speaker as spk

RNG = np.random.default_rng(0)

TINY = SpeakerEncoderConfig(
    mel_dim=16,
    enc_dim=32,
    enc_channels=(32, 32, 32, 32, 96),
    enc_kernel_sizes=(5, 3, 3, 3, 1),
    enc_dilations=(1, 2, 3, 4, 1),
    enc_attention_channels=16,
    enc_res2net_scale=4,
    enc_se_channels=16,
)


def _torch_same_reflect_conv(x, w, b, dilation=1):
    """x: [B,T,C]; w: [K,Cin,Cout] JAX layout → torch conv with same/reflect."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    left = (k_eff - 1) // 2
    right = k_eff - 1 - left
    xt = torch.from_numpy(np.asarray(x)).permute(0, 2, 1)
    if left or right:
        xt = F.pad(xt, (left, right), mode="reflect")
    wt = torch.from_numpy(np.asarray(w)).permute(2, 1, 0)
    out = F.conv1d(xt, wt, torch.from_numpy(np.asarray(b)), dilation=dilation)
    return out.permute(0, 2, 1)


def test_same_reflect_conv_matches_torch():
    x = RNG.standard_normal((2, 20, 8)).astype(np.float32)
    w = RNG.standard_normal((3, 8, 12)).astype(np.float32)
    b = RNG.standard_normal(12).astype(np.float32)
    for dilation in (1, 2, 3):
        got = spk._same_reflect_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                     dilation)
        want = _torch_same_reflect_conv(x, w, b, dilation)
        assert got.shape == tuple(want.shape)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_mel_spectrogram_matches_torch_stft():
    """The STFT/magnitude/log part vs torch.stft (the reference's exact
    transform, modeling_qwen3_tts.py:442-462); the mel filterbank itself is
    checked structurally below (librosa isn't in this image)."""
    n_fft, hop, win = 64, 16, 64
    wav = (0.4 * np.sin(np.linspace(0, 300, 2000))).astype(np.float32)[None]

    mel_fb = spk.mel_filterbank(24000, n_fft, 8, 0, 12000)
    got = spk.mel_spectrogram(
        jnp.asarray(wav), n_fft=n_fft, num_mels=8, sampling_rate=24000,
        hop_size=hop, win_size=win, fmin=0, fmax=12000,
    )

    y = torch.from_numpy(wav)
    pad = (n_fft - hop) // 2
    y = F.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, return_complex=True,
    )
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    want = torch.log(torch.clamp(torch.from_numpy(mel_fb) @ mag, min=1e-5))
    want = want.permute(0, 2, 1)  # [B, T, M] channels-last
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_mel_filterbank_structure():
    fb = spk.mel_filterbank(24000, 1024, 128, 0, 12000)
    assert fb.shape == (128, 513)
    assert (fb >= 0).all()
    # Each filter is a normalized triangle: single peak, nonzero support.
    assert (fb.max(axis=1) > 0).all()
    # Slaney normalization: filters get narrower bandwidth → larger peak at
    # low frequencies.
    assert fb[0].max() > fb[-1].max()


def test_speaker_encoder_matches_torch_oracle():
    cfg = TINY
    params = spk.init_speaker_params(jax.random.PRNGKey(0), cfg)
    mels = RNG.standard_normal((2, 30, cfg.mel_dim)).astype(np.float32)
    got = spk.speaker_encoder_forward(params, cfg, jnp.asarray(mels))
    assert got.shape == (2, cfg.enc_dim)

    # Torch oracle, same parameters.
    def np_(x):
        return np.asarray(x)

    def tdnn(p, x, dilation=1):
        return F.relu(_torch_same_reflect_conv(np_(x), np_(p["w"]), np_(p["b"]),
                                               dilation))

    h = tdnn(params["blocks"][0], mels, cfg.enc_dilations[0])
    feats = []
    for i, blk in enumerate(params["blocks"][1:], start=1):
        residual = h
        h = tdnn(blk["tdnn1"], h)
        parts = torch.chunk(h, cfg.enc_res2net_scale, dim=-1)
        outs = [parts[0]]
        prev = None
        for j in range(1, cfg.enc_res2net_scale):
            inp = parts[j] if j == 1 else parts[j] + prev
            prev = tdnn(blk["res2net"][j - 1], inp, cfg.enc_dilations[i])
            outs.append(prev)
        h = torch.cat(outs, dim=-1)
        h = tdnn(blk["tdnn2"], h)
        s = h.mean(dim=1, keepdim=True)
        s = F.relu(s @ torch.from_numpy(np_(blk["se"]["w1"])) +
                   torch.from_numpy(np_(blk["se"]["b1"])))
        s = torch.sigmoid(s @ torch.from_numpy(np_(blk["se"]["w2"])) +
                          torch.from_numpy(np_(blk["se"]["b2"])))
        h = h * s + residual
        feats.append(h)
    h = torch.cat(feats, dim=-1)
    h = tdnn(params["mfa"], h, cfg.enc_dilations[-1])

    eps = 1e-12
    mean = h.mean(dim=1, keepdim=True)
    std = torch.sqrt(((h - mean) ** 2).mean(dim=1, keepdim=True).clamp(eps))
    attn_in = torch.cat([h, mean.expand_as(h), std.expand_as(h)], dim=-1)
    a = tdnn(params["asp"]["tdnn"], attn_in)
    a = torch.tanh(a)
    a = _torch_same_reflect_conv(np_(a), np_(params["asp"]["conv_w"]),
                                 np_(params["asp"]["conv_b"]))
    a = a.softmax(dim=1)
    mean = (a * h).sum(dim=1)
    std = torch.sqrt((a * (h - mean.unsqueeze(1)) ** 2).sum(dim=1).clamp(eps))
    pooled = torch.cat([mean, std], dim=-1)
    want = pooled @ torch.from_numpy(np_(params["fc_w"])) + torch.from_numpy(
        np_(params["fc_b"])
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
