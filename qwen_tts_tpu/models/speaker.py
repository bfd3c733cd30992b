"""ECAPA-TDNN speaker encoder + mel-spectrogram frontend (Base models).

Produces the 1024-d x-vector that Base checkpoints inject as a codec-embedding
slot in the prefix (modeling_qwen3_tts.py:95-393, 1940-1954, 2166-2172).

Architecture (faithful to the reference):
  initial TDNN (conv k=5 + ReLU) → 3 × SE-Res2Net blocks (1x1 TDNN →
  Res2Net scale-8 with k=3 dilated convs → 1x1 TDNN → squeeze-excitation,
  residual) → multi-layer feature aggregation over the 3 block outputs →
  attentive statistics pooling (mean‖std with learned attention) → 1x1 conv
  to enc_dim.

All convs use "same" padding with **reflect** mode (the reference's
padding_mode="reflect"). The mel frontend matches mel_spectrogram
(modeling_qwen3_tts.py:399-464): slaney-norm mel filterbank, periodic Hann
window, center=False with a (n_fft-hop)//2 reflect pre-pad, magnitude
sqrt(|S|² + 1e-9), log-compression with 1e-5 clamp.

Channels-last layout ([B, T, C]) throughout, like the codec.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import SpeakerEncoderConfig


# --------------------------------------------------------------------------
# Mel frontend
# --------------------------------------------------------------------------

def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f < min_log_hz, f / f_sp,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m < min_log_mel, m * f_sp,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)))


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank
    (librosa.filters.mel equivalent). Returns [n_mels, n_fft//2 + 1]."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_spectrogram(
    wav: jnp.ndarray,  # [B, L] in [-1, 1]
    *,
    n_fft: int = 1024,
    num_mels: int = 128,
    sampling_rate: int = 24000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 12000.0,
) -> jnp.ndarray:
    """Returns [B, T_frames, num_mels] log-mel (channels-last)."""
    mel = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    pad = (n_fft - hop_size) // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (wav.shape[1] - n_fft) // hop_size
    idx = (jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(n_fft)[None, :])
    frames = wav[:, idx]  # [B, T, n_fft]
    # Periodic Hann (torch.hann_window default).
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    melspec = mag @ mel.T  # [B, T, n_mels]
    return jnp.log(jnp.clip(melspec, 1e-5, None))


# --------------------------------------------------------------------------
# ECAPA-TDNN
# --------------------------------------------------------------------------

def _same_reflect_conv(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, dilation: int = 1
) -> jnp.ndarray:
    """Conv1d with torch padding="same", padding_mode="reflect".
    x: [B, T, Cin]; w: [K, Cin, Cout]."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    left = (k_eff - 1) // 2
    right = k_eff - 1 - left
    if left or right:
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _tdnn(p: dict, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    return jax.nn.relu(_same_reflect_conv(x, p["w"], p["b"], dilation))


def _res2net(blocks: List[dict], x: jnp.ndarray, scale: int, dilation: int) -> jnp.ndarray:
    parts = jnp.split(x, scale, axis=-1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if i == 1 else parts[i] + prev
        prev = _tdnn(blocks[i - 1], inp, dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def _se_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(s @ p["w1"] + p["b1"])
    s = jax.nn.sigmoid(s @ p["w2"] + p["b2"])
    return x * s


def _asp(p: dict, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Attentive statistics pooling. x: [B, T, C] → [B, 2C]."""
    t = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(jnp.mean((x - mean) ** 2, axis=1, keepdims=True), eps))
    attn_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    a = _tdnn(p["tdnn"], attn_in)
    a = jnp.tanh(a)
    a = _same_reflect_conv(a, p["conv_w"], p["conv_b"])
    a = jax.nn.softmax(a, axis=1)
    mean = jnp.sum(a * x, axis=1)
    std = jnp.sqrt(jnp.clip(jnp.sum(a * (x - mean[:, None]) ** 2, axis=1), eps))
    return jnp.concatenate([mean, std], axis=-1)


def speaker_encoder_forward(
    params: dict, cfg: SpeakerEncoderConfig, mels: jnp.ndarray
) -> jnp.ndarray:
    """mels: [B, T, mel_dim] → x-vector [B, enc_dim]."""
    h = _tdnn(params["blocks"][0], mels, cfg.enc_dilations[0])
    feats = []
    for i, blk in enumerate(params["blocks"][1:], start=1):
        residual = h
        h = _tdnn(blk["tdnn1"], h)
        h = _res2net(blk["res2net"], h, cfg.enc_res2net_scale, cfg.enc_dilations[i])
        h = _tdnn(blk["tdnn2"], h)
        h = _se_block(blk["se"], h)
        h = h + residual
        feats.append(h)
    h = jnp.concatenate(feats, axis=-1)
    h = _tdnn(params["mfa"], h, cfg.enc_dilations[-1])
    h = _asp(params["asp"], h)
    return h @ params["fc_w"] + params["fc_b"]


# --------------------------------------------------------------------------
# Init / loading
# --------------------------------------------------------------------------

def init_speaker_params(rng: jax.Array, cfg: SpeakerEncoderConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))

    def w(shape):
        fan = np.prod(shape[:-1])
        return (jax.random.normal(next(keys), shape, jnp.float32) / np.sqrt(fan)).astype(dtype)

    def tdnn(cin, cout, k):
        return {"w": w((k, cin, cout)), "b": jnp.zeros((cout,), dtype)}

    ch, ks = cfg.enc_channels, cfg.enc_kernel_sizes
    blocks: List[dict] = [tdnn(cfg.mel_dim, ch[0], ks[0])]
    for i in range(1, len(ch) - 1):
        scale = cfg.enc_res2net_scale
        blocks.append({
            "tdnn1": tdnn(ch[i - 1], ch[i], 1),
            "res2net": [tdnn(ch[i] // scale, ch[i] // scale, ks[i])
                        for _ in range(scale - 1)],
            "tdnn2": tdnn(ch[i], ch[i], 1),
            "se": {
                "w1": w((ch[i], cfg.enc_se_channels)),
                "b1": jnp.zeros((cfg.enc_se_channels,), dtype),
                "w2": w((cfg.enc_se_channels, ch[i])),
                "b2": jnp.zeros((ch[i],), dtype),
            },
        })
    asp = {
        "tdnn": tdnn(ch[-1] * 3, cfg.enc_attention_channels, 1),
        "conv_w": w((1, cfg.enc_attention_channels, ch[-1])),
        "conv_b": jnp.zeros((ch[-1],), dtype),
    }
    return {
        "blocks": blocks,
        "mfa": tdnn(sum(ch[1:-1]), ch[-1], ks[-1]),
        "asp": asp,
        "fc_w": w((ch[-1] * 2, cfg.enc_dim)),
        "fc_b": jnp.zeros((cfg.enc_dim,), dtype),
    }


def load_speaker_encoder(st, cfg: SpeakerEncoderConfig, dtype=jnp.float32,
                         prefix: str = "speaker_encoder.") -> dict:
    """Load ECAPA-TDNN weights. Used for the Base-model speaker encoder
    (prefix ``speaker_encoder.``, modeling_qwen3_tts.py:1822-1825) and the
    25 Hz DiT's reference-mel encoder (prefix
    ``decoder.dit.input_embed.spk_encoder.`` — same module structure)."""
    import numpy as np

    def conv(name):
        wt = np.asarray(st.get_f32(name + ".weight"))  # [out, in, k]
        return {
            "w": jnp.asarray(np.ascontiguousarray(wt.transpose(2, 1, 0)), dtype),
            "b": jnp.asarray(st.get_f32(name + ".bias"), dtype),
        }

    def lin_from_conv1(name):
        wt = np.asarray(st.get_f32(name + ".weight"))[:, :, 0]  # [out, in]
        return (
            jnp.asarray(np.ascontiguousarray(wt.T), dtype),
            jnp.asarray(st.get_f32(name + ".bias"), dtype),
        )

    p = prefix
    ch = cfg.enc_channels
    blocks: List[dict] = [conv(p + "blocks.0.conv")]
    for i in range(1, len(ch) - 1):
        b = f"{p}blocks.{i}."
        se1_w, se1_b = lin_from_conv1(b + "se_block.conv1")
        se2_w, se2_b = lin_from_conv1(b + "se_block.conv2")
        blocks.append({
            "tdnn1": conv(b + "tdnn1.conv"),
            "res2net": [conv(f"{b}res2net_block.blocks.{j}.conv")
                        for j in range(cfg.enc_res2net_scale - 1)],
            "tdnn2": conv(b + "tdnn2.conv"),
            "se": {"w1": se1_w, "b1": se1_b, "w2": se2_w, "b2": se2_b},
        })
    fc_w, fc_b = lin_from_conv1(p + "fc")
    asp_conv_w = conv(p + "asp.conv")
    return {
        "blocks": blocks,
        "mfa": conv(p + "mfa.conv"),
        "asp": {
            "tdnn": conv(p + "asp.tdnn.conv"),
            "conv_w": asp_conv_w["w"],
            "conv_b": asp_conv_w["b"],
        },
        "fc_w": fc_w,
        "fc_b": fc_b,
    }
