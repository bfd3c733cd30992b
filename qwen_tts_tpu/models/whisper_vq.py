"""25 Hz Whisper-VQ encoder (encode-only): 16 kHz waveform → codec indices.

Reference: qwen_tts/core/tokenizer_25hz/vq/{whisper_encoder,speech_vq,core_vq}.py —
a Whisper-style encoder (conv stem ×2 with stride-2, sinusoid positional
embeddings, pre-LN transformer with **window-local bidirectional attention**,
window = n_window tokens) truncated at ``audio_vq_layers``, followed by a
stride-``ds`` downsampling conv and a single-group, single-quantizer EMA
vector quantizer (GRVQ 1×1): nearest-neighbour against
``embed = embed_avg-tracked codebook`` after an optional input projection.

JAX design: utterances are processed as a batch of fixed-size windows (the
reference's ``cu_seqlens`` block-diagonal attention is exactly
window-independent attention, so windows ride the batch axis on the MXU);
the tail window is right-padded and masked.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.models.speaker import mel_filterbank

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000


@dataclasses.dataclass(frozen=True)
class WhisperVQConfig:
    """Reference: configuration_qwen3_tts_tokenizer_v1.py encoder config."""

    n_mels: int = 128
    n_ctx: int = 1500
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 32
    n_window: int = 100
    output_dim: int = 3584
    audio_vq_layers: int = 16
    audio_vq_codebook_size: int = 4096
    audio_vq_codebook_dim: int = 512
    audio_vq_ds_rate: int = 2


def whisper_log_mel(audio: np.ndarray, n_mels: int = 128, padding: int = 0
                    ) -> np.ndarray:
    """Whisper log-mel (vq/whisper_encoder.py:62-107): centered STFT
    (reflect pad), power spectrum with the last frame dropped, slaney mel,
    log10 with max−8 floor, (x+4)/4. Returns [n_mels, T]. Host-side numpy
    (cold path)."""
    audio = np.asarray(audio, np.float32)
    if padding > 0:
        audio = np.pad(audio, (0, padding))
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)  # periodic hann
    spec = np.fft.rfft(x[idx] * window, axis=-1)
    magnitudes = (np.abs(spec[:-1]) ** 2).T  # drop last frame → [freq, T]
    mel = mel_filterbank(SAMPLE_RATE, N_FFT, n_mels, 0, SAMPLE_RATE / 2)
    mel_spec = mel @ magnitudes
    log_spec = np.log10(np.clip(mel_spec, 1e-10, None))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv_stem(params: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: [B, T, n_mels] (per window chunk) → [B, T//2, n_state].
    conv1 k3 s1 p1 + gelu; conv2 k3 s2 p1 + gelu (symmetric padding)."""
    h = jax.lax.conv_general_dilated(
        mel, params["conv1_w"], (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + params["conv1_b"]
    h = _gelu(h.astype(mel.dtype))
    h = jax.lax.conv_general_dilated(
        h, params["conv2_w"], (2,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + params["conv2_b"]
    return _gelu(h.astype(mel.dtype))


def _layer_norm(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _mha(layer: dict, x: jnp.ndarray, mask: jnp.ndarray, n_head: int):
    """Bidirectional MHA over windows (batch axis); key proj has no bias
    (Whisper convention). mask: [B, T] True = real."""
    b, t_len, d = x.shape
    hd = d // n_head
    q = (x @ layer["wq"] + layer["bq"]).reshape(b, t_len, n_head, hd)
    k = (x @ layer["wk"]).reshape(b, t_len, n_head, hd)
    v = (x @ layer["wv"] + layer["bv"]).reshape(b, t_len, n_head, hd)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(b, t_len, d) @ layer["wo"] + layer["bo"]


def encoder_trunk(params: dict, cfg: WhisperVQConfig, windows: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """windows: [B, W, n_state] post-stem-and-PE; runs layers 1..vq_layer."""
    x = windows
    for layer in params["layers"][: cfg.audio_vq_layers]:
        h = _layer_norm(x, layer["attn_ln_w"], layer["attn_ln_b"])
        x = x + _mha(layer, h, mask, cfg.n_head)
        h = _layer_norm(x, layer["mlp_ln_w"], layer["mlp_ln_b"])
        h = _gelu(h @ layer["mlp1_w"] + layer["mlp1_b"])
        x = x + (h @ layer["mlp2_w"] + layer["mlp2_b"])
    return x


def vq_encode(params: dict, cfg: WhisperVQConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, n_state] (downsampled features) → indices [N].
    Nearest neighbour after optional project_in (core_vq.py:186-210)."""
    if "vq_proj_in_w" in params:
        x = x @ params["vq_proj_in_w"] + params["vq_proj_in_b"]
    embed = params["vq_embed"]  # [size, cbdim]
    dist = (
        jnp.sum(x * x, -1, keepdims=True)
        - 2.0 * x @ embed.T
        + jnp.sum(embed * embed, -1)[None, :]
    )
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def _encode_windows(params: dict, cfg: WhisperVQConfig,
                    windows: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Jitted half: [C, 2W_mel, n_mels] chunk windows → [C, W, n_state]."""
    h = _conv_stem(params, windows)
    pe = params["positional_embedding"][: h.shape[1]]
    return encoder_trunk(params, cfg, h + pe[None], mask)


def _ds_vq(params: dict, cfg: WhisperVQConfig, feats: jnp.ndarray
           ) -> jnp.ndarray:
    """Jitted half: packed valid features [T, n_state] → codes."""
    ds = cfg.audio_vq_ds_rate
    if "ds_w" in params and ds > 1:
        x = jax.lax.conv_general_dilated(
            feats[None], params["ds_w"], (ds,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )[0] + params["ds_b"]
    else:
        x = feats
    return vq_encode(params, cfg, x.astype(jnp.float32))


_ENCODE_WINDOWS_JIT = None
_DS_VQ_JIT = None


def _jits():
    global _ENCODE_WINDOWS_JIT, _DS_VQ_JIT
    if _ENCODE_WINDOWS_JIT is None:
        _ENCODE_WINDOWS_JIT = jax.jit(_encode_windows,
                                      static_argnames=("cfg",))
        _DS_VQ_JIT = jax.jit(_ds_vq, static_argnames=("cfg",))
    return _ENCODE_WINDOWS_JIT, _DS_VQ_JIT


def encode_waveforms(
    params: dict, cfg: WhisperVQConfig, wavs: Sequence[np.ndarray]
) -> List[np.ndarray]:
    """Each 16 kHz waveform → its code sequence [T_codes] (int32).

    TWO compiled programs total instead of per-op eager dispatch (the 32×
    1280 trunk is ~500 ops — at the tunnel's ~25 ms/dispatch the eager form
    measured 7.2 s for 8×10 s wavs; the host mel is only 11 ms/wav): every
    wav's chunk windows ride ONE batched trunk call (chunk count bucketed
    to 4, pad chunks mask to all-False — batch elements are independent,
    outputs discarded), then each wav's packed features take a bucketed
    ds-conv+VQ call (kernel == stride, so right zero-pad only creates
    trailing codes past the true length, which are trimmed)."""
    w_mel = cfg.n_window * 2
    per_wav = []
    all_windows, all_lens = [], []
    for wav in wavs:
        reduction = HOP * 2 * cfg.audio_vq_ds_rate
        pad = math.ceil(len(wav) / reduction) * reduction - len(wav)
        mel = whisper_log_mel(wav, cfg.n_mels, padding=pad).T  # [T, n_mels]
        t_mel = mel.shape[0]
        n_chunks = math.ceil(t_mel / w_mel)
        padded = np.zeros((n_chunks, w_mel, cfg.n_mels), np.float32)
        for c in range(n_chunks):
            seg = mel[c * w_mel : (c + 1) * w_mel]
            padded[c, : seg.shape[0]] = seg
        chunk_lens = [min(w_mel, t_mel - c * w_mel) // 2
                      for c in range(n_chunks)]
        all_windows.append(padded)
        all_lens.extend(chunk_lens)
        per_wav.append((n_chunks, chunk_lens))

    windows = np.concatenate(all_windows, axis=0)
    c_tot = windows.shape[0]
    c_pad = -(-c_tot // 4) * 4
    if c_pad > c_tot:
        windows = np.pad(windows, ((0, c_pad - c_tot), (0, 0), (0, 0)))
        all_lens.extend([0] * (c_pad - c_tot))
    mask = (np.arange(cfg.n_window)[None, :]
            < np.asarray(all_lens)[:, None])
    enc_jit, dsvq_jit = _jits()
    h = np.asarray(enc_jit(params, cfg, jnp.asarray(windows),
                           jnp.asarray(mask)))  # ONE batched fetch

    ds = cfg.audio_vq_ds_rate
    has_ds = "ds_w" in params and ds > 1
    results = []
    offset = 0
    for n_chunks, chunk_lens in per_wav:
        feats = np.concatenate(
            [h[offset + c, : chunk_lens[c]] for c in range(n_chunks)], axis=0
        )
        offset += n_chunks
        t = feats.shape[0]
        n_out = t // ds if has_ds else t
        bucket = max(ds, 1) * 128
        t_b = -(-t // bucket) * bucket
        if t_b > t:
            feats = np.pad(feats, ((0, t_b - t), (0, 0)))
        codes = np.asarray(dsvq_jit(params, cfg, jnp.asarray(feats)))
        results.append(codes[:n_out].astype(np.int32))
    return results


def v1_ref_mel(audio_16k: np.ndarray) -> np.ndarray:
    """BigVGAN-style reference mel for the DiT conditioning
    (vq/speech_vq.py MelSpectrogramFeatures: n_fft 1024, hop 160, win 640,
    80 slaney mels fmax 8000, reflect pre-pad (n_fft−hop)/2, center=False,
    magnitude sqrt(|S|²+1e-9), log-clamp 1e-5). Returns [T, 80]."""
    n_fft, hop, win, n_mels = 1024, 160, 640, 80
    audio = np.asarray(audio_16k, np.float32)
    pad = (n_fft - hop) // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    # torch.stft zero-pads a short window symmetrically to n_fft.
    window = np.zeros(n_fft, np.float32)
    start = (n_fft - win) // 2
    window[start : start + win] = np.hanning(win + 1)[:-1]
    spec = np.fft.rfft(x[idx] * window, axis=-1)
    mag = np.sqrt(np.real(spec) ** 2 + np.imag(spec) ** 2 + 1e-9).T
    mel = mel_filterbank(SAMPLE_RATE, n_fft, n_mels, 0, 8000)
    mel_spec = mel @ mag
    return np.log(np.clip(mel_spec, 1e-5, None)).T.astype(np.float32)


# --------------------------------------------------------------------------
# Loading / init
# --------------------------------------------------------------------------

def load_whisper_vq(st, cfg: WhisperVQConfig, dtype=jnp.float32,
                    prefix: str = "encoder.tokenizer.") -> dict:
    def lin(name):
        return jnp.asarray(np.ascontiguousarray(st.get_f32(name).T), dtype)

    def vec(name):
        return jnp.asarray(st.get_f32(name), dtype)

    def conv(name):
        return jnp.asarray(
            np.ascontiguousarray(st.get_f32(name).transpose(2, 1, 0)), dtype
        )

    p = prefix
    layers = []
    for i in range(cfg.audio_vq_layers):
        b = f"{p}blocks.{i}."
        layers.append({
            "attn_ln_w": vec(b + "attn_ln.weight"),
            "attn_ln_b": vec(b + "attn_ln.bias"),
            "wq": lin(b + "attn.query.weight"), "bq": vec(b + "attn.query.bias"),
            "wk": lin(b + "attn.key.weight"),
            "wv": lin(b + "attn.value.weight"), "bv": vec(b + "attn.value.bias"),
            "wo": lin(b + "attn.out.weight"), "bo": vec(b + "attn.out.bias"),
            "mlp_ln_w": vec(b + "mlp_ln.weight"),
            "mlp_ln_b": vec(b + "mlp_ln.bias"),
            "mlp1_w": lin(b + "mlp.0.weight"), "mlp1_b": vec(b + "mlp.0.bias"),
            "mlp2_w": lin(b + "mlp.2.weight"), "mlp2_b": vec(b + "mlp.2.bias"),
        })
    params = {
        "conv1_w": conv(p + "conv1.weight"),
        "conv1_b": vec(p + "conv1.bias"),
        "conv2_w": conv(p + "conv2.weight"),
        "conv2_b": vec(p + "conv2.bias"),
        "positional_embedding": vec(p + "positional_embedding"),
        "layers": layers,
        # GRVQ 1×1: stacked buffers on the RVQ module (core_vq.py encode path).
        "vq_embed": jnp.asarray(
            st.get_f32(p + "audio_quantizer.rvqs.0.embed")[0], dtype
        ),
    }
    if (p + "audio_vq_downsample.weight") in st:
        params["ds_w"] = conv(p + "audio_vq_downsample.weight")
        params["ds_b"] = vec(p + "audio_vq_downsample.bias")
    if (p + "audio_quantizer.rvqs.0.layers.0.project_in.weight") in st:
        params["vq_proj_in_w"] = lin(
            p + "audio_quantizer.rvqs.0.layers.0.project_in.weight"
        )
        params["vq_proj_in_b"] = vec(
            p + "audio_quantizer.rvqs.0.layers.0.project_in.bias"
        )
    return params


def init_whisper_vq(rng: jax.Array, cfg: WhisperVQConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.audio_vq_layers))

    def w(shape, fan):
        return (jax.random.normal(next(keys), shape, jnp.float32) / np.sqrt(fan)).astype(dtype)

    d = cfg.n_state
    layers = []
    for _ in range(cfg.audio_vq_layers):
        layers.append({
            "attn_ln_w": jnp.ones((d,), dtype), "attn_ln_b": jnp.zeros((d,), dtype),
            "wq": w((d, d), d), "bq": jnp.zeros((d,), dtype),
            "wk": w((d, d), d),
            "wv": w((d, d), d), "bv": jnp.zeros((d,), dtype),
            "wo": w((d, d), d), "bo": jnp.zeros((d,), dtype),
            "mlp_ln_w": jnp.ones((d,), dtype), "mlp_ln_b": jnp.zeros((d,), dtype),
            "mlp1_w": w((d, 4 * d), d), "mlp1_b": jnp.zeros((4 * d,), dtype),
            "mlp2_w": w((4 * d, d), 4 * d), "mlp2_b": jnp.zeros((d,), dtype),
        })
    # Sinusoid PE (whisper_encoder.py:129-135).
    half = d // 2
    inc = np.log(10000) / (half - 1)
    inv = np.exp(-inc * np.arange(half))
    scaled = np.arange(cfg.n_ctx)[:, None] * inv[None, :]
    pe = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)

    params = {
        "conv1_w": w((3, cfg.n_mels, d), 3 * cfg.n_mels),
        "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": w((3, d, d), 3 * d),
        "conv2_b": jnp.zeros((d,), dtype),
        "positional_embedding": jnp.asarray(pe, dtype),
        "layers": layers,
        "vq_embed": w((cfg.audio_vq_codebook_size, cfg.audio_vq_codebook_dim),
                      cfg.audio_vq_codebook_dim),
    }
    ds = cfg.audio_vq_ds_rate
    if ds > 1:
        params["ds_w"] = w((ds, d, d), ds * d)
        params["ds_b"] = jnp.zeros((d,), dtype)
    if cfg.audio_vq_codebook_dim != d:
        params["vq_proj_in_w"] = w((d, cfg.audio_vq_codebook_dim), d)
        params["vq_proj_in_b"] = jnp.zeros((cfg.audio_vq_codebook_dim,), dtype)
    return params
