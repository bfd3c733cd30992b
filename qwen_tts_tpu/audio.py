"""Audio input plumbing: loading, normalization, resampling.

Mirrors the reference's accepted input forms (inference/qwen3_tts_model.py:
188-264): a string (WAV path / http(s) URL / base64 or data-URI audio), a
``(np.ndarray, sr)`` tuple, or a list of those — normalized to mono float32
plus the original sample rate.

Resampling uses a polyphase windowed-sinc filter (scipy.signal.resample_poly
with a Kaiser window — the same filter class librosa's default resampler
uses, qwen3_tts_model.py:440-444), NOT linear interpolation: voice-clone
reference audio at non-24k rates feeds both the codec encoder and the ECAPA
x-vector, where linear interpolation's treble roll-off and aliasing are
audible in the cloned voice.

Only WAV decoding ships in-image (stdlib ``wave`` — PCM8/16/32); other
containers need soundfile/librosa, which the environment doesn't provide.
"""

from __future__ import annotations

import base64
import io
import math
import os
import urllib.request
from typing import List, Sequence, Tuple, Union

import numpy as np

AudioLike = Union[str, np.ndarray, Tuple[np.ndarray, int]]


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------

def _design_kaiser(up: int, down: int, num_zeros: int = 64,
                   beta: float = 14.769656459379492,
                   rolloff: float = 0.9475) -> np.ndarray:
    """64-zero-crossing Kaiser-windowed sinc at the upsampled rate
    ('kaiser_best'-class design; cutoff = rolloff x min(sr_in, sr_out)/2).
    scipy's own ("kaiser", beta) tuple path designs a much shorter filter
    (10·max(up,down) half-taps) whose stopband leaks ~-35 dB of alias."""
    c = rolloff * min(1.0, up / down) / up  # fraction of upsampled Nyquist
    half = int(math.ceil(num_zeros / c))
    n = np.arange(-half, half + 1)
    return c * np.sinc(c * n) * np.kaiser(2 * half + 1, beta)


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase windowed-sinc resampling (Kaiser β=14.77, 64 zero
    crossings — 'kaiser_best'-class quality; alias rejection measured below
    1e-4 of a full-scale above-Nyquist tone in tests/test_audio.py)."""
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g
    h = _design_kaiser(up, down)
    try:
        from scipy.signal import resample_poly

        out = resample_poly(np.asarray(wav, np.float64), up, down, window=h)
        return out.astype(np.float32)
    except ImportError:  # pragma: no cover - scipy is in the image
        return _resample_poly_np(np.asarray(wav, np.float64), up, down, h)


def _resample_poly_np(x: np.ndarray, up: int, down: int,
                      h: np.ndarray) -> np.ndarray:
    """Pure-numpy fallback (same filter, direct zero-stuffed convolution —
    O(N·up·taps), fine for clip-length reference audio; this image always
    has scipy so the path is a safety net only)."""
    taps = h.shape[0]
    x_up = np.zeros(x.shape[0] * up)
    x_up[::up] = x
    y_up = np.convolve(x_up, h)[taps // 2 : taps // 2 + x_up.shape[0]]
    n_out = int(np.ceil(x.shape[0] * up / down))
    idx = np.arange(n_out) * down
    idx = idx[idx < y_up.shape[0]]
    y = up * y_up[idx]
    if y.shape[0] < n_out:  # right-edge pad like resample_poly
        y = np.pad(y, (0, n_out - y.shape[0]))
    return y.astype(np.float32)


# ---------------------------------------------------------------------------
# Loading / normalization
# ---------------------------------------------------------------------------

def _read_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    from qwen_tts_tpu.io.wav import read_wav

    return read_wav(io.BytesIO(data))


def _is_url(s: str) -> bool:
    from urllib.parse import urlparse

    try:
        u = urlparse(s)
        return u.scheme in ("http", "https") and bool(u.netloc)
    except Exception:
        return False


def _is_probably_base64(s: str) -> bool:
    # data-URI, or a long path-separator-free blob (reference heuristic,
    # qwen3_tts_model.py:188-193). Beyond the reference: a long blob that
    # CONTAINS '/' (legal in the standard base64 alphabet, which the
    # reference misroutes to the filesystem) is accepted as base64 when it
    # matches the alphabet and no such file exists.
    if s.startswith("data:audio"):
        return True
    if ("/" not in s and "\\" not in s) and len(s) > 256:
        return True
    if len(s) > 256 and not os.path.exists(s):
        import re

        return re.fullmatch(r"[A-Za-z0-9+/\s]+={0,2}\s*", s) is not None
    return False


def load_audio(src: str) -> Tuple[np.ndarray, int]:
    """Load audio from a WAV path, http(s) URL, or base64/data-URI string →
    (mono float32, sr)."""
    if _is_url(src):
        with urllib.request.urlopen(src) as resp:
            return _read_wav_bytes(resp.read())
    if _is_probably_base64(src):
        b64 = src.split(",", 1)[1] if src.strip().startswith("data:") else src
        return _read_wav_bytes(base64.b64decode(b64))
    from qwen_tts_tpu.io.wav import read_wav

    return read_wav(src)


def normalize_audio_inputs(
    audios: Union[AudioLike, Sequence[AudioLike]],
) -> List[Tuple[np.ndarray, int]]:
    """Normalize to a list of (mono float32 waveform, original sr).

    Accepted per item: str (path/URL/base64), (np.ndarray, sr). A bare
    ndarray is rejected — the sample rate is required (same contract as the
    reference, qwen3_tts_model.py:254-258).
    """
    items = list(audios) if isinstance(audios, (list, tuple)) and not (
        len(audios) == 2
        and isinstance(audios[0], np.ndarray)
        and isinstance(audios[1], (int, np.integer))
    ) else [audios]
    out: List[Tuple[np.ndarray, int]] = []
    for a in items:
        if isinstance(a, str):
            wav, sr = load_audio(a)
        elif (isinstance(a, (tuple, list)) and len(a) == 2
              and isinstance(a[0], np.ndarray)):
            wav, sr = np.asarray(a[0], np.float32), int(a[1])
        elif isinstance(a, np.ndarray):
            raise ValueError(
                "For numpy waveform input, pass a tuple (audio, sr)."
            )
        else:
            raise TypeError(f"Unsupported audio input type: {type(a)}")
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        out.append((wav.astype(np.float32), sr))
    return out
