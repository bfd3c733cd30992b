"""SnakeBeta activation (BigVGAN vocoder nonlinearity).

``snake(x) = x + sin(x * alpha)^2 / (beta + 1e-9)`` with per-channel
``alpha = exp(a)``, ``beta = exp(b)`` (modeling_qwen3_tts_tokenizer_v2.py:
578-616). Like the C port (c/qwen_tts.c:596-602) we pre-exponentiate the
parameters at load time, so this op receives alpha/beta directly.

Pure VPU elementwise math in channels-last layout — XLA fuses it with the
neighbouring convolutions' input/output, which is what the reference needed a
hand-vectorized Accelerate path for (c/qwen_tts_kernels.c:251-311).
"""

from __future__ import annotations

import jax.numpy as jnp

_NO_DIV_BY_ZERO = 1e-9

# Minimax-grade odd polynomial for sin on [-pi/2, pi/2] (Taylor deg 9; max
# abs error ~8e-7 — three orders below bf16 resolution).
_S3 = -1.0 / 6.0
_S5 = 1.0 / 120.0
_S7 = -1.0 / 5040.0
_S9 = 1.0 / 362880.0
_INV_PI = 0.3183098861837907
_PI = 3.141592653589793


def _sin_squared(u: jnp.ndarray) -> jnp.ndarray:
    """sin(u)^2 via range reduction mod pi + a degree-9 odd polynomial.

    XLA's TPU sine is a full-precision transcendental — measured at ~65% of
    the ENTIRE codec decode (SnakeBeta runs over every vocoder activation).
    sin^2 only needs |sin|: sin(u) = ±sin(u - pi*round(u/pi)) and the sign
    squares away, so one round + fma + 4 fmas + square replace it.

    Accuracy: the reduction error is ~1.2e-7·|u| (k is exact in f32 up to
    2^24; only the pi·k product rounds), i.e. sin^2 error < 1e-4 for
    |u| < 1000 and ~2e-6 at activation scale — below bf16 resolution, which
    is the only dtype routed here. The clamp keeps astronomically large
    inputs finite instead of letting the polynomial blow up.

    Deliberately a SHORT op chain: a 3-term Cody-Waite reduction measured
    2.5x slower end-to-end (540 vs 214 ms codec decode) — the longer
    elementwise chain defeats XLA's conv fusion. jnp.floor / int casts are
    similarly catastrophic on this stack (572 / 540 ms vs round's 214)."""
    r = u - _PI * jnp.round(u * _INV_PI)
    r = jnp.clip(r, -1.5707964, 1.5707964)
    r2 = r * r
    s = r * (1.0 + r2 * (_S3 + r2 * (_S5 + r2 * (_S7 + r2 * _S9))))
    return s * s


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x: [..., C]; alpha/beta: [C] already exponentiated.

    bf16 inputs (the TPU serving path) take the fast polynomial sin^2 — its
    error is orders below bf16's own quantization. f32 inputs (CPU parity /
    oracle paths) keep the exact transcendental so waveform comparisons
    against torch stay bit-faithful."""
    x32 = x.astype(jnp.float32)
    u = x32 * alpha.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        s2 = _sin_squared(u)
    else:
        s = jnp.sin(u)
        s2 = s * s
    out = x32 + s2 / (beta.astype(jnp.float32) + _NO_DIV_BY_ZERO)
    return out.astype(x.dtype)
