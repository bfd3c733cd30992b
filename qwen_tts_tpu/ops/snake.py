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


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x: [..., C]; alpha/beta: [C] already exponentiated."""
    x32 = x.astype(jnp.float32)
    s = jnp.sin(x32 * alpha.astype(jnp.float32))
    out = x32 + (s * s) / (beta.astype(jnp.float32) + _NO_DIV_BY_ZERO)
    return out.astype(x.dtype)
