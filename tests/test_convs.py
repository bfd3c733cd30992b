"""Conv padding-convention parity vs torch (waveform parity depends on these,
SURVEY.md §7 risk list)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from qwen_tts_tpu.ops.convs import causal_conv1d, causal_conv_transpose1d
from qwen_tts_tpu.ops.snake import snake_beta

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("k,dilation,cin,cout", [(3, 1, 8, 16), (7, 1, 8, 8), (7, 3, 4, 4), (1, 1, 8, 4)])
def test_causal_conv1d_matches_torch(k, dilation, cin, cout):
    x = RNG.standard_normal((2, 20, cin)).astype(np.float32)
    w = RNG.standard_normal((k, cin, cout)).astype(np.float32)
    b = RNG.standard_normal(cout).astype(np.float32)
    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=dilation)

    k_eff = (k - 1) * dilation + 1
    xt = torch.from_numpy(x).permute(0, 2, 1)
    xt = F.pad(xt, (k_eff - 1, 0))
    want = F.conv1d(xt, torch.from_numpy(w).permute(2, 1, 0), torch.from_numpy(b),
                    dilation=dilation).permute(0, 2, 1)
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_depthwise_causal_conv_matches_torch():
    c, k = 12, 7
    x = RNG.standard_normal((2, 15, c)).astype(np.float32)
    w = RNG.standard_normal((k, 1, c)).astype(np.float32)
    b = RNG.standard_normal(c).astype(np.float32)
    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups=c)

    xt = F.pad(torch.from_numpy(x).permute(0, 2, 1), (k - 1, 0))
    want = F.conv1d(xt, torch.from_numpy(w).permute(2, 1, 0), torch.from_numpy(b),
                    groups=c).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


@pytest.mark.parametrize("cin,cout,stride,k", [(8, 4, 2, 4), (6, 6, 2, 2), (8, 4, 5, 10), (4, 2, 3, 6)])
def test_causal_conv_transpose1d_matches_torch(cin, cout, stride, k):
    """Torch ConvTranspose1d + right-trim(k - stride) — the reference's
    CausalTransConvNet (modeling_qwen3_tts_tokenizer_v2.py:195-208)."""
    x = RNG.standard_normal((2, 11, cin)).astype(np.float32)
    w_torch = RNG.standard_normal((cin, cout, k)).astype(np.float32)
    b = RNG.standard_normal(cout).astype(np.float32)

    # Prepare the JAX layout: W'[j, i, o] = W_torch[i, o, K-1-j].
    w_jax = np.ascontiguousarray(np.flip(np.transpose(w_torch, (2, 0, 1)), axis=0))
    got = causal_conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w_jax), jnp.asarray(b), stride=stride
    )

    out = F.conv_transpose1d(
        torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(w_torch),
        torch.from_numpy(b), stride=stride,
    )
    trim = k - stride
    if trim > 0:
        out = out[..., :-trim]
    want = out.permute(0, 2, 1)
    assert got.shape == tuple(want.shape)
    assert got.shape[1] == x.shape[1] * stride
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_snake_beta():
    c = 8
    x = RNG.standard_normal((2, 10, c)).astype(np.float32)
    alpha = np.exp(RNG.standard_normal(c)).astype(np.float32)
    beta = np.exp(RNG.standard_normal(c)).astype(np.float32)
    got = snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
    want = x + np.sin(x * alpha) ** 2 / (beta + 1e-9)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_snake_beta_bf16_fast_path_matches_exact():
    """The bf16 snake uses a polynomial sin^2 (range-reduced mod pi); its
    deviation from the exact transcendental must sit below bf16 resolution
    across activation-scale inputs, and stay finite for absurd magnitudes."""
    import jax.numpy as jnp

    from qwen_tts_tpu.ops.snake import snake_beta

    rng = np.random.default_rng(0)
    x = rng.uniform(-60.0, 60.0, (4, 257, 96)).astype(np.float32)
    alpha = np.exp(rng.uniform(-1, 1, 96)).astype(np.float32)
    beta = np.exp(rng.uniform(-1, 1, 96)).astype(np.float32)

    exact = np.asarray(snake_beta(jnp.asarray(x), jnp.asarray(alpha),
                                  jnp.asarray(beta)))
    fast = np.asarray(snake_beta(jnp.asarray(x, jnp.bfloat16),
                                 jnp.asarray(alpha), jnp.asarray(beta)),
                      np.float32)
    # bf16 inputs quantize x itself (~0.4% relative); compare against the
    # exact op applied to the SAME quantized inputs.
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    exact_q = np.asarray(snake_beta(jnp.asarray(xq), jnp.asarray(alpha),
                                    jnp.asarray(beta)))
    scale = np.maximum(np.abs(exact_q), 1.0)
    assert np.max(np.abs(fast - exact_q) / scale) < 2e-2  # bf16 out rounding
    del exact

    huge = snake_beta(jnp.full((8,), 1e30, jnp.bfloat16),
                      jnp.asarray(alpha[:1]), jnp.asarray(beta[:1]))
    assert np.isfinite(np.asarray(huge, np.float32)).all()
