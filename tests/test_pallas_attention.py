"""Pallas fused decode attention vs the XLA reference implementation
(interpreter mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen_tts_tpu.ops.attention import attention_decode_step
from qwen_tts_tpu.ops.pallas.decode_attention import pallas_attention_decode_step

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("sliding_window", [None, 5])
def test_pallas_decode_attention_matches_xla(sliding_window):
    b, h, kv, hd, s_max = 3, 8, 2, 16, 32
    q = RNG.standard_normal((b, h, hd)).astype(np.float32)
    k = RNG.standard_normal((b, s_max, kv, hd)).astype(np.float32)
    v = RNG.standard_normal((b, s_max, kv, hd)).astype(np.float32)
    cur_len = jnp.asarray([7, 20, 32], jnp.int32)
    valid_from = jnp.asarray([0, 3, 1], jnp.int32)

    want = attention_decode_step(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        cur_len=cur_len, valid_from=valid_from, sliding_window=sliding_window,
    )
    got = pallas_attention_decode_step(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        cur_len=cur_len, valid_from=valid_from, sliding_window=sliding_window,
        interpret=True,  # CPU test env; compiled on TPU
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_decode_attention_scalar_cur_len():
    b, h, kv, hd, s_max = 2, 4, 2, 8, 16
    q = RNG.standard_normal((b, h, hd)).astype(np.float32)
    k = RNG.standard_normal((b, s_max, kv, hd)).astype(np.float32)
    v = RNG.standard_normal((b, s_max, kv, hd)).astype(np.float32)
    want = attention_decode_step(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cur_len=jnp.int32(9)
    )
    got = pallas_attention_decode_step(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cur_len=jnp.int32(9),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
