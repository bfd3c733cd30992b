"""Fused QKV / gate∥up projections must be bit-compatible with the unfused
path (same math, one concatenated matmul)."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen_tts_tpu.models.trunk import (
    TrunkDims,
    fuse_trunk_params,
    init_trunk_params,
    trunk_decode_step,
    trunk_prefill,
)
from qwen_tts_tpu.ops.rope import rope_cos_sin

DIMS = TrunkDims(num_layers=2, hidden=32, heads=4, kv_heads=2, head_dim=8,
                 intermediate=64, eps=1e-6)


def test_fused_matches_unfused():
    params = init_trunk_params(jax.random.PRNGKey(0), DIMS)
    fused = fuse_trunk_params(params)
    assert "wq" not in fused and "wqkv" in fused and "wgu" in fused

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    cos, sin = rope_cos_sin(positions, 8, 10000.0)

    out_a, ka, va = trunk_prefill(params, DIMS, x, cos, sin)
    out_b, kb, vb = trunk_prefill(fused, DIMS, x, cos, sin)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ka), np.asarray(kb), atol=1e-6)

    kc = jnp.zeros((2, 2, 8, 2, 8))
    vc = jnp.zeros((2, 2, 8, 2, 8))
    c1, s1 = rope_cos_sin(jnp.zeros((2,), jnp.int32), 8, 10000.0)
    h_a, _, _ = trunk_decode_step(params, DIMS, x[:, 0], c1, s1, kc, vc,
                                  jnp.int32(1))
    h_b, _, _ = trunk_decode_step(fused, DIMS, x[:, 0], c1, s1, kc, vc,
                                  jnp.int32(1))
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=1e-5)
