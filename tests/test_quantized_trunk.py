"""int8 trunk quantization: structural checks + bounded numeric drift."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen_tts_tpu.models.trunk import (
    TrunkDims,
    init_trunk_params,
    quantize_trunk_int8,
    trunk_prefill,
)
from qwen_tts_tpu.ops.rope import rope_cos_sin

DIMS = TrunkDims(num_layers=2, hidden=32, heads=4, kv_heads=2, head_dim=8,
                 intermediate=64, eps=1e-6)


def test_quantized_trunk_close_to_fp():
    params = init_trunk_params(jax.random.PRNGKey(0), DIMS)
    qparams = quantize_trunk_int8(params)
    assert "wq" not in qparams and qparams["wq_i8"].dtype == jnp.int8
    assert qparams["wq_s"].shape == (2, 1, 32)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32)) * 0.5
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    cos, sin = rope_cos_sin(positions, 8, 10000.0)
    out_fp, _, _ = trunk_prefill(params, DIMS, x, cos, sin)
    out_q, _, _ = trunk_prefill(qparams, DIMS, x, cos, sin)
    # int8 rounding drift stays small relative to activation scale.
    err = np.abs(np.asarray(out_fp) - np.asarray(out_q))
    scale = np.abs(np.asarray(out_fp)).mean()
    assert err.mean() < 0.05 * scale + 0.05


def test_fused_int8_matches_separate_int8():
    """quantize(fuse(params)) must produce the same math as quantize(params):
    per-output-channel scales are identical after concatenation, so outputs
    agree to float tolerance (tested option; measured slower on v5e — see
    CLAUDE.md — but must stay correct)."""
    from qwen_tts_tpu.models.trunk import fuse_trunk_params

    params = init_trunk_params(jax.random.PRNGKey(0), DIMS)
    q_sep = quantize_trunk_int8(params)
    q_fused = quantize_trunk_int8(fuse_trunk_params(params))
    assert "wqkv_i8" in q_fused and "wgu_i8" in q_fused

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32)) * 0.5
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    cos, sin = rope_cos_sin(positions, 8, 10000.0)
    out_sep, _, _ = trunk_prefill(q_sep, DIMS, x, cos, sin)
    out_fused, _, _ = trunk_prefill(q_fused, DIMS, x, cos, sin)
    np.testing.assert_allclose(np.asarray(out_sep), np.asarray(out_fused),
                               atol=1e-5, rtol=1e-5)


def test_subtalker_int8_tables_greedy_stable():
    """int8 embedding tables + LM heads: greedy micro-decode stays stable on
    well-separated logits, and the group-embedding sum drifts only at int8
    rounding scale."""
    import jax

    from qwen_tts_tpu.config import tiny_tts_config
    from qwen_tts_tpu.models import subtalker as st
    from qwen_tts_tpu.ops.sampling import SamplingConfig

    cfg = tiny_tts_config().talker
    p = st.init_subtalker_params(jax.random.PRNGKey(1), cfg.code_predictor,
                                 cfg.hidden_size)
    emb = jax.random.normal(jax.random.PRNGKey(2),
                            (cfg.vocab_size, cfg.hidden_size))
    hidden = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.hidden_size)) * 0.3
    first = jnp.asarray([3, 7], jnp.int32)
    g = SamplingConfig(do_sample=False)
    f0 = st.subtalker_generate(p, cfg.code_predictor, emb, hidden, first, g, None)
    pq = st.quantize_subtalker_tables_int8(p)
    assert "embeds" not in pq and pq["embeds_i8"].dtype == jnp.int8
    # idempotent: re-quantizing an already-quantized pytree is a no-op
    pq2 = st.quantize_subtalker_tables_int8(pq)
    assert pq2.keys() == pq.keys()
    f1 = st.subtalker_generate(pq, cfg.code_predictor, emb, hidden, first, g, None)
    # random tiny logits are well-separated; int8 rounding must not flip them
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    s0 = st.embed_groups_sum(p, emb, f0)
    s1 = st.embed_groups_sum(pq, emb, f0)
    drift = float(jnp.max(jnp.abs(s0 - s1)))
    assert drift < 0.05, drift
