"""Jacobi fixed-point sub-talker decode: exact-greedy contract.

The sequential G-step scan (modeling_qwen3_tts.py:1015-1319 schedule) and
the Jacobi iteration must produce the same greedy trace — the fixed point of
the full-sequence forward IS the sequential trace, reached in ≤ G-1
iterations (see subtalker_generate_jacobi docstring)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.ops.sampling import SamplingConfig


def _setup(seed=1, batch=3):
    cfg = tiny_tts_config().talker
    p = st_mod.init_subtalker_params(
        jax.random.PRNGKey(seed), cfg.code_predictor, cfg.hidden_size
    )
    emb = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (cfg.vocab_size, cfg.hidden_size)
    )
    hidden = (
        jax.random.normal(jax.random.PRNGKey(seed + 2), (batch, cfg.hidden_size))
        * 0.3
    )
    first = jnp.asarray(np.arange(batch) * 3 % cfg.code_predictor.vocab_size,
                        jnp.int32)
    return cfg, p, emb, hidden, first


def test_jacobi_matches_sequential_greedy():
    cfg, p, emb, hidden, first = _setup()
    seq = st_mod.subtalker_generate(
        p, cfg.code_predictor, emb, hidden, first,
        SamplingConfig(do_sample=False), None,
    )
    jac = st_mod.subtalker_generate_jacobi(
        p, cfg.code_predictor, emb, hidden, first
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))


def test_jacobi_matches_sequential_greedy_int8_tables():
    cfg, p, emb, hidden, first = _setup(seed=5)
    p8 = st_mod.quantize_subtalker_tables_int8(p)
    seq = st_mod.subtalker_generate(
        p8, cfg.code_predictor, emb, hidden, first,
        SamplingConfig(do_sample=False), None,
    )
    jac = st_mod.subtalker_generate_jacobi(
        p8, cfg.code_predictor, emb, hidden, first
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))


def test_jacobi_fixed_iters_full_depth_is_exact():
    """fixed_iters = G-1 is the worst-case bound: always the exact trace
    (bench mode uses this for static cost)."""
    cfg, p, emb, hidden, first = _setup(seed=9)
    g = cfg.code_predictor.num_code_groups
    seq = st_mod.subtalker_generate(
        p, cfg.code_predictor, emb, hidden, first,
        SamplingConfig(do_sample=False), None,
    )
    jac = st_mod.subtalker_generate_jacobi(
        p, cfg.code_predictor, emb, hidden, first, fixed_iters=g - 1
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))


def test_jacobi_gate_in_generate_is_trace_exact(monkeypatch, tmp_path):
    """QTTS_ST_JACOBI=1 keeps the full greedy decode token-exact (the gate
    only engages for greedy sub-talker sampling)."""
    from qwen_tts_tpu.generate import (
        GenerationParams,
        batch_prompts,
        build_prompt,
        generate_codes,
    )
    from qwen_tts_tpu.models import talker as talker_mod

    full_cfg = tiny_tts_config()
    cfg = full_cfg.talker
    rng = jax.random.PRNGKey(0)
    tp = talker_mod.init_talker_params(rng, cfg)
    sp = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
    )
    prompts = [
        build_prompt(
            tp, full_cfg,
            np.array([1, 2, 3, 10 + i, 11, 12, 4, 5, 1, 2, 3], np.int32),
            language="english", speaker="aiden",
        )
        for i in range(2)
    ]
    embeds, pmask, trailing, _ = batch_prompts(prompts)
    gp = GenerationParams(
        max_new_tokens=4, min_new_tokens=4, do_sample=False,
        subtalker_do_sample=False, repetition_penalty=1.0,
    )

    def run():
        out = generate_codes(
            tp, sp, cfg, jnp.asarray(embeds), jnp.asarray(pmask),
            jnp.asarray(trailing), sampling=gp.talker_sampling(),
            st_sampling=gp.subtalker_sampling(),
            max_new_tokens=gp.max_new_tokens, rng=jax.random.PRNGKey(0),
        )
        return np.asarray(out.codes)

    ref = run()
    monkeypatch.setenv("QTTS_ST_JACOBI", "1")
    jac = run()
    np.testing.assert_array_equal(ref, jac)

def test_jacobi_matches_sequential_sampled():
    """Gumbel-max key reuse: the sampled Jacobi fixed point IS the
    sequential sampled trace (same per-position keys -> same categorical
    draws), bit-for-bit on the f32 CPU path."""
    cfg, p, emb, hidden, first = _setup(seed=13, batch=4)
    sc = SamplingConfig(do_sample=True, temperature=0.9, top_k=50, top_p=1.0)
    rng = jax.random.PRNGKey(42)
    seq = st_mod.subtalker_generate(
        p, cfg.code_predictor, emb, hidden, first, sc, rng
    )
    jac = st_mod.subtalker_generate_jacobi(
        p, cfg.code_predictor, emb, hidden, first, sampling=sc, rng=rng
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))


def test_jacobi_sampled_topp_and_int8_tables():
    cfg, p, emb, hidden, first = _setup(seed=17, batch=3)
    p8 = st_mod.quantize_subtalker_tables_int8(p)
    sc = SamplingConfig(do_sample=True, temperature=1.3, top_k=0, top_p=0.8)
    rng = jax.random.PRNGKey(7)
    seq = st_mod.subtalker_generate(
        p8, cfg.code_predictor, emb, hidden, first, sc, rng
    )
    jac = st_mod.subtalker_generate_jacobi(
        p8, cfg.code_predictor, emb, hidden, first, sampling=sc, rng=rng
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))


def test_jacobi_gate_sampled_decode_is_trace_exact(monkeypatch):
    """QTTS_ST_JACOBI=1 with a SAMPLED sub-talker keeps the full decode
    trace exact (the gate now engages for sampling too, via key reuse)."""
    from qwen_tts_tpu.generate import (
        GenerationParams,
        batch_prompts,
        build_prompt,
        generate_codes,
    )
    from qwen_tts_tpu.models import talker as talker_mod

    full_cfg = tiny_tts_config()
    cfg = full_cfg.talker
    rng = jax.random.PRNGKey(0)
    tp = talker_mod.init_talker_params(rng, cfg)
    sp = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
    )
    prompts = [
        build_prompt(
            tp, full_cfg,
            np.array([1, 2, 3, 10 + i, 11, 12, 4, 5, 1, 2, 3], np.int32),
            language="english", speaker="aiden",
        )
        for i in range(2)
    ]
    embeds, pmask, trailing, _ = batch_prompts(prompts)
    gp = GenerationParams(
        max_new_tokens=4, min_new_tokens=4, do_sample=True,
        subtalker_do_sample=True, repetition_penalty=1.05,
    )

    def run():
        out = generate_codes(
            tp, sp, cfg, jnp.asarray(embeds), jnp.asarray(pmask),
            jnp.asarray(trailing), sampling=gp.talker_sampling(),
            st_sampling=gp.subtalker_sampling(),
            max_new_tokens=gp.max_new_tokens, rng=jax.random.PRNGKey(3),
        )
        return np.asarray(out.codes)

    ref = run()
    monkeypatch.setenv("QTTS_ST_JACOBI", "1")
    jac = run()
    np.testing.assert_array_equal(ref, jac)


def test_env_gate_flip_retraces_cached_programs(monkeypatch):
    """The QTTS_ST_* gates are read at trace time, so flipping one between
    same-shape calls in one process MUST force a retrace (init_decode &co
    carry st_env_token() as a static cache key). Proof: a pinned 1-iteration
    Jacobi run on random weights is NOT converged, so its trace must differ
    from the sequential program that was already cached — a stale-cache bug
    would silently return the sequential trace again."""
    from qwen_tts_tpu.generate import (
        GenerationParams,
        batch_prompts,
        build_prompt,
        generate_codes,
    )
    from qwen_tts_tpu.models import talker as talker_mod

    full_cfg = tiny_tts_config()
    cfg = full_cfg.talker
    rng = jax.random.PRNGKey(0)
    tp = talker_mod.init_talker_params(rng, cfg)
    sp = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
    )
    prompts = [
        build_prompt(
            tp, full_cfg,
            np.array([1, 2, 3, 10 + i, 11, 12, 4, 5, 1, 2, 3], np.int32),
            language="english", speaker="aiden",
        )
        for i in range(2)
    ]
    embeds, pmask, trailing, _ = batch_prompts(prompts)
    gp = GenerationParams(
        max_new_tokens=4, min_new_tokens=4, do_sample=False,
        subtalker_do_sample=False, repetition_penalty=1.0,
    )

    def run():
        out = generate_codes(
            tp, sp, cfg, jnp.asarray(embeds), jnp.asarray(pmask),
            jnp.asarray(trailing), sampling=gp.talker_sampling(),
            st_sampling=gp.subtalker_sampling(),
            max_new_tokens=gp.max_new_tokens, rng=jax.random.PRNGKey(0),
        )
        return np.asarray(out.codes)

    ref = run()
    monkeypatch.setenv("QTTS_ST_JACOBI", "1")
    monkeypatch.setenv("QTTS_ST_JACOBI_ITERS", "1")
    one_iter = run()
    assert not np.array_equal(ref, one_iter), (
        "pinned 1-iter Jacobi returned the sequential trace — the env flip "
        "did not retrace (stale jit cache)"
    )
    monkeypatch.delenv("QTTS_ST_JACOBI_ITERS")
    adaptive = run()  # adaptive Jacobi is exact: back to the sequential trace
    np.testing.assert_array_equal(ref, adaptive)
    monkeypatch.delenv("QTTS_ST_JACOBI")
    np.testing.assert_array_equal(ref, run())


def test_env_gate_flip_retraces_bit_identical_gates(monkeypatch):
    """Gates whose math is bit-identical (QTTS_ST_SPLIT) can't be caught by
    output comparison — pin the retrace via the jit cache key instead: a
    same-shape call after the flip must ADD a cache entry, and flipping
    back must reuse the original (the token is a snapshot, not a counter)."""
    from qwen_tts_tpu.generate import (
        GenerationParams,
        _init_decode_jit,
        batch_prompts,
        build_prompt,
        generate_codes,
    )
    from qwen_tts_tpu.models import talker as talker_mod

    full_cfg = tiny_tts_config()
    cfg = full_cfg.talker
    rng = jax.random.PRNGKey(0)
    tp = talker_mod.init_talker_params(rng, cfg)
    sp = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
    )
    prompts = [build_prompt(
        tp, full_cfg, np.array([1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3], np.int32),
        language="english", speaker="aiden",
    )]
    embeds, pmask, trailing, _ = batch_prompts(prompts)
    gp = GenerationParams(max_new_tokens=3, min_new_tokens=3, do_sample=False,
                          subtalker_do_sample=False, repetition_penalty=1.0)

    def run():
        out = generate_codes(
            tp, sp, cfg, jnp.asarray(embeds), jnp.asarray(pmask),
            jnp.asarray(trailing), sampling=gp.talker_sampling(),
            st_sampling=gp.subtalker_sampling(),
            max_new_tokens=gp.max_new_tokens, rng=jax.random.PRNGKey(0),
        )
        return np.asarray(out.codes)

    ref = run()
    base = _init_decode_jit._cache_size()
    monkeypatch.setenv("QTTS_ST_SPLIT", "1")
    np.testing.assert_array_equal(ref, run())  # bit-identical math
    assert _init_decode_jit._cache_size() == base + 1, (
        "QTTS_ST_SPLIT flip did not retrace"
    )
    monkeypatch.delenv("QTTS_ST_SPLIT")
    run()
    assert _init_decode_jit._cache_size() == base + 1, (
        "flipping back should reuse the original cache entry"
    )


def test_jacobi_matches_sequential_vec_sampled():
    """Per-row VecSampling (continuous-batching path): mixed greedy/sampled
    rows with heterogeneous warp params stay bit-equal to the sequential
    scan under Jacobi."""
    from qwen_tts_tpu.ops.sampling_vec import VecSampling

    cfg, p, emb, hidden, first = _setup(seed=21, batch=4)
    vs = VecSampling(
        do_sample=jnp.array([True, False, True, True]),
        temperature=jnp.array([0.9, 1.0, 1.4, 0.7], jnp.float32),
        top_k=jnp.array([50, 0, 8, 0], jnp.int32),
        top_p=jnp.array([1.0, 1.0, 0.9, 0.8], jnp.float32),
        repetition_penalty=jnp.ones((4,), jnp.float32),
        min_new_tokens=jnp.zeros((4,), jnp.int32),
    )
    rng = jax.random.PRNGKey(11)
    seq = st_mod.subtalker_generate(
        p, cfg.code_predictor, emb, hidden, first,
        SamplingConfig(do_sample=False), rng, vec_sampling=vs,
    )
    jac = st_mod.subtalker_generate_jacobi(
        p, cfg.code_predictor, emb, hidden, first, rng=rng, vec_sampling=vs
    )
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(jac))
