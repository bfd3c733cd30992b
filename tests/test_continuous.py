"""Continuous batching: slot insertion, staggered admission, and token-exact
greedy parity vs solo decoding."""

import dataclasses
import time

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.generate import GenerationParams, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cont_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


def _prompt(model, ids):
    return build_prompt(
        model.talker_params, model.cfg, np.asarray(ids, np.int32),
        language="english", speaker="aiden",
        st_params=model.subtalker_params,
    )


def _greedy(frames):
    # Budget-exhausted rows yield max_new - 1 frames (the reference never
    # expands the final cb0 token, modeling_qwen3_tts.py:2280-2291), so ask
    # for frames + 1 to get exactly `frames` out.
    return GenerationParams(
        max_new_tokens=frames + 1, min_new_tokens=frames + 1,
        do_sample=False, subtalker_do_sample=False, repetition_penalty=1.0,
    )


def test_continuous_matches_solo_greedy(model):
    ids1 = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    ids2 = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5, 1, 2, 3]
    p1, p2 = _prompt(model, ids1), _prompt(model, ids2)
    params = _greedy(6)

    # Solo references (fixed 6 frames each, greedy).
    solo = {}
    for name, p in (("a", p1), ("b", p2)):
        codes, _ = model.generate_codes_from_prompts([p], params)
        solo[name] = codes[0]
        assert solo[name].shape[0] == 6

    engine = ContinuousBatchingEngine(
        model, num_slots=3, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut1 = engine.submit_prompt(p1, params)
        # Stagger: give the first request a head start so the second joins a
        # live decode mid-flight (the continuous-batching case).
        time.sleep(0.5)
        fut2 = engine.submit_prompt(p2, params)
        wav1 = fut1.result(timeout=300)
        wav2 = fut2.result(timeout=300)
    finally:
        engine.stop()

    # Token-exact parity: the engine's wavs must equal decoding the solo codes.
    up = model.cfg.codec.decode_upsample_rate
    assert wav1.shape[0] == 6 * up
    assert wav2.shape[0] == 6 * up
    want1 = model.decode_codes([solo["a"]])[0]
    want2 = model.decode_codes([solo["b"]])[0]
    np.testing.assert_allclose(wav1, want1, atol=1e-5)
    np.testing.assert_allclose(wav2, want2, atol=1e-5)
    assert engine.stats["requests"] == 2


def test_continuous_engine_jacobi_gate_token_exact(model, monkeypatch):
    """QTTS_ST_JACOBI=1 on the SERVING engine (the deployment surface where
    the option would actually be enabled): adaptive Jacobi through the
    per-row VecSampling path must keep the greedy slot token-exact vs its
    solo SEQUENTIAL trace while a sampled slot decodes concurrently.
    (Sampled engine traces are scheduling-dependent — the frame rng folds in
    the engine's global tick — so exactness is asserted where it is defined:
    the greedy row, against the no-jacobi solo reference.)"""
    p_greedy = _prompt(model, [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3])
    p_sampled = _prompt(model, [1, 2, 3, 20, 21, 22, 23, 24, 4, 5, 1, 2, 3])
    greedy = _greedy(5)
    sampled = dataclasses.replace(
        greedy, do_sample=True, subtalker_do_sample=True, temperature=1.1,
        top_k=8, seed=13,
    )
    solo, _ = model.generate_codes_from_prompts([p_greedy], greedy)
    want = model.decode_codes(solo)[0]

    monkeypatch.setenv("QTTS_ST_JACOBI", "1")
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut_s = engine.submit_prompt(p_sampled, sampled)
        fut_g = engine.submit_prompt(p_greedy, greedy)
        wav_s = fut_s.result(timeout=300)
        wav_g = fut_g.result(timeout=300)
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    assert wav_s.shape[0] == 5 * up and np.isfinite(wav_s).all()
    np.testing.assert_allclose(wav_g, want, atol=1e-5)


def test_heterogeneous_sampling_per_slot(model):
    """A greedy request and a sampled request decode concurrently; the greedy
    slot must still match its solo greedy trace (per-row VecSampling)."""
    p_greedy = _prompt(model, [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3])
    p_sampled = _prompt(model, [1, 2, 3, 30, 31, 32, 4, 5, 1, 2, 3])
    g_params = _greedy(5)
    s_params = GenerationParams(
        max_new_tokens=6, min_new_tokens=6, do_sample=True,
        temperature=1.3, top_k=8, subtalker_do_sample=False,
    )
    solo, _ = model.generate_codes_from_prompts([p_greedy], g_params)
    want = model.decode_codes(solo)[0]

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=8,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        # Sampled request first → pins the engine's static config to a
        # SAMPLED one; the greedy request must still be greedy via VecSampling.
        fut_s = engine.submit_prompt(p_sampled, s_params)
        fut_g = engine.submit_prompt(p_greedy, g_params)
        wav_s = fut_s.result(timeout=300)
        wav_g = fut_g.result(timeout=300)
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    assert wav_s.shape[0] == 5 * up
    np.testing.assert_allclose(wav_g, want, atol=1e-5)


def test_continuous_many_requests_reuse_slots(model):
    params = _greedy(3)
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=8,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        futs = []
        for i in range(5):  # more requests than slots → slot reuse
            ids = [1, 2, 3, 10 + i, 11 + i, 4, 5, 1, 2, 3]
            futs.append(engine.submit_prompt(_prompt(model, ids), params))
        wavs = [f.result(timeout=600) for f in futs]
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    for wav in wavs:
        assert wav.shape[0] == 3 * up
        assert np.isfinite(wav).all()
    assert engine.stats["requests"] == 5


def test_heterogeneous_subtalker_sampling_per_slot(model):
    """Slots with DIFFERENT sub-talker settings decode concurrently; the
    fully-greedy slot must still match its solo trace (per-row VecSampling
    threaded into the sub-talker micro-decode scan)."""
    p_greedy = _prompt(model, [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3])
    p_st_sampled = _prompt(model, [1, 2, 3, 40, 41, 42, 4, 5, 1, 2, 3])
    g_params = _greedy(5)
    s_params = GenerationParams(
        max_new_tokens=6, min_new_tokens=6, do_sample=False,
        repetition_penalty=1.0,
        subtalker_do_sample=True, subtalker_temperature=1.5, subtalker_top_k=4,
    )
    solo, _ = model.generate_codes_from_prompts([p_greedy], g_params)
    want = model.decode_codes(solo)[0]

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=8,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        # Sub-talker-sampled request admitted FIRST: under the old engine-wide
        # pinning this would force sampling onto the greedy slot's groups.
        fut_s = engine.submit_prompt(p_st_sampled, s_params)
        fut_g = engine.submit_prompt(p_greedy, g_params)
        wav_s = fut_s.result(timeout=300)
        wav_g = fut_g.result(timeout=300)
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    assert wav_s.shape[0] == 5 * up
    np.testing.assert_allclose(wav_g, want, atol=1e-5)


def test_streaming_session_bounded_codec_shapes(model):
    """A full streaming session over continuous slots compiles a bounded set
    of codec window shapes (fixed-shape policy — no per-chunk-length
    recompiles in the serving loop)."""
    shapes = set()
    orig = model._codec_decode_jit

    def counting(params, cfg, codes):
        shapes.add(tuple(codes.shape))
        return orig(params, cfg, codes)

    model._codec_decode_jit = counting
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        chunks = []
        fut = engine.submit_prompt(
            _prompt(model, [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]), _greedy(9),
            stream_callback=lambda wav, done: chunks.append(wav),
        )
        fut.result(timeout=300)
    finally:
        engine.stop()
        model._codec_decode_jit = orig
    assert sum(c.shape[0] for c in chunks) == 9 * model.cfg.codec.decode_upsample_rate
    assert len(shapes) <= 3, f"codec window shapes not bounded: {shapes}"


def test_continuous_engine_with_tp_sharded_weights(model):
    """The serving engine itself (threaded worker, jitted slot programs)
    must run unchanged with TP-sharded weights — NamedShardings propagate
    from the param args without a mesh context in the worker thread — and
    stay token-exact vs the unsharded engine path."""
    import copy

    import jax
    from qwen_tts_tpu.parallel.mesh import make_mesh, shard_params

    ids = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    p = _prompt(model, ids)
    params = _greedy(6)
    codes, _ = model.generate_codes_from_prompts([p], params)
    want = model.decode_codes([codes[0]])[0]

    mesh = make_mesh(2, tp=2)
    sh_talker, sh_st = shard_params(
        mesh, model.talker_params, model.subtalker_params)
    assert len(jax.tree_util.tree_leaves(sh_talker)[0].sharding.device_set) >= 1
    m2 = copy.copy(model)
    m2.talker_params, m2.subtalker_params = sh_talker, sh_st

    engine = ContinuousBatchingEngine(
        m2, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut = engine.submit_prompt(p, params)
        wav = fut.result(timeout=300)
    finally:
        engine.stop()

    np.testing.assert_allclose(wav, want, atol=1e-5)
