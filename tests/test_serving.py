"""Serving engine: window batching, concurrent requests, HTTP surface."""

import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


def test_engine_batches_concurrent_requests(model):
    engine = ServingEngine(model, max_batch=4, max_wait_ms=200,
                           max_new_tokens=4).start()
    try:
        ids1 = np.array([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
        ids2 = np.array([1, 2, 3, 12, 13, 14, 4, 5, 1, 2, 3], np.int32)
        futs = [
            engine.submit_ids(ids1, speaker="aiden", language="english",
                              do_sample=False),
            engine.submit_ids(ids2, speaker="serena", language="auto",
                              do_sample=False),
        ]
        wavs = [f.result(timeout=300) for f in futs]
        for wav in wavs:
            assert wav.ndim == 1
            assert np.isfinite(wav).all()
        assert engine.stats["requests"] == 2
        assert engine.stats["batches"] <= 2  # window batching (timing-dependent)
    finally:
        engine.stop()


def test_http_server_endpoints(model):
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler

    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=3).start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, model))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/voices") as r:
            v = json.load(r)
            assert "aiden" in v["speakers"]

        body = json.dumps({
            "ids": [1, 2, 3, 10, 11, 4, 5, 1, 2, 3],
            "speaker": "aiden", "language": "english",
            "max_new_tokens": 3, "do_sample": False,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            wav_bytes = r.read()
            assert wav_bytes[:4] == b"RIFF"
    finally:
        server.shutdown()
        engine.stop()


def test_window_groups_by_params(model):
    """Requests differing only in max_new_tokens SHARE a window (budgets are
    served dynamically via per-row step_limit under one ceiling-compiled
    program); requests with different SAMPLING controls never share one —
    the scheduler holds them for the next window instead of silently
    overriding them."""
    engine = ServingEngine(model, max_batch=4, max_wait_ms=300,
                           max_new_tokens=8).start()
    try:
        ids = np.array([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
        fut_short = engine.submit_ids(
            ids, speaker="aiden", language="english",
            do_sample=False, max_new_tokens=4, repetition_penalty=1.0,
        )
        fut_long = engine.submit_ids(
            ids, speaker="aiden", language="english",
            do_sample=False, max_new_tokens=7, repetition_penalty=1.0,
        )
        fut_sampled = engine.submit_ids(
            ids, speaker="aiden", language="english",
            do_sample=True, max_new_tokens=4, temperature=1.3,
        )
        wav_short = fut_short.result(timeout=300)
        wav_long = fut_long.result(timeout=300)
        wav_sampled = fut_sampled.result(timeout=300)
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    # Neither request runs under the other's budget: each is bounded by its
    # OWN max_new_tokens (budget-exhausted rows yield budget-1 frames).
    assert 0 < wav_short.shape[0] <= 3 * up
    assert 0 < wav_long.shape[0] <= 6 * up
    assert 0 < wav_sampled.shape[0] <= 3 * up
    # greedy short+long share one window; the sampled request gets its own.
    assert engine.stats["batches"] == 2


def test_window_budgets_share_one_program_and_match_solo(model):
    """Serving shape hygiene: windows of heterogeneous max_new_tokens and
    batch sizes reuse ONE compiled decode program (ceiling + per-row
    step_limit + power-of-two batch padding), and each request's greedy
    trace equals its solo decode with that budget."""
    from qwen_tts_tpu.generate import (
        GenerationParams,
        _init_decode_jit,
        build_prompt,
    )

    ids_a = np.array([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
    ids_b = np.array([1, 2, 3, 20, 21, 22, 4, 5, 1, 2, 3], np.int32)

    # Solo references decoded through the same ceiling/step_limit path.
    solo = {}
    for name, ids, budget in (("a", ids_a, 4), ("b", ids_b, 7)):
        prompt = build_prompt(model.talker_params, model.cfg, ids,
                              language="english", speaker="aiden")
        gp = GenerationParams(max_new_tokens=8, do_sample=False,
                              subtalker_do_sample=False,
                              repetition_penalty=1.0)
        codes, _ = model.generate_codes_from_prompts(
            [prompt], gp, step_limit=[budget], max_new_ceiling=8,
            trailing_bucket=16,
        )
        solo[name] = model.decode_codes(codes, bucket=8)[0]

    engine = ServingEngine(model, max_batch=4, max_wait_ms=300,
                           max_new_tokens=8).start()
    try:
        # Window 1: two requests, budgets 4 and 7 (padded to batch 2).
        f1 = engine.submit_ids(ids_a, speaker="aiden", language="english",
                               do_sample=False, subtalker_dosample=False,
                               max_new_tokens=4, repetition_penalty=1.0)
        f2 = engine.submit_ids(ids_b, speaker="aiden", language="english",
                               do_sample=False, subtalker_dosample=False,
                               max_new_tokens=7, repetition_penalty=1.0)
        w1, w2 = f1.result(timeout=300), f2.result(timeout=300)
        size_after_window1 = _init_decode_jit._cache_size()

        # Window 2: ONE request (batch bucket 1 — at most one more program);
        # window 3 repeats that shape with yet another budget and must add
        # NO new programs.
        f3 = engine.submit_ids(ids_a, speaker="aiden", language="english",
                               do_sample=False, subtalker_dosample=False,
                               max_new_tokens=6, repetition_penalty=1.0)
        f3.result(timeout=300)
        size_after_window2 = _init_decode_jit._cache_size()
        f4 = engine.submit_ids(ids_b, speaker="aiden", language="english",
                               do_sample=False, subtalker_dosample=False,
                               max_new_tokens=5, repetition_penalty=1.0)
        f4.result(timeout=300)
        assert _init_decode_jit._cache_size() == size_after_window2, (
            "a new budget recompiled the decode program"
        )
        assert size_after_window2 <= size_after_window1 + 1
    finally:
        engine.stop()

    up = model.cfg.codec.decode_upsample_rate
    assert w1.shape[0] == solo["a"].shape[0] == 3 * up
    assert w2.shape[0] == solo["b"].shape[0] == 6 * up
    np.testing.assert_allclose(w1, solo["a"], atol=1e-5)
    np.testing.assert_allclose(w2, solo["b"], atol=1e-5)


def test_submit_rejects_budget_above_engine_ceiling(model):
    """ADVICE r3: an explicit max_new_tokens above the engine's compiled
    ceiling used to be silently clamped (truncated audio, no signal) — both
    engines now reject at submit, mirroring prompt-length validation."""
    ids = np.array([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=4)
    with pytest.raises(ValueError, match="ceiling"):
        engine.submit_ids(ids, speaker="aiden", language="english",
                          max_new_tokens=8)

    from qwen_tts_tpu.continuous import ContinuousBatchingEngine

    cont = ContinuousBatchingEngine(model, num_slots=2, segment_frames=2,
                                    max_new_tokens=4)
    with pytest.raises(ValueError, match="ceiling"):
        cont.submit_ids(ids, speaker="aiden", language="english",
                        max_new_tokens=8)
