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
    """Requests with different GenerationParams never share a window — each
    runs under its OWN settings (the scheduler holds incompatible requests
    for the next window instead of silently overriding them)."""
    engine = ServingEngine(model, max_batch=4, max_wait_ms=150,
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
        wav_short = fut_short.result(timeout=300)
        wav_long = fut_long.result(timeout=300)
    finally:
        engine.stop()
    up = model.cfg.codec.decode_upsample_rate
    # Neither request runs under the other's budget: each is bounded by its
    # OWN max_new_tokens (budget-exhausted rows yield budget-1 frames).
    assert 0 < wav_short.shape[0] <= 3 * up
    assert 0 < wav_long.shape[0] <= 6 * up
    assert engine.stats["batches"] == 2  # incompatible → separate windows
