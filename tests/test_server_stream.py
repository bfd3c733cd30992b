"""HTTP /stream endpoint: HTTP/1.1 chunked transfer that standard clients
can parse, backed by continuous-batching slots so N concurrent streams share
one compiled decode program."""

import json
import threading
import http.client

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.generate import GenerationParams, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("sstream_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


@pytest.fixture()
def served(model):
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, model))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server.server_address[1], engine
    finally:
        server.shutdown()
        engine.stop()


def _stream_request(port, ids, frames):
    """POST /stream and read the full chunked body through http.client —
    which only de-chunks correctly when the response is real HTTP/1.1
    chunked transfer (the regression this test pins)."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    body = json.dumps({
        "ids": ids, "speaker": "aiden", "language": "english",
        "max_new_tokens": frames + 1, "do_sample": False,
        "subtalker_dosample": False, "repetition_penalty": 1.0,
    })
    conn.request("POST", "/stream", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers.get("Transfer-Encoding") == "chunked"
    data = resp.read()
    conn.close()
    return np.frombuffer(data, dtype="<i2")


def _expected_pcm(model, ids, frames):
    prompt = build_prompt(
        model.talker_params, model.cfg, np.asarray(ids, np.int32),
        language="english", speaker="aiden",
        st_params=model.subtalker_params,
    )
    params = GenerationParams(
        max_new_tokens=frames + 1, do_sample=False,
        subtalker_do_sample=False, repetition_penalty=1.0,
    )
    codes, _ = model.generate_codes_from_prompts([prompt], params)
    wav = model.decode_codes(codes)[0]
    return np.clip(wav * 32767.0, -32768, 32767).astype("<i2")


def test_stream_chunked_parse_and_content(served, model):
    port, _engine = served
    ids = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    frames = 6
    pcm = _stream_request(port, ids, frames)
    want = _expected_pcm(model, ids, frames)
    assert pcm.shape == want.shape
    # Chunked-decode context effects allow a few int16 LSBs of difference.
    assert np.abs(pcm.astype(np.int32) - want.astype(np.int32)).max() <= 16


def test_concurrent_streams_share_slots(served, model):
    port, engine = served
    ids_a = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    ids_b = [1, 2, 3, 20, 21, 22, 23, 4, 5, 1, 2, 3]
    frames = 6
    results = {}

    def client(name, ids):
        results[name] = _stream_request(port, ids, frames)

    threads = [
        threading.Thread(target=client, args=("a", ids_a)),
        threading.Thread(target=client, args=("b", ids_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    want_a = _expected_pcm(model, ids_a, frames)
    want_b = _expected_pcm(model, ids_b, frames)
    assert results["a"].shape == want_a.shape
    assert results["b"].shape == want_b.shape
    assert np.abs(results["a"].astype(np.int32) - want_a.astype(np.int32)).max() <= 16
    assert np.abs(results["b"].astype(np.int32) - want_b.astype(np.int32)).max() <= 16
    # Both streams ran through the continuous engine's slot pool.
    assert engine.stats["requests"] >= 2


def test_tts_endpoint_over_continuous_engine(served, model):
    """POST /tts (non-streaming WAV) served from continuous-batching slots —
    the window-engine path is covered in test_serving.py; this pins the
    continuous engine's submit_ids surface behind the same handler."""
    import urllib.request

    port, engine = served
    body = json.dumps({
        "ids": [1, 2, 3, 30, 31, 32, 4, 5, 1, 2, 3],
        "speaker": "serena", "language": "auto",
        "max_new_tokens": 5, "do_sample": False,
        "subtalker_dosample": False, "repetition_penalty": 1.0,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/tts", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        wav_bytes = r.read()
    assert wav_bytes[:4] == b"RIFF"
    # 4 frames (budget 5 - truncation trim) x 48 upsample x 2 bytes + header
    assert len(wav_bytes) == 44 + 4 * 48 * 2
