"""Voice-clone serving: engine-level ICL clone parity vs the pipeline
(ref-code prepend + wav cut, qwen3_tts_model.py:612-631) and the HTTP
/clone_voice → /tts flow end-to-end."""

import base64
import io
import json
import threading
import urllib.request
import wave

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.serving import ServingEngine
from test_voice_clone import FakeTokenizer

GREEDY = dict(max_new_tokens=4, do_sample=False, subtalker_dosample=False)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("clone_serve_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    m = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    m.tokenizer = FakeTokenizer()
    return m


@pytest.fixture(scope="module")
def clone(model):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, ref_text="ref")
    want, _sr = model.generate_voice_clone(
        "hi", prompt, language="english", **GREEDY
    )
    return prompt, want[0]


def test_window_engine_icl_clone_matches_pipeline(model, clone):
    prompt, want = clone
    se, ri, rc = model.clone_prompt_inputs(prompt)
    assert rc is not None  # ICL mode
    engine = ServingEngine(model, max_batch=2, max_wait_ms=5).start()
    try:
        got = engine.submit_text(
            "hi", language="english",
            speaker_embed=se, ref_ids=ri, ref_codes=rc, **GREEDY,
        ).result(timeout=300)
        np.testing.assert_array_equal(want, got)
    finally:
        engine.stop()


def test_continuous_engine_icl_clone_matches_pipeline(model, clone):
    prompt, want = clone
    se, ri, rc = model.clone_prompt_inputs(prompt)
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=4,
        prefill_bucket=128,
    ).start()
    try:
        got = engine.submit_ids(
            model._tokenize(model.build_assistant_text("hi")),
            language="english",
            speaker_embed=se, ref_ids=ri, ref_codes=rc, **GREEDY,
        ).result(timeout=300)
        np.testing.assert_array_equal(want, got)
    finally:
        engine.stop()


def test_continuous_streamed_clone_emits_only_new_audio(model, clone):
    """Ref frames seed the slot's codec context but their audio is never
    emitted — the streamed total is generated frames × upsample only."""
    prompt, _want = clone
    se, ri, rc = model.clone_prompt_inputs(prompt)
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=4,
        prefill_bucket=128,
    ).start()
    chunks = []
    try:
        engine.submit_ids(
            model._tokenize(model.build_assistant_text("hi")),
            language="english",
            speaker_embed=se, ref_ids=ri, ref_codes=rc,
            stream_callback=lambda wav, done: chunks.append(wav),
            **GREEDY,
        ).result(timeout=300)
    finally:
        engine.stop()
    total = int(sum(c.shape[0] for c in chunks))
    up = model.cfg.codec.decode_upsample_rate
    assert total % up == 0
    assert 0 < total // up <= GREEDY["max_new_tokens"]


def _wav_b64(wav: np.ndarray, sr: int) -> str:
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=300)


def test_http_clone_voice_roundtrip(model):
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler

    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=4).start()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(engine, model))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ref = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
        with _post(port, "/clone_voice", {
            "audio": _wav_b64(ref, 24000), "ref_text": "ref",
        }) as r:
            out = json.load(r)
        assert out["icl"] is True
        vid = out["voice"]

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/voices", timeout=60
        ) as r:
            assert vid in json.load(r)["cloned_voices"]

        with _post(port, "/tts", {
            "text": "hi", "language": "english", "voice": vid,
            "max_new_tokens": 4, "do_sample": False,
            "subtalker_dosample": False,
        }) as r:
            body = r.read()
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == model.sample_rate
            assert w.getnframes() > 0

        # Unknown voice id is a client error → 400, consistent with /stream.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/tts", {"text": "hi", "voice": "voice-999"})
        assert e.value.code == 400
    finally:
        server.shutdown()
        engine.stop()


def test_http_instruct_and_non_streaming_fields(model):
    """/tts accepts "instruct" (voice-design path) and "non_streaming"
    (reference modeling_qwen3_tts.py:2203-2227 prompt schema)."""
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler

    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=3).start()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(engine, model))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with _post(port, "/tts", {
            "text": "hi", "language": "english", "speaker": "aiden",
            "instruct": "speak warmly", "non_streaming": True,
            "max_new_tokens": 3, "do_sample": False,
            "subtalker_dosample": False,
        }) as r:
            body = r.read()
        with wave.open(io.BytesIO(body)) as w:
            assert w.getnframes() > 0
    finally:
        server.shutdown()
        engine.stop()


def test_http_trust_model_rejects_paths_and_urls(model, tmp_path):
    """Default trust model (server.make_handler docstring): no server-path /
    URL audio, no voice_file outside --voices-dir — the SSRF/local-file-probe
    surface is closed unless explicitly opted into."""
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler
    from qwen_tts_tpu.voice_prompt import save_voice_clone_prompt

    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    prompt = model.create_voice_clone_prompt(wav, ref_text="ref")
    vdir = tmp_path / "voices"
    vdir.mkdir()
    save_voice_clone_prompt(prompt, str(vdir / "ok.npz"))
    outside = tmp_path / "outside.npz"
    save_voice_clone_prompt(prompt, str(outside))
    wav_path = tmp_path / "ref.wav"
    import wave as _wave
    pcm = np.clip(wav * 32767, -32768, 32767).astype("<i2")
    with _wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(24000)
        w.writeframes(pcm.tobytes())

    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=3).start()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(engine, model, voices_dir=str(vdir)),
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # Server-side file path as 'audio' → 400.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/clone_voice", {"audio": str(wav_path)})
        assert e.value.code == 400
        # URL as 'audio' → 400.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/clone_voice",
                  {"audio": "http://169.254.169.254/latest"})
        assert e.value.code == 400
        # voice_file escaping the voices dir → 400.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/clone_voice",
                  {"voice_file": "../outside.npz"})
        assert e.value.code == 400
        # voice_file inside the voices dir → OK.
        with _post(port, "/clone_voice", {"voice_file": "ok.npz"}) as r:
            assert "voice" in json.load(r)
        # base64 audio still works under the restricted trust model.
        with _post(port, "/clone_voice", {
            "audio": _wav_b64(wav, 24000), "ref_text": "ref",
        }) as r:
            assert "voice" in json.load(r)
    finally:
        server.shutdown()
        engine.stop()


def test_http_voice_file_disabled_without_voices_dir(model, tmp_path):
    from http.server import ThreadingHTTPServer

    from qwen_tts_tpu.server import make_handler

    engine = ServingEngine(model, max_batch=2, max_wait_ms=5,
                           max_new_tokens=3).start()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(engine, model))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/clone_voice", {"voice_file": "/etc/passwd"})
        assert e.value.code == 400
    finally:
        server.shutdown()
        engine.stop()
