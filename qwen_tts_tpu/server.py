"""HTTP serving frontend (stdlib only — no web-framework dependency).

Endpoints:
  POST /tts      {"text": ... | "ids": [...], "speaker": ..., "language": ...,
                  "instruct": ..., "voice": <cloned-voice id>,
                  "non_streaming": ..., "max_new_tokens": ..., "seed": ...}
                 → audio/wav
  POST /clone_voice  {"audio": <base64 WAV | URL | server path> |
                      {"pcm": [...], "sample_rate": N},
                      "ref_text": ..., "x_vector_only": ...}
                     → {"voice": id}  (register a cloned voice; or load a
                     saved voice file via {"voice_file": <server path>})
  POST /stream   single-utterance chunked-transfer streaming WAV-less PCM16
                 (same body as /tts incl. "voice")
  GET  /healthz  → {"status": "ok", ...stats}
  GET  /voices   → supported speakers/languages + registered cloned voices

Run:  python -m qwen_tts_tpu.server -d MODEL_DIR [--port 8000] [--batch 8]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    pcm = np.clip(np.asarray(samples, np.float32) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_handler(engine, model, *, voices_dir=None, allow_local_audio=False):
    """``voices_dir``/``allow_local_audio`` define the endpoint trust model:
    by default /clone_voice accepts only base64/data-URI or inline-PCM audio
    and rejects server paths and URLs (a path/URL form would let any HTTP
    client probe local files or make the server fetch arbitrary URLs —
    SSRF). 'voice_file' loads are restricted to ``voices_dir`` when set and
    rejected entirely when not. ``allow_local_audio`` opts back into
    path/URL forms for trusted localhost-only deployments."""
    import os
    import threading

    voices: dict = {}  # cloned-voice id → voice_clone_prompt dict
    voices_lock = threading.Lock()
    voices_root = os.path.realpath(voices_dir) if voices_dir else None

    def _check_voice_file(path: str) -> str:
        if allow_local_audio:
            return path
        if voices_root is None:
            raise ValueError(
                "'voice_file' loading is disabled — start the server with "
                "--voices-dir DIR (or --allow-local-audio) to enable it"
            )
        real = os.path.realpath(os.path.join(voices_root, path))
        if not (real == voices_root
                or real.startswith(voices_root + os.sep)):
            raise ValueError("'voice_file' must be inside the voices dir")
        return real

    def _check_audio(audio):
        if allow_local_audio or not isinstance(audio, str):
            return audio
        from qwen_tts_tpu.audio import _is_probably_base64, _is_url

        if _is_url(audio) or (not _is_probably_base64(audio)
                              and os.path.exists(audio)):
            raise ValueError(
                "path/URL audio forms are rejected over HTTP — send base64, "
                "a data: URI, or {'pcm': [...], 'sample_rate': N} (or start "
                "the server with --allow-local-audio)"
            )
        return audio

    class Handler(BaseHTTPRequestHandler):
        # Chunked transfer framing is an HTTP/1.1 feature; the stdlib default
        # (HTTP/1.0) would make read-to-EOF clients see raw chunk-size lines
        # interleaved with the PCM payload.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", **engine.stats})
            elif self.path == "/voices":
                with voices_lock:
                    cloned = sorted(voices)
                self._json(200, {
                    "speakers": model.get_supported_speakers(),
                    "languages": model.get_supported_languages(),
                    "cloned_voices": cloned,
                })
            elif self.path in ("/", "/index.html"):
                import os

                page = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "web", "index.html",
                )
                try:
                    with open(page, "rb") as f:
                        body = f.read()
                except OSError:
                    self._json(404, {"error": "web client not found"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def _read_body(self):
            length = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(length) or b"{}")

        def do_POST(self):
            try:
                req = self._read_body()
            except Exception:
                self._json(400, {"error": "invalid JSON"})
                return
            if self.path == "/tts":
                self._tts(req)
            elif self.path == "/stream":
                self._stream(req)
            elif self.path == "/clone_voice":
                self._clone_voice(req)
            else:
                self._json(404, {"error": "not found"})

        def _clone_voice(self, req):
            """Register a cloned voice for later /tts | /stream use
            (reference demo's Save Voice flow, cli/demo.py:452-583, as a
            serving endpoint)."""
            try:
                if "voice_file" in req:
                    prompt = model.load_voice_clone_prompt(
                        _check_voice_file(req["voice_file"])
                    )
                elif "audio" in req:
                    audio = _check_audio(req["audio"])
                    if isinstance(audio, dict):
                        import numpy as _np

                        audio = (_np.asarray(audio["pcm"], _np.float32),
                                 int(audio["sample_rate"]))
                    prompt = model.create_voice_clone_prompt(
                        audio,
                        ref_text=req.get("ref_text"),
                        sample_rate=None,
                        x_vector_only_mode=bool(req.get("x_vector_only",
                                                        False)),
                    )
                else:
                    self._json(400,
                               {"error": "need 'audio' or 'voice_file'"})
                    return
            except Exception as exc:
                self._json(400, {"error": str(exc)})
                return
            with voices_lock:
                vid = f"voice-{len(voices) + 1}"
                voices[vid] = prompt
            self._json(200, {
                "voice": vid,
                "icl": bool(prompt["icl_mode"][0]),
            })

        def _clone_kwargs(self, req):
            """Resolve 'voice'/'instruct'/'non_streaming' request fields into
            submit_ids kwargs (shared by /tts and /stream)."""
            kw = {}
            vid = req.get("voice")
            if vid is not None:
                with voices_lock:
                    prompt = voices.get(vid)
                if prompt is None:
                    raise KeyError(f"unknown voice {vid!r} (POST /clone_voice"
                                   " first)")
                se, ri, rc = model.clone_prompt_inputs(prompt)
                kw.update(speaker_embed=se, ref_ids=ri, ref_codes=rc)
            instruct = req.get("instruct")
            if instruct:
                kw["instruct_ids"] = model._tokenize(
                    model.build_instruct_text(instruct)
                )
            if req.get("non_streaming"):
                kw["non_streaming"] = True
            return kw

        def _submit_kwargs(self, req):
            kw = {}
            for k in ("max_new_tokens", "seed", "top_k", "top_p", "temperature",
                      "repetition_penalty", "do_sample", "subtalker_dosample",
                      "subtalker_top_k", "subtalker_top_p",
                      "subtalker_temperature"):
                if k in req:
                    kw[k] = req[k]
            return kw

        def _tts(self, req):
            try:
                if "ids" in req:
                    ids = np.asarray(req["ids"], np.int32)
                elif "text" in req:
                    ids = model._tokenize(
                        model.build_assistant_text(req["text"])
                    )
                else:
                    self._json(400, {"error": "need 'text' or 'ids'"})
                    return
                # Client errors (unknown voice/speaker/language, bad ids)
                # resolve before submission → 400, matching /stream.
                clone_kw = self._clone_kwargs(req)
            except (KeyError, ValueError) as exc:
                self._json(400, {"error": str(exc)})
                return
            except Exception as exc:
                self._json(500, {"error": str(exc)})
                return
            try:
                fut = engine.submit_ids(
                    ids,
                    speaker=req.get("speaker"),
                    language=req.get("language", "auto"),
                    **clone_kw,
                    **self._submit_kwargs(req),
                )
                wav = fut.result(timeout=600)
            except ValueError as exc:
                self._json(400, {"error": str(exc)})
                return
            except Exception as exc:
                self._json(500, {"error": str(exc)})
                return
            body = _wav_bytes(wav, model.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream(self, req):
            """Chunked raw PCM16 stream (single utterance, low latency)."""
            try:
                params = model._merge_params(**self._submit_kwargs(req))
                if "ids" in req:
                    ids = np.asarray(req["ids"], np.int32)
                elif "text" in req:
                    ids = model._tokenize(
                        model.build_assistant_text(req["text"])
                    )
                else:
                    self._json(400, {"error": "need 'text' or 'ids'"})
                    return
                from qwen_tts_tpu.generate import build_prompt

                clone_kw = self._clone_kwargs(req)
                ref_codes = clone_kw.pop("ref_codes", None)
                prompt = build_prompt(
                    model.talker_params, model.cfg, ids,
                    language=req.get("language", "auto"),
                    speaker=req.get("speaker"),
                    ref_codes=ref_codes,
                    st_params=model.subtalker_params,
                    **clone_kw,
                )
            except Exception as exc:
                self._json(400, {"error": str(exc)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("X-Sample-Rate", str(model.sample_rate))
            self.end_headers()
            try:
                for wav in self._wav_chunks(prompt, params, ref_codes):
                    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2").tobytes()
                    if not pcm:
                        continue
                    self.wfile.write(f"{len(pcm):X}\r\n".encode())
                    self.wfile.write(pcm + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except BrokenPipeError:
                pass

        def _wav_chunks(self, prompt, params, ref_codes=None):
            """Audio chunk source: continuous engine slots when available
            (N concurrent /stream clients share ONE compiled decode program,
            each slot streaming independently via its callback; ICL ref
            codes condition each chunk's codec left context), else the solo
            resumable-segment path (generation is still voice-cloned via the
            ICL prompt; ref codec context applies from the engine path)."""
            if hasattr(engine, "submit_prompt"):
                import queue as _q

                chunks: "_q.Queue" = _q.Queue()
                fut = engine.submit_prompt(
                    prompt, params,
                    stream_callback=lambda wav, done: chunks.put((wav, done)),
                    ref_codes=ref_codes,
                )
                try:
                    while True:
                        try:
                            wav, done = chunks.get(timeout=5.0)
                        except _q.Empty:
                            # Slot died without a final callback (its future
                            # resolves with the exception) — end the stream.
                            if fut.done():
                                return
                            continue
                        if wav.size:
                            yield wav
                        if done:
                            return
                finally:
                    # Client disconnect (BrokenPipeError closes the
                    # generator): reclaim the slot instead of letting it
                    # decode to its full budget.
                    if not fut.done() and hasattr(engine, "cancel"):
                        engine.cancel(fut)
            else:
                for wav, _sr in model.stream_from_prompt(
                    prompt, params, ref_codes=ref_codes
                ):
                    yield wav

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen-tts-serve")
    p.add_argument("-d", dest="model_dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=30.0)
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--continuous", action="store_true",
                   help="per-slot continuous batching (requests join live "
                        "decode slots) instead of window batching")
    p.add_argument("--segment-frames", type=int, default=25)
    p.add_argument("--prefill-bucket", default="64",
                   help="prefill bucket, or comma list e.g. 64,256 (long "
                        "ICL clone prompts pad to the smallest fitting "
                        "bucket; one compiled prefill program per bucket)")
    p.add_argument("--voices-dir", default=None,
                   help="directory 'voice_file' loads are restricted to "
                        "(disabled when unset — see make_handler trust model)")
    p.add_argument("--allow-local-audio", action="store_true",
                   help="accept server-path/URL audio + arbitrary voice_file "
                        "paths over HTTP (trusted localhost deployments only)")
    p.add_argument("--serving-int8", action="store_true",
                   help="int8 serving mode: quantize both trunks + stacked "
                        "sub-talker tables (throughput; changes numerics — "
                        "greedy traces differ from the bf16 parity default)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 talker KV cache (the capacity option for long "
                        "token budgets / large slot pools; serving numerics)")
    args = p.parse_args(argv)

    from qwen_tts_tpu.pipeline import Qwen3TTSModel
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(args.model_dir)
    if args.serving_int8:
        model.quantize_for_serving(talker=True, kv=args.kv_int8)
    elif args.kv_int8:
        model.kv_int8 = True  # cache-only (no weight quantization)
    if args.continuous:
        from qwen_tts_tpu.continuous import ContinuousBatchingEngine

        buckets = tuple(
            int(b) for b in str(args.prefill_bucket).split(",") if b
        )
        engine = ContinuousBatchingEngine(
            model, num_slots=args.batch, segment_frames=args.segment_frames,
            max_new_tokens=args.max_tokens,
            prefill_bucket=buckets if len(buckets) > 1 else buckets[0],
        ).start()
    else:
        from qwen_tts_tpu.serving import ServingEngine

        engine = ServingEngine(
            model, max_batch=args.batch, max_wait_ms=args.max_wait_ms,
            max_new_tokens=args.max_tokens,
        ).start()
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(engine, model, voices_dir=args.voices_dir,
                     allow_local_audio=args.allow_local_audio),
    )
    print(f"qwen-tts-serve listening on {args.host}:{args.port}",
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
