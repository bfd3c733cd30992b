"""HTTP serving frontend (stdlib only — no web-framework dependency).

Endpoints:
  POST /tts      {"text": ... | "ids": [...], "speaker": ..., "language": ...,
                  "max_new_tokens": ..., "seed": ...} → audio/wav
  POST /stream   single-utterance chunked-transfer streaming WAV-less PCM16
  GET  /healthz  → {"status": "ok", ...stats}
  GET  /voices   → supported speakers/languages

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


def make_handler(engine, model):
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
                self._json(200, {
                    "speakers": model.get_supported_speakers(),
                    "languages": model.get_supported_languages(),
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
            else:
                self._json(404, {"error": "not found"})

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
                    fut = engine.submit_ids(
                        np.asarray(req["ids"], np.int32),
                        speaker=req.get("speaker"),
                        language=req.get("language", "auto"),
                        **self._submit_kwargs(req),
                    )
                elif "text" in req:
                    fut = engine.submit_text(
                        req["text"], speaker=req.get("speaker"),
                        language=req.get("language", "auto"),
                        **self._submit_kwargs(req),
                    )
                else:
                    self._json(400, {"error": "need 'text' or 'ids'"})
                    return
                wav = fut.result(timeout=600)
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

                prompt = build_prompt(
                    model.talker_params, model.cfg, ids,
                    language=req.get("language", "auto"),
                    speaker=req.get("speaker"),
                    st_params=model.subtalker_params,
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
                for wav in self._wav_chunks(prompt, params):
                    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2").tobytes()
                    if not pcm:
                        continue
                    self.wfile.write(f"{len(pcm):X}\r\n".encode())
                    self.wfile.write(pcm + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except BrokenPipeError:
                pass

        def _wav_chunks(self, prompt, params):
            """Audio chunk source: continuous engine slots when available
            (N concurrent /stream clients share ONE compiled decode program,
            each slot streaming independently via its callback), else the
            solo resumable-segment path."""
            if hasattr(engine, "submit_prompt"):
                import queue as _q

                chunks: "_q.Queue" = _q.Queue()
                fut = engine.submit_prompt(
                    prompt, params,
                    stream_callback=lambda wav, done: chunks.put((wav, done)),
                )
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
            else:
                for wav, _sr in model.stream_from_prompt(prompt, params):
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
    p.add_argument("--prefill-bucket", type=int, default=64)
    args = p.parse_args(argv)

    from qwen_tts_tpu.pipeline import Qwen3TTSModel
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = Qwen3TTSModel.from_pretrained(args.model_dir)
    if args.continuous:
        from qwen_tts_tpu.continuous import ContinuousBatchingEngine

        engine = ContinuousBatchingEngine(
            model, num_slots=args.batch, segment_frames=args.segment_frames,
            max_new_tokens=args.max_tokens, prefill_bucket=args.prefill_bucket,
        ).start()
    else:
        from qwen_tts_tpu.serving import ServingEngine

        engine = ServingEngine(
            model, max_batch=args.batch, max_wait_ms=args.max_wait_ms,
            max_new_tokens=args.max_tokens,
        ).start()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(engine, model))
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
