#!/usr/bin/env python3
"""HTTP serving client — drive a running `qwen-tts-serve` instance.

Start the server first (continuous batching engine over one TPU program):

    qwen-tts-serve -d /path/to/ckpt --port 8400 --continuous

Then:

    python examples/serving_client.py http://localhost:8400 "Hello there."

Shows all three endpoints: /healthz, one-shot /tts (returns a WAV), and
chunked /stream (PCM16 frames as they are synthesized — the dual-track
streaming path, first packet typically < 100 ms on a warm server).
"""

import json
import struct
import sys
import time
import urllib.request


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "http://localhost:8400"
    text = sys.argv[2] if len(sys.argv) > 2 else "Hello from the TPU engine."

    # ---- health + voices -------------------------------------------------
    with urllib.request.urlopen(f"{base}/healthz") as r:
        print("healthz:", json.load(r))
    with urllib.request.urlopen(f"{base}/voices") as r:
        voices = json.load(r)
    speaker = (voices.get("speakers") or [None])[0]
    print("using speaker:", speaker)

    # ---- one-shot /tts → WAV --------------------------------------------
    body = json.dumps({
        "text": text, "speaker": speaker, "language": "auto",
    }).encode()
    req = urllib.request.Request(
        f"{base}/tts", data=body, headers={"Content-Type": "application/json"}
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req) as r:
        wav_bytes = r.read()
    print(f"/tts: {len(wav_bytes)} WAV bytes in "
          f"{(time.perf_counter() - t0) * 1e3:.0f} ms")
    with open("tts_out.wav", "wb") as f:
        f.write(wav_bytes)

    # ---- streaming /stream → raw PCM16 chunks ----------------------------
    req = urllib.request.Request(
        f"{base}/stream", data=body,
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    first = None
    pcm = bytearray()
    with urllib.request.urlopen(req) as r:
        sr = int(r.headers.get("X-Sample-Rate", "24000"))
        while True:
            chunk = r.read(4096)
            if not chunk:
                break
            if first is None:
                first = time.perf_counter() - t0
            pcm.extend(chunk)
    n = len(pcm) // 2
    print(f"/stream: first packet {first * 1e3:.0f} ms, "
          f"{n / sr:.2f}s audio total")

    # wrap the streamed PCM in a WAV container for playback
    with open("stream_out.wav", "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", 2 * n))
        f.write(bytes(pcm))
    print("wrote tts_out.wav, stream_out.wav")

    # ---- voice clone over HTTP (Base checkpoints) ------------------------
    # python examples/serving_client.py URL "text" ref.wav "ref transcript"
    if len(sys.argv) > 3:
        import base64

        with open(sys.argv[3], "rb") as f:
            audio_b64 = base64.b64encode(f.read()).decode()
        body = json.dumps({
            "audio": audio_b64,
            "ref_text": sys.argv[4] if len(sys.argv) > 4 else None,
        }).encode()
        req = urllib.request.Request(
            f"{base}/clone_voice", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            voice = json.load(r)["voice"]
        print("registered cloned voice:", voice)
        body = json.dumps({"text": text, "voice": voice,
                           "language": "auto"}).encode()
        req = urllib.request.Request(
            f"{base}/tts", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            with open("clone_out.wav", "wb") as f:
                f.write(r.read())
        print("wrote clone_out.wav")
    return 0


if __name__ == "__main__":
    sys.exit(main())
