"""Minimal HTTP serving daemon for batched transcription.

The serving layer the reference lacks entirely (SURVEY.md §1). Stdlib-only:
POST /transcribe with a WAV (or raw f32 PCM) body -> JSON segments;
GET /healthz for liveness, GET /statz for batcher counters. Concurrent
requests are MICRO-BATCHED (yoho_tpu.infer.batching): their 30 s windows
share the fixed-batch decode programs instead of serializing behind a lock.

Usage: ``python -m yoho_tpu.cli.serve (--hf ... | --session ...)
[--port 8000] [--batch 8] [--max-wait-ms 25]``
"""

from __future__ import annotations

import argparse
import io
import json
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _decode_wav_bytes(body: bytes, target_sr: int) -> np.ndarray:
    from yoho_tpu.audio.io import resample

    with wave.open(io.BytesIO(body), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return resample(data, sr, target_sr)


def make_handler(transcriber, batcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/statz":
                self._json(200, {
                    "requests_served": batcher.requests_served,
                    "batches_dispatched": batcher.batches_dispatched,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/transcribe", "/transcribe/"):
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if "audio/wav" in ctype or body[:4] == b"RIFF":
                    audio = _decode_wav_bytes(body, transcriber.sample_rate)
                elif "application/octet-stream" in ctype:
                    audio = np.frombuffer(body, dtype=np.float32)
                else:
                    self._json(415, {"error": f"unsupported content type {ctype!r}"})
                    return
                result = batcher.submit(audio)
                self._json(200, {
                    "text": result.text,
                    "language": result.language,
                    "segments": [
                        {"start": s.start, "end": s.end, "text": s.text,
                         "voiceprint": (s.voiceprint.tolist()
                                        if s.voiceprint is not None else None)}
                        for s in result.segments
                    ],
                })
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(transcriber, port: int = 8000, host: str = "127.0.0.1",
          max_wait_ms: float = 25.0):
    from yoho_tpu.infer.batching import MicroBatcher

    batcher = MicroBatcher(transcriber, max_batch=transcriber.batch_size,
                           max_wait_ms=max_wait_ms)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(transcriber, batcher))
    server.batcher = batcher  # so callers/tests can read counters / close
    return server


def main(argv=None):
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Transcription HTTP server")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--hf", type=str)
    src.add_argument("--session", type=str)
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--max-wait-ms", type=float, default=25.0,
                        help="micro-batching window for concurrent requests")
    parser.add_argument("--beams", type=int, default=0)
    parser.add_argument("--language", type=str, default="en")
    parser.add_argument("--int8-kv", action="store_true",
                        help="int8 KV caches (faster, argmax-identical)")
    parser.add_argument("--int8-weights", action="store_true",
                        help="weight-only int8 decoder (near-lossless)")
    parser.add_argument("--vad", action="store_true",
                        help="collapse silence on the host before decoding")
    args = parser.parse_args(argv)

    from yoho_tpu.cli.transcribe import (
        build_whisper_transcriber,
        build_yoho_transcriber,
    )

    if args.hf:
        t = build_whisper_transcriber(args.hf, args.beams, args.batch,
                                      None if args.language == "auto" else args.language,
                                      True,
                                      quantized=args.int8_kv,
                                      int8_weights=args.int8_weights,
                                      vad_filter=args.vad)
    else:
        t = build_yoho_transcriber(args.session, args.root, args.beams,
                                   args.batch, vad_filter=args.vad)

    server = serve(t, args.port, args.host, args.max_wait_ms)
    print(f"serving on http://{args.host}:{args.port} "
          f"(POST /transcribe, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
