"""HTTP serving layer test: real socket round-trip against a tiny model."""

import io
import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.cli.serve import serve
from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.text.tokenizer import train_tokenizer


def _tiny_transcriber(**kw):
    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=16, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world"] * 3, vocab_size=32 + 3 + 256 + 50,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    return Transcriber(model, variables, family="yoho", tokenizer=tok,
                       batch_size=1, **kw)


def _tiny_server():
    """A fresh server instance for lifecycle tests (the module-scoped
    ``server`` fixture must stay up for the other tests)."""
    srv = serve(_tiny_transcriber(), port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    return srv, thread


@pytest.fixture(scope="module")
def server():
    srv, thread = _tiny_server()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert json.load(r)["status"] == "ok"


def test_transcribe_wav_roundtrip(server):
    buf = io.BytesIO()
    pcm = (np.zeros(5360) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    req = urllib.request.Request(
        server + "/transcribe", data=buf.getvalue(),
        headers={"Content-Type": "audio/wav"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        payload = json.load(r)
    assert "text" in payload and "segments" in payload
    assert payload["language"] == "en"


def test_transcribe_raw_f32(server):
    audio = np.zeros(5360, np.float32)
    req = urllib.request.Request(
        server + "/transcribe", data=audio.tobytes(),
        headers={"Content-Type": "application/octet-stream"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        assert "text" in json.load(r)


def test_bad_content_type(server):
    req = urllib.request.Request(
        server + "/transcribe", data=b"junk",
        headers={"Content-Type": "text/plain"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 415


def test_unknown_path(server):
    try:
        urllib.request.urlopen(server + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


# ------------------------------------------------------------- micro-batching
class _FakeTranscriber:
    """Counts transcribe_many calls; returns per-request tags."""

    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def transcribe_many(self, audios, sample_rate=None):
        import time as _t

        if self.delay:
            _t.sleep(self.delay)
        self.calls.append(len(audios))
        return [f"r{float(np.asarray(a).sum()):.0f}" for a in audios]


def test_microbatcher_pools_concurrent_requests():
    from concurrent.futures import ThreadPoolExecutor

    from yoho_tpu.infer.batching import MicroBatcher

    fake = _FakeTranscriber(delay=0.02)
    mb = MicroBatcher(fake, max_batch=8, max_wait_ms=60)
    try:
        with ThreadPoolExecutor(8) as pool:
            futs = [pool.submit(mb.submit, np.full(4, i, np.float32))
                    for i in range(8)]
            results = [f.result(timeout=10) for f in futs]
        assert sorted(results) == sorted(f"r{i * 4}" for i in range(8))
        assert mb.requests_served == 8
        # 8 near-simultaneous requests must NOT take 8 dispatches.
        assert mb.batches_dispatched < 8, fake.calls
        assert max(fake.calls) > 1
    finally:
        mb.close()


def test_microbatcher_propagates_errors():
    from yoho_tpu.infer.batching import MicroBatcher

    class Broken:
        def transcribe_many(self, audios, sample_rate=None):
            raise RuntimeError("boom")

    mb = MicroBatcher(Broken(), max_batch=2, max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            mb.submit(np.zeros(4, np.float32))
        stats = mb.stats()
        # An errored request is FAILED, never served (a dashboard showing
        # 100% served while every request raised hides the outage).
        assert stats["requests_failed"] == 1
        assert stats["requests_served"] == 0
    finally:
        mb.close()


def test_server_concurrent_requests_batch(server):
    """Concurrent POSTs all succeed and /statz shows pooling."""
    from concurrent.futures import ThreadPoolExecutor

    def post():
        body = np.zeros(800, np.float32).tobytes()
        req = urllib.request.Request(
            server + "/transcribe", data=body,
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    with ThreadPoolExecutor(4) as pool:
        results = [f.result(timeout=120) for f in [pool.submit(post)
                                                   for _ in range(4)]]
    assert all("text" in r for r in results)
    with urllib.request.urlopen(server + "/statz") as r:
        stats = json.load(r)
    assert stats["requests_served"] >= 4


# ----------------------------------------------------- OpenAI-compatible API
def _wav_bytes(n=5360, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.zeros(n, np.int16).tobytes())
    return buf.getvalue()


def _multipart(fields):
    """fields: {name: (filename|None, bytes) | [(filename|None, bytes), ...]}
    -> (content_type, body); a list value emits repeated same-name parts
    (OpenAI's ``timestamp_granularities[]``)."""
    boundary = "yohoboundary123"
    parts = []
    for name, value in fields.items():
        for filename, data in (value if isinstance(value, list) else [value]):
            disp = f'form-data; name="{name}"'
            if filename:
                disp += f'; filename="{filename}"'
            parts.append(
                (f"--{boundary}\r\nContent-Disposition: {disp}\r\n\r\n")
                .encode() + data + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return f"multipart/form-data; boundary={boundary}", body


def _post_openai(server, fields, path="/v1/audio/transcriptions"):
    ctype, body = _multipart(fields)
    req = urllib.request.Request(server + path, data=body,
                                 headers={"Content-Type": ctype})
    return urllib.request.urlopen(req)


def test_openai_transcriptions_json(server):
    with _post_openai(server, {"file": ("a.wav", _wav_bytes()),
                               "model": (None, b"whisper-1")}) as r:
        payload = json.load(r)
    assert set(payload) == {"text"}


def test_openai_transcriptions_verbose_json(server):
    with _post_openai(server, {
        "file": ("a.wav", _wav_bytes()),
        "response_format": (None, b"verbose_json"),
    }) as r:
        payload = json.load(r)
    assert payload["task"] == "transcribe"
    assert abs(payload["duration"] - 5360 / 16000) < 1e-3
    for seg in payload["segments"]:
        assert {"id", "seek", "start", "end", "text", "tokens", "temperature",
                "avg_logprob", "compression_ratio",
                "no_speech_prob"} <= set(seg)


def test_openai_transcriptions_text_and_srt(server):
    with _post_openai(server, {"file": ("a.wav", _wav_bytes()),
                               "response_format": (None, b"text")}) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        r.read()
    with _post_openai(server, {"file": ("a.wav", _wav_bytes()),
                               "response_format": (None, b"srt")}) as r:
        body = r.read().decode()
    assert body == "" or "-->" in body


def test_openai_timestamp_granularities(server):
    """OpenAI ``timestamp_granularities[]``: 'word' needs a server started
    with --word-timestamps (400 here); non-verbose_json combos are 400;
    unknown values are 400; the default stays segments-only."""
    # word on a server without the alignment pass -> explicit 400
    try:
        _post_openai(server, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"verbose_json"),
            "timestamp_granularities[]": [(None, b"word")],
        })
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "--word-timestamps" in json.load(e)["error"]["message"]
    # granularities outside verbose_json -> 400
    try:
        _post_openai(server, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"srt"),
            "timestamp_granularities[]": [(None, b"segment"),
                                          (None, b"word")],
        })
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "verbose_json" in json.load(e)["error"]["message"]
    # unknown granularity -> 400
    try:
        _post_openai(server, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"verbose_json"),
            "timestamp_granularities[]": [(None, b"sentence")],
        })
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # explicit segment-only: same shape as the default
    with _post_openai(server, {
        "file": ("a.wav", _wav_bytes()),
        "response_format": (None, b"verbose_json"),
        "timestamp_granularities[]": [(None, b"segment")],
    }) as r:
        payload = json.load(r)
    assert "segments" in payload and "words" not in payload


def test_openai_timestamp_granularities_word_server():
    """On a --word-timestamps server: 'word' yields a top-level words
    array; segments appear only when 'segment' is also requested."""
    srv = serve(_tiny_transcriber(word_timestamps=True), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with _post_openai(base, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"verbose_json"),
            "timestamp_granularities[]": [(None, b"word")],
        }) as r:
            payload = json.load(r)
        assert isinstance(payload.get("words"), list)
        assert "segments" not in payload
        with _post_openai(base, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"verbose_json"),
            "timestamp_granularities[]": [(None, b"word"),
                                          (None, b"segment")],
        }) as r:
            payload = json.load(r)
        assert isinstance(payload.get("words"), list)
        assert isinstance(payload.get("segments"), list)
        # default (no granularities field): segments only, like OpenAI
        with _post_openai(base, {
            "file": ("a.wav", _wav_bytes()),
            "response_format": (None, b"verbose_json"),
        }) as r:
            payload = json.load(r)
        assert "segments" in payload and "words" not in payload
    finally:
        srv.shutdown()


def test_openai_models_listing(server):
    """GET /v1/models lists the single loaded checkpoint as whisper-1
    (OpenAI SDKs list models before first use); the per-model GET works."""
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        payload = json.load(r)
    assert payload["object"] == "list"
    assert payload["data"][0]["id"] == "whisper-1"
    with urllib.request.urlopen(server + "/v1/models/whisper-1",
                                timeout=30) as r:
        assert json.load(r)["id"] == "whisper-1"


def test_openai_transcriptions_sse_stream(server):
    """stream=true -> Server-Sent Events: delta events concatenate to the
    done event's text, which matches the non-streaming transcript."""
    ctype, body = _multipart({"file": ("a.wav", _wav_bytes(48000)),
                              "stream": (None, b"true")})
    req = urllib.request.Request(server + "/v1/audio/transcriptions",
                                 data=body, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        raw = r.read().decode()

    events = []
    for blk in raw.strip().split("\n\n"):
        lines = dict(line.split(": ", 1) for line in blk.splitlines())
        events.append((lines["event"], json.loads(lines["data"])))
    assert events, "no SSE events received"
    etype, done = events[-1]
    assert etype == "transcript.text.done"
    assert done["type"] == "transcript.text.done"
    deltas = [p for e, p in events[:-1] if e == "transcript.text.delta"]
    assert all(p["type"] == "transcript.text.delta" for p in deltas)
    assert "".join(p["delta"] for p in deltas) == done["text"]

    with _post_openai(server, {"file": ("a.wav", _wav_bytes(48000))}) as r2:
        assert json.load(r2)["text"] == done["text"]


def test_openai_translations_rejected_on_transcribe_server(server):
    try:
        _post_openai(server, {"file": ("a.wav", _wav_bytes())},
                     path="/v1/audio/translations")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "transcribe" in json.load(e)["error"]["message"]


def test_openai_bad_requests(server):
    try:
        _post_openai(server, {"model": (None, b"whisper-1")})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "file" in json.load(e)["error"]["message"]
    try:
        _post_openai(server, {"file": ("a.wav", _wav_bytes()),
                              "response_format": (None, b"yaml")})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        _post_openai(server, {"file": ("a.bin", b"\x00\x01garbage")})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 415


# ------------------------------------------------------------ websocket /stream
def test_websocket_framing_roundtrip():
    """Protocol unit test: masked client frames (incl. fragmentation and
    ping) parse into messages; server frames encode all length forms."""
    import io as _io
    import struct

    from yoho_tpu.utils import websocket as ws

    def client_frame(opcode, payload, fin=True, mask=b"\x01\x02\x03\x04"):
        b0 = (0x80 if fin else 0) | opcode
        n = len(payload)
        if n < 126:
            hdr = bytes([b0, 0x80 | n])
        elif n < 1 << 16:
            hdr = bytes([b0, 0x80 | 126]) + struct.pack(">H", n)
        else:
            hdr = bytes([b0, 0x80 | 127]) + struct.pack(">Q", n)
        body = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
        return hdr + mask + body

    out = _io.BytesIO()
    stream = _io.BytesIO(
        client_frame(ws.OP_PING, b"hi")
        + client_frame(ws.OP_TEXT, b"hel", fin=False)
        + client_frame(ws.OP_CONT, b"lo")
        + client_frame(ws.OP_BINARY, b"\x00" * 200)  # 126-form length
        + client_frame(ws.OP_CLOSE, b""))
    assert ws.read_message(stream, out) == (ws.OP_TEXT, b"hello")
    assert out.getvalue()[0] & 0x0F == ws.OP_PONG  # ping answered first
    assert ws.read_message(stream, out) == (ws.OP_BINARY, b"\x00" * 200)
    assert ws.read_message(stream, out) is None  # close
    # server-side writer: long frame uses the 8-byte length form
    big = _io.BytesIO()
    ws.send_binary(big, b"x" * 70000)
    assert big.getvalue()[1] == 127
    assert ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="  # RFC 6455 §1.3 example


def _ws_connect(addr):
    import socket

    host, port = addr
    s = socket.create_connection((host, port), timeout=60)
    req = ("GET /stream HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
           "Connection: Upgrade\r\nSec-WebSocket-Key: AAAAAAAAAAAAAAAAAAAAAA==\r\n"
           "Sec-WebSocket-Version: 13\r\n\r\n")
    s.sendall(req.encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert resp.split(b"\r\n", 1)[0].split()[1] == b"101", resp
    return s


def _ws_send(s, payload, opcode):
    import struct

    mask = b"\x0a\x0b\x0c\x0d"
    n = len(payload)
    if n < 126:
        hdr = bytes([0x80 | opcode, 0x80 | n])
    elif n < 1 << 16:
        hdr = bytes([0x80 | opcode, 0x80 | 126]) + struct.pack(">H", n)
    else:
        hdr = bytes([0x80 | opcode, 0x80 | 127]) + struct.pack(">Q", n)
    s.sendall(hdr + mask + bytes(c ^ mask[i % 4] for i, c in enumerate(payload)))


def _ws_recv(s):
    import struct

    def rx(n):
        buf = b""
        while len(buf) < n:
            d = s.recv(n - len(buf))
            assert d, "server closed mid-frame"
            buf += d
        return buf

    b0, b1 = rx(2)
    ln = b1 & 0x7F
    if ln == 126:
        (ln,) = struct.unpack(">H", rx(2))
    elif ln == 127:
        (ln,) = struct.unpack(">Q", rx(8))
    return b0 & 0x0F, rx(ln)


def test_websocket_stream_session(server):
    """Live /stream session: push PCM in binary frames, end, get a final
    JSON message whose segments mirror an offline transcribe."""
    host, port = server.replace("http://", "").split(":")
    s = _ws_connect((host, int(port)))
    try:
        audio = np.zeros(5360 * 2, np.float32)
        half = audio[: len(audio) // 2]
        _ws_send(s, half.tobytes(), opcode=2)
        _ws_send(s, audio[len(audio) // 2:].tobytes(), opcode=2)
        _ws_send(s, b'{"op": "end"}', opcode=1)
        final = None
        while True:
            op, payload = _ws_recv(s)
            if op == 8:  # close
                break
            msg = json.loads(payload)
            if msg.get("final"):
                final = msg
        assert final is not None
        assert isinstance(final["text"], str)
        for seg in final["segments"]:
            assert {"start", "end", "text"} <= set(seg)
    finally:
        s.close()


def test_websocket_flush_then_more_audio(server):
    """{"op": "flush"} is NON-terminal: audio after a mid-stream flush
    keeps the session alive (the terminal flush() used to make the next
    frame raise and close the connection with an error)."""
    host, port = server.replace("http://", "").split(":")
    s = _ws_connect((host, int(port)))
    try:
        audio = np.zeros(5360, np.float32)
        _ws_send(s, audio.tobytes(), opcode=2)
        _ws_send(s, b'{"op": "flush"}', opcode=1)
        _ws_send(s, audio.tobytes(), opcode=2)  # must not kill the session
        _ws_send(s, b'{"op": "end"}', opcode=1)
        final, errors = None, []
        while True:
            op, payload = _ws_recv(s)
            if op == 8:
                break
            msg = json.loads(payload)
            if "error" in msg:
                errors.append(msg["error"])
            if msg.get("final"):
                final = msg
        assert not errors, errors
        assert final is not None
    finally:
        s.close()


def test_websocket_partial_interval_early_captions():
    """--partial-interval: pushing LESS than one window already yields a
    {"partial": true} message (the provisional tail decode) — without it
    nothing is emitted until a full window fills. Finals unchanged."""
    t = _tiny_transcriber()
    interval_s = 0.1  # >= the enforced floor; < the half-window push
    srv = serve(t, port=0, partial_interval=interval_s)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = srv.server_address[:2]
        s = _ws_connect((host, port))
        try:
            g = np.random.default_rng(5)
            half = (0.1 * g.standard_normal(t.chunk_samples // 2)
                    ).astype(np.float32)
            _ws_send(s, half.tobytes(), opcode=2)
            _ws_send(s, b'{"op": "end"}', opcode=1)
            partials, final = [], None
            while True:
                op, payload = _ws_recv(s)
                if op == 8:
                    break
                msg = json.loads(payload)
                if msg.get("partial"):
                    partials.append(msg)
                if msg.get("final"):
                    final = msg
            assert partials, "no provisional partial before a full window"
            for seg in partials[0]["segments"]:
                assert {"start", "end", "text"} <= set(seg)
            assert final is not None
        finally:
            s.close()
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_websocket_stream_keeps_speaker_names():
    """/stream runs the OnlineSpeakerTracker: finalized segments carry
    STABLE stream-wide speaker ids (with voiceprints) plus the enrolled
    speaker_name — not the meaningless per-window cluster ids."""
    t = _tiny_transcriber()
    n = t.model.cfg.n_samples
    g = np.random.default_rng(6)  # a seed whose decode emits timestamps
    audio = (0.1 * g.standard_normal(2 * n)).astype(np.float32)
    ref = t.transcribe(audio)
    vps = [s.voiceprint for s in ref.segments if s.voiceprint is not None]
    assert vps
    centroid = np.mean(np.stack(vps), axis=0)
    t.enrolled_speakers = {"alice": centroid / np.linalg.norm(centroid)}

    srv = serve(t, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    s = _ws_connect(srv.server_address)
    try:
        _ws_send(s, audio.tobytes(), opcode=2)
        _ws_send(s, b'{"op": "end"}', opcode=1)
        named, ids = [], []
        while True:
            op, payload = _ws_recv(s)
            if op == 8:
                break
            msg = json.loads(payload)
            if msg.get("partial"):
                continue  # partials are revisable; the tracker skips them
            for seg in msg.get("segments", []):
                if "speaker" in seg:
                    ids.append(seg["speaker"])
                if seg.get("speaker_name"):
                    named.append(seg["speaker_name"])
        assert ids and all(isinstance(i, int) for i in ids)
        assert named and set(named) == {"alice"}
    finally:
        s.close()
        srv.shutdown()


def test_websocket_bad_upgrade(server):
    try:
        urllib.request.urlopen(server + "/stream")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_query_strings_ignored_in_routing(server):
    with urllib.request.urlopen(server + "/healthz?probe=1") as r:
        assert json.load(r)["status"] == "ok"
    req = urllib.request.Request(
        server + "/transcribe?sync=1", data=np.zeros(800, np.float32).tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req) as r:
        assert "text" in json.load(r)


def test_websocket_malformed_binary_frame(server):
    """A binary frame that isn't whole float32 samples gets an error
    message, and the session keeps working afterwards."""
    host, port = server.replace("http://", "").split(":")
    s = _ws_connect((host, int(port)))
    try:
        _ws_send(s, b"\x00\x01\x02", opcode=2)  # 3 bytes: not a sample
        op, payload = _ws_recv(s)
        assert op == 1 and "error" in json.loads(payload)
        _ws_send(s, np.zeros(5360, np.float32).tobytes(), opcode=2)
        _ws_send(s, b'{"op": "end"}', opcode=1)
        got_final = False
        while True:
            op, payload = _ws_recv(s)
            if op == 8:
                break
            if json.loads(payload).get("final"):
                got_final = True
        assert got_final
    finally:
        s.close()


# ------------------------------------------------- per-request language
@pytest.fixture(scope="module")
def whisper_server():
    """Tiny multilingual whisper server (real vocab so language ids exist)."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, timestamps=False)
    srv = serve(t, port=0, max_wait_ms=150.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_per_request_language_honored(whisper_server):
    """Two CONCURRENT requests in different languages are answered from
    one compiled program (language rides in the traced prompt): each
    response reports its own language, and /statz shows they pooled."""
    import urllib.error
    from concurrent.futures import ThreadPoolExecutor

    def post(lang):
        with _post_openai(whisper_server, {
            "file": ("a.wav", _wav_bytes(n=5120)),
            "response_format": (None, b"verbose_json"),
            "language": (None, lang.encode()),
        }) as r:
            return json.load(r)

    with ThreadPoolExecutor(2) as pool:
        futs = [pool.submit(post, lang) for lang in ("en", "de")]
        results = [f.result(timeout=300) for f in futs]
    assert [r["language"] for r in results] == ["en", "de"]

    # Unknown language code -> 400, not a wrong-language transcript.
    try:
        post("klingon")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "language" in json.load(e)["error"]["message"]


def test_transcribe_language_query_param(whisper_server):
    body = np.zeros(5120, np.float32).tobytes()
    req = urllib.request.Request(
        whisper_server + "/transcribe?language=fr", data=body,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req) as r:
        assert json.load(r)["language"] == "fr"


def test_continuous_server_speaker_names():
    """serve(continuous=True) composes with enrolled speakers: the slot
    engine finalizes through the shared _finalize_request, so segments
    carry speaker_name exactly like the batched path."""
    t = _tiny_transcriber()
    n = t.model.cfg.n_samples
    g = np.random.default_rng(6)  # a seed whose decode emits timestamps
    audio = (0.1 * g.standard_normal(2 * n)).astype(np.float32)
    ref = t.transcribe(audio)
    vps = [s.voiceprint for s in ref.segments
           if s.voiceprint is not None and s.speaker == 0]
    assert vps
    centroid = np.mean(np.stack(vps), axis=0)
    t.enrolled_speakers = {"alice": centroid / np.linalg.norm(centroid)}

    srv = serve(t, port=0, continuous=True, chunk_tokens=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/transcribe",
            data=audio.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        named = [s for s in payload["segments"] if s.get("speaker") == 0]
        assert named and all(s["speaker_name"] == "alice" for s in named)
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_continuous_server_end_to_end():
    """serve(continuous=True): concurrent requests through the slot
    engine over a real socket, per-request language honored."""
    from concurrent.futures import ThreadPoolExecutor

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, timestamps=False)
    srv = serve(t, port=0, continuous=True, chunk_tokens=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def post(lang):
            body = np.zeros(5120, np.float32).tobytes()
            req = urllib.request.Request(
                base + f"/transcribe?language={lang}", data=body,
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req) as r:
                return json.load(r)

        with ThreadPoolExecutor(3) as pool:
            futs = [pool.submit(post, lang) for lang in ("en", "de", "fr")]
            results = [f.result(timeout=600) for f in futs]
        assert sorted(r["language"] for r in results) == ["de", "en", "fr"]
        with urllib.request.urlopen(base + "/statz") as r:
            stats = json.load(r)
        assert stats["requests_served"] == 3
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_stream_pins_language_never_autodetects():
    """/stream windows must NOT run per-window language auto-detection
    (compile stalls + mid-stream language flip-flop): with no query
    param the stream pins the server default; ?language=xx pins that.
    Regression for routing stream windows through the shared batcher."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    # language=None: HTTP requests auto-detect; streams must not.
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, timestamps=False)
    detects = []
    orig = t.detect_language_many

    def counting(audios):
        detects.append(len(audios))
        return orig(audios)

    t.detect_language_many = counting
    srv = serve(t, port=0, max_wait_ms=10.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        for query in ("", "?language=de"):
            host, port = srv.server_address[:2]
            import socket

            s = socket.create_connection((host, port), timeout=60)
            req = (f"GET /stream{query} HTTP/1.1\r\nHost: x\r\n"
                   "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   "Sec-WebSocket-Key: AAAAAAAAAAAAAAAAAAAAAA==\r\n"
                   "Sec-WebSocket-Version: 13\r\n\r\n")
            s.sendall(req.encode())
            resp = b""
            while b"\r\n\r\n" not in resp:
                resp += s.recv(4096)
            assert resp.split(b"\r\n", 1)[0].split()[1] == b"101", resp
            try:
                _ws_send(s, np.zeros(5120 * 2, np.float32).tobytes(),
                         opcode=2)
                _ws_send(s, b'{"op": "end"}', opcode=1)
                while True:
                    op, payload = _ws_recv(s)
                    if op == 8 or json.loads(payload).get("final"):
                        break
            finally:
                s.close()
        assert detects == [], ("stream windows ran language auto-"
                               f"detection {detects} times")
    finally:
        srv.shutdown()


def test_serve_cli_temperature_fallback_and_gamma_wiring(monkeypatch):
    """`serve --temperature-fallback` reaches the transcriber builder as the
    whisper quality ladder (the feature the --continuous docstring
    advertises), and --gamma < 1 is rejected at the parser."""
    from yoho_tpu.cli import serve as cli

    seen = {}

    def fake_build(*args, **kwargs):
        seen.update(kwargs)

        class _T:  # duck-typed far enough for serve() to be skipped below
            batch_size = 1

        return _T()

    class _Srv:
        class batcher:  # noqa: N801 — instance attr stand-in
            @staticmethod
            def close():
                pass

        def serve_forever(self):
            raise KeyboardInterrupt

        def shutdown(self):
            pass

        def server_close(self):
            pass

    monkeypatch.setattr("yoho_tpu.cli.transcribe.build_whisper_transcriber",
                        fake_build)
    monkeypatch.setattr(cli, "serve", lambda *a, **k: _Srv())
    rc = cli.main(["--hf", "whatever", "--temperature-fallback"])
    assert rc == 0
    assert seen["temperatures"] == (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)

    seen.clear()
    rc = cli.main(["--hf", "whatever"])
    assert rc == 0 and seen["temperatures"] == (0.0,)

    with pytest.raises(SystemExit):
        cli.main(["--hf", "whatever", "--draft-hf", "d", "--gamma", "0"])


def test_microbatcher_backpressure_and_cancel():
    """max_pending rejects fast with ServerOverloaded; a cancelled queued
    request is dropped before dispatch and raises RequestCancelled."""
    from concurrent.futures import ThreadPoolExecutor

    from yoho_tpu.infer.batching import (
        MicroBatcher,
        RequestCancelled,
        ServerOverloaded,
    )

    release = threading.Event()

    class SlowT:
        def transcribe_many(self, audios, sample_rate=None, **kw):
            release.wait(30)
            return ["ok"] * len(audios)

    mb = MicroBatcher(SlowT(), max_batch=1, max_wait_ms=1, max_pending=2)
    try:
        with ThreadPoolExecutor(2) as pool:
            f1 = pool.submit(mb.submit, np.zeros(4, np.float32))
            # wait until the first request is dispatched (worker blocked)
            deadline = 50
            while mb.stats()["queue_depth"] == 0 and mb.inflight < 1 \
                    and deadline:
                time.sleep(0.05)
                deadline -= 1
            f2 = pool.submit(mb.submit, np.zeros(4, np.float32))
            while mb.inflight < 2 and deadline:
                time.sleep(0.05)
                deadline -= 1
            with pytest.raises(ServerOverloaded):
                mb.submit(np.zeros(4, np.float32))
            assert mb.stats()["requests_rejected"] == 1

            # cancel: a queued (not yet dispatched) request is dropped
            # fast even while the worker is stuck (cap raised so the
            # submission itself is admitted)
            mb.max_pending = 3
            t0 = time.monotonic()
            with pytest.raises(RequestCancelled):
                mb.submit(np.zeros(4, np.float32),
                          cancelled=lambda: True)
            assert time.monotonic() - t0 < 5
            assert mb.stats()["requests_cancelled"] >= 1

            release.set()
            assert f1.result(timeout=10) == "ok"
            assert f2.result(timeout=10) == "ok"
        stats = mb.stats()
        assert stats["inflight"] == 0
        assert stats["p50_ms"] is not None
    finally:
        release.set()
        mb.close()


def test_server_overload_503_and_statz_fallback():
    """The HTTP layer maps ServerOverloaded to 503 + Retry-After, and
    /statz still works for duck-typed batchers without stats()."""
    from yoho_tpu.cli.serve import make_handler
    from yoho_tpu.infer.batching import ServerOverloaded

    class DuckT:
        sample_rate = 16000

    class OverloadB:
        requests_served = 7
        batches_dispatched = 3

        def submit(self, audio, language=None, cancelled=None):
            raise ServerOverloaded("full up")

    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(DuckT(), OverloadB()))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/transcribe", data=np.zeros(4, np.float32).tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 503
        assert ei.value.headers["Retry-After"] == "1"

        with urllib.request.urlopen(url + "/statz", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats == {"requests_served": 7, "batches_dispatched": 3}
    finally:
        srv.shutdown()


def test_statz_extended(server):
    """The real batcher's /statz carries depth + latency percentiles."""
    with urllib.request.urlopen(server + "/statz", timeout=10) as r:
        stats = json.loads(r.read())
    for key in ("requests_served", "requests_rejected",
                "requests_cancelled", "inflight", "queue_depth",
                "p50_ms", "p95_ms", "p99_ms"):
        assert key in stats, stats


def test_drain_with_open_websocket_stream():
    """Graceful drain must not hang on a connected /stream client: its
    websocket read has no timeout, so drain() closes stream sockets
    before the bounded handler-thread join."""
    from yoho_tpu.cli.serve import drain

    srv, thread = _tiny_server()
    host, port = srv.server_address
    s = _ws_connect((host, port))
    deadline = time.monotonic() + 30
    while not srv.stream_conns and time.monotonic() < deadline:
        time.sleep(0.01)  # handler registers after the 101 handshake
    assert srv.stream_conns, "stream never registered for drain"
    t0 = time.monotonic()
    drain(srv, timeout_s=15)
    assert time.monotonic() - t0 < 60
    thread.join(timeout=10)
    assert not thread.is_alive()
    s.close()


def test_stream_rides_out_transient_overload():
    """A transient ServerOverloaded from the shared batcher must not
    tear down a live stream (which holds unreconstructable session
    state) — the stream waits and retries instead."""
    from yoho_tpu.cli.serve import drain
    from yoho_tpu.infer.batching import ServerOverloaded

    srv, _thread = _tiny_server()
    try:
        orig = srv.batcher.submit
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ServerOverloaded("transient")
            return orig(*a, **kw)

        srv.batcher.submit = flaky
        s = _ws_connect(srv.server_address)
        _ws_send(s, np.zeros(5360, np.float32).tobytes(), opcode=2)
        _ws_send(s, b'{"op": "end"}', opcode=1)
        got_final, got_error = False, False
        while True:
            op, payload = _ws_recv(s)
            if op == 8:
                break
            msg = json.loads(payload)
            got_error = got_error or "error" in msg
            got_final = got_final or bool(msg.get("final"))
        assert got_final and not got_error, (got_final, got_error)
        assert calls["n"] >= 2, "retry never happened"
        s.close()
    finally:
        drain(srv, timeout_s=15)


def test_transcribe_segments_carry_speaker_name_when_enrolled():
    """A server whose transcriber has enrolled speakers returns
    ``speaker_name`` on /transcribe segments, matched from the diarized
    cluster centroid (``yoho enroll`` -> ``serve --speakers``)."""
    t = _tiny_transcriber()
    n = t.model.cfg.n_samples
    g = np.random.default_rng(6)  # a seed whose decode emits timestamps
    audio = (0.1 * g.standard_normal(2 * n)).astype(np.float32)
    ref = t.transcribe(audio)
    vps = [s.voiceprint for s in ref.segments
           if s.voiceprint is not None and s.speaker == 0]
    assert vps, "forced-slot extraction should give cluster-0 voiceprints"
    centroid = np.mean(np.stack(vps), axis=0)
    t.enrolled_speakers = {"alice": centroid / np.linalg.norm(centroid)}

    srv = serve(t, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/transcribe",
            data=audio.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        named = [s for s in payload["segments"] if s.get("speaker") == 0]
        assert named and all(s["speaker_name"] == "alice" for s in named)
    finally:
        srv.shutdown()


def test_metrics_prometheus_exposition(server):
    """GET /metrics renders the /statz numbers in Prometheus text format."""
    # Drive one request so the counters are non-zero.
    audio = np.zeros(5360, np.float32)
    req = urllib.request.Request(
        server + "/transcribe", data=audio.tobytes(),
        headers={"Content-Type": "application/octet-stream"}, method="POST")
    urllib.request.urlopen(req).read()
    with urllib.request.urlopen(server + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE yoho_requests_served_total counter" in body
    served = [ln for ln in body.splitlines()
              if ln.startswith("yoho_requests_served_total ")]
    assert served and int(served[0].split()[-1]) >= 1
    assert 'yoho_request_latency_seconds{quantile="0.99"}' in body
    # Numbers agree with /statz.
    with urllib.request.urlopen(server + "/statz") as r:
        statz = json.load(r)
    assert int(served[0].split()[-1]) == statz["requests_served"]


def test_warmup_compiles_serving_path():
    """warmup(server) pushes one silent window through the batcher (the
    exact request path), so the compiled programs are cached before the
    first real request; the server then serves normally."""
    from yoho_tpu.cli.serve import warmup

    t = _tiny_transcriber()
    srv = serve(t, port=0)
    warmup(srv)
    # The synthetic request is excluded from /statz (its latency is the
    # compile time, not a serving latency).
    assert srv.batcher.requests_served == 0
    assert srv.batcher.batches_dispatched == 0
    assert len(srv.batcher._latencies) == 0
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        audio = np.zeros(t.chunk_samples, np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/transcribe",
            data=audio.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with urllib.request.urlopen(req) as r:
            assert "text" in json.load(r)
    finally:
        srv.shutdown()


def test_negative_max_pending_rejected():
    import yoho_tpu.cli.serve as cli

    with pytest.raises(SystemExit):
        cli.main(["--hf", "whatever", "--max-pending", "-1"])


def test_serve_cli_mesh_wiring(monkeypatch):
    """`serve --mesh 2x4` builds a (data=2, model=4) Mesh and hands it to
    the transcriber builder (multi-chip tensor-parallel serving); bad
    specs are rejected before model loading."""
    from yoho_tpu.cli import serve as cli

    seen = {}

    def fake_build(*args, **kwargs):
        seen.update(kwargs)

        class _T:
            batch_size = 1

        return _T()

    class _Srv:
        class batcher:  # noqa: N801 — instance attr stand-in
            @staticmethod
            def close():
                pass

        def serve_forever(self):
            raise KeyboardInterrupt

        def shutdown(self):
            pass

        def server_close(self):
            pass

    monkeypatch.setattr("yoho_tpu.cli.transcribe.build_whisper_transcriber",
                        fake_build)
    monkeypatch.setattr(cli, "serve", lambda *a, **k: _Srv())
    rc = cli.main(["--hf", "whatever", "--mesh", "2x4"])
    assert rc == 0
    mesh = seen["mesh"]
    assert dict(mesh.shape) == {"data": 2, "model": 4}

    seen.clear()
    rc = cli.main(["--hf", "whatever"])
    assert rc == 0 and seen["mesh"] is None

    with pytest.raises(ValueError, match="DATAxMODEL"):
        cli.main(["--hf", "whatever", "--mesh", "8"])
