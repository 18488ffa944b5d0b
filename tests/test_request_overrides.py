"""Per-request prompt + temperature overrides (OpenAI API parity).

The reference has no serving layer at all; this framework's OpenAI
endpoint initially accepted ``prompt``/``temperature`` and ignored them.
These tests pin the honored semantics: prompts ride the traced prompt
argument at a FIXED padded length (one extra compiled program total,
never one per prompt length), temperatures pool requests per ladder
rung, and entries without overrides decode EXACTLY as before.
"""

import io
import json
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.batching import MicroBatcher
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]


class _WordBackend:
    def __init__(self, words):
        self.word_ids = {w: 100 + i for i, w in enumerate(words)}
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=_WordBackend(WORDS))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    g = np.random.default_rng(0)
    audios = [(0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
              for _ in range(3)]
    return cfg, model, variables, table, audios


def _t(setup, **kw):
    _cfg, model, variables, table, _audios = setup
    base = dict(family="whisper", token_table=table, batch_size=2,
                timestamps=False, language="en")
    base.update(kw)
    return Transcriber(model, variables, **base)


def _tokens(result):
    return [s.tokens for s in result.segments]


# ---------------------------------------------------------------------------
# transcribe_many(prompts=)
# ---------------------------------------------------------------------------

def test_unprompted_entries_unchanged_and_prompted_differ(setup):
    *_, audios = setup
    t = _t(setup)
    plain = t.transcribe_many(audios)
    mixed = t.transcribe_many(audios, prompts=[None, "alpha bravo", None])
    assert _tokens(mixed[0]) == _tokens(plain[0])
    assert _tokens(mixed[2]) == _tokens(plain[2])
    # conditioning visibly changes the decode of the prompted entry
    assert _tokens(mixed[1]) != _tokens(plain[1])


def test_all_prompt_lengths_share_one_program(setup):
    *_, audios = setup
    t = _t(setup)
    t.transcribe_many(audios[:1])  # base program
    n0 = len(t._jitted)
    t.transcribe_many(audios[:1], prompts=["alpha"])
    t.transcribe_many(audios[:1], prompts=["alpha bravo charlie delta"])
    assert len(t._jitted) == n0 + 1, (
        "prompted requests must share ONE fixed-shape program")


def test_prompt_ids_fixed_length_and_padding(setup):
    t = _t(setup)
    tt = t.token_table
    short = t._request_prompt_ids("en", "alpha")
    long = t._request_prompt_ids("en", "alpha bravo charlie")
    assert len(short) == len(long)
    assert short[0] == tt.sot_prev
    # left-padded with sot_prev, context right-aligned before the SOT seq
    sot = tt.sot_sequence("en", "transcribe", timestamps=False)
    assert short[-len(sot):] == list(sot)
    wid = tt.encode_text(" alpha")[0]
    assert short[-len(sot) - 1] == wid
    # over-budget context keeps the TAIL (most recent tokens)
    budget = len(short) - 1 - len(sot)
    over = t._request_prompt_ids("en", " ".join(WORDS * 20))
    ctx = over[1:-len(sot)]
    assert len(ctx) == budget and tt.sot_prev not in ctx


def test_prompt_validation(setup):
    _cfg, model, variables, _table, audios = setup
    bare = WhisperTokenTable(multilingual=True)
    t = Transcriber(model, variables, family="whisper", token_table=bare,
                    batch_size=1, timestamps=False, language="en")
    with pytest.raises(ValueError, match="text backend"):
        t.transcribe_many(audios[:1], prompts=["alpha"])
    t2 = _t(setup)
    with pytest.raises(ValueError, match="entries for"):
        t2.transcribe_many(audios, prompts=["x"])


# ---------------------------------------------------------------------------
# transcribe_many(temperatures=)
# ---------------------------------------------------------------------------

def test_temperature_zero_override_matches_plain_greedy(setup):
    *_, audios = setup
    t = _t(setup)
    plain = t.transcribe_many(audios)
    forced = t.transcribe_many(audios, temperatures=[0.0, None, 0.0])
    for p, f in zip(plain, forced):
        assert _tokens(p) == _tokens(f)


def test_temperature_override_is_deterministic_and_tagged(setup):
    *_, audios = setup
    t = _t(setup)
    a = t.transcribe_many(audios[:1], temperatures=[0.9])[0]
    b = t.transcribe_many(audios[:1], temperatures=[0.9])[0]
    assert _tokens(a) == _tokens(b)
    for seg in a.segments:
        assert seg.temperature == pytest.approx(0.9)


def test_temperature_range_validation(setup):
    *_, audios = setup
    t = _t(setup)
    with pytest.raises(ValueError, match="outside"):
        t.transcribe_many(audios[:1], temperatures=[3.0])
    with pytest.raises(ValueError, match="outside"):
        t.transcribe_many(audios[:1], temperatures=[-0.1])


def test_transcribe_single_call_passthrough(setup):
    *_, audios = setup
    t = _t(setup)
    plain = t.transcribe(audios[0])
    prompted = t.transcribe(audios[0], prompt="bravo")
    assert _tokens(prompted) != _tokens(plain)
    cond = _t(setup, condition_on_previous_text=True, batch_size=1)
    with pytest.raises(ValueError, match="condition_on_previous_text"):
        cond.transcribe(audios[0], prompt="alpha")


# ---------------------------------------------------------------------------
# MicroBatcher plumbing
# ---------------------------------------------------------------------------

def test_microbatcher_forwards_overrides(setup):
    *_, audios = setup
    t = _t(setup)
    want_plain = t.transcribe_many(audios[:1])[0]
    want_prompted = t.transcribe_many(audios[:1], prompts=["alpha"])[0]
    batcher = MicroBatcher(t, max_batch=2, max_wait_ms=5)
    try:
        got_plain = batcher.submit(audios[0])
        got_prompted = batcher.submit(audios[0], prompt="alpha")
        got_temp = batcher.submit(audios[0], temperature=0.0)
    finally:
        batcher.close()
    assert _tokens(got_plain) == _tokens(want_plain)
    assert _tokens(got_prompted) == _tokens(want_prompted)
    assert _tokens(got_temp) == _tokens(want_plain)


def test_continuous_rejects_overrides(setup):
    from yoho_tpu.infer.continuous import ContinuousBatcher

    t = _t(setup)
    batcher = ContinuousBatcher(t, max_batch=2, chunk_tokens=4)
    try:
        with pytest.raises(ValueError, match="micro-batching"):
            batcher.submit(np.zeros(t.chunk_samples, np.float32),
                           prompt="alpha")
        with pytest.raises(ValueError, match="micro-batching"):
            batcher.submit(np.zeros(t.chunk_samples, np.float32),
                           temperature=0.5)
    finally:
        batcher.close()


# ---------------------------------------------------------------------------
# HTTP endpoint (whisper-family server)
# ---------------------------------------------------------------------------

def _wav_bytes(n):
    buf = io.BytesIO()
    pcm = (0.1 * np.random.default_rng(7).standard_normal(n) * 32767
           ).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _multipart(fields):
    boundary = "yohoboundary123"
    parts = []
    for name, (filename, data) in fields.items():
        disp = f'form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        parts.append(
            (f"--{boundary}\r\nContent-Disposition: {disp}\r\n\r\n").encode()
            + data + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return f"multipart/form-data; boundary={boundary}", body


@pytest.fixture(scope="module")
def whisper_server(setup):
    from yoho_tpu.cli.serve import serve

    srv = serve(_t(setup, batch_size=1), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", setup[0]
    srv.shutdown()


def _post(url, fields, path="/v1/audio/transcriptions"):
    ctype, body = _multipart(fields)
    req = urllib.request.Request(url + path, data=body,
                                 headers={"Content-Type": ctype})
    return urllib.request.urlopen(req)


def test_openai_prompt_and_temperature_honored(whisper_server):
    url, cfg = whisper_server
    wav = _wav_bytes(cfg.n_samples)
    with _post(url, {"file": ("a.wav", wav),
                     "response_format": (None, b"verbose_json")}) as r:
        plain = json.load(r)
    with _post(url, {"file": ("a.wav", wav),
                     "prompt": (None, b"alpha bravo"),
                     "response_format": (None, b"verbose_json")}) as r:
        prompted = json.load(r)
    assert [s["tokens"] for s in prompted["segments"]] != \
        [s["tokens"] for s in plain["segments"]]
    # 0.7 snaps DOWN to the 0.6 rung: per-request temperatures are
    # quantized to a bounded rung set (each distinct value is a separate
    # compiled TPU program — see serve._snap_temperature).
    with _post(url, {"file": ("a.wav", wav),
                     "temperature": (None, b"0.7"),
                     "response_format": (None, b"verbose_json")}) as r:
        temp = json.load(r)
    assert all(s["temperature"] == pytest.approx(0.6)
               for s in temp["segments"])


def test_openai_temperature_rejected_when_invalid(whisper_server):
    url, cfg = whisper_server
    wav = _wav_bytes(cfg.n_samples)
    for bad in (b"abc", b"3.5"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"file": ("a.wav", wav), "temperature": (None, bad)})
        assert e.value.code == 400


def test_temperature_snapping_bounds_compiled_programs():
    """Arbitrary floats quantize to the 11-rung grid; 0.0 (the OpenAI SDK
    default) means 'server default' so beam/continuous servers accept it."""
    from yoho_tpu.cli.serve import _snap_temperature, _validate_overrides

    assert _snap_temperature(None) is None
    assert _snap_temperature(0.0) is None       # SDK default -> no override
    assert _snap_temperature(0.05) is None      # rounds to rung 0.0
    assert _snap_temperature(0.31) == pytest.approx(0.4)
    assert _snap_temperature(0.7) == pytest.approx(0.6)  # ties pick lower
    assert _snap_temperature(2.0) == pytest.approx(2.0)
    # The whole float surface collapses to <= 10 distinct programs.
    rungs = {_snap_temperature(i / 100.0) for i in range(201)}
    assert len(rungs - {None}) == 10

    class _Beamy:
        beams = 4
        family = "whisper"

    # temperature=0 on a beam server: snapped to None upstream, so the
    # validator never rejects the SDK default...
    assert _validate_overrides(_Beamy(), False, None,
                               _snap_temperature(0.0)) == ""
    # ...while a real sampling request still gets the 400.
    assert "greedy-only" in _validate_overrides(_Beamy(), False, None, 0.4)


def test_transcribe_many_rejects_temperature_with_beams(setup):
    """The library API refuses (not ignores) sampling temps under beam
    search — stamping an unapplied temperature would misreport decodes."""
    cfg, _model, _variables, _table, audios = setup
    t = _t(setup, beams=2, batch_size=1)
    with pytest.raises(ValueError, match="greedy-only"):
        t.transcribe_many(audios[:1], temperatures=[0.7])
    # Explicit 0.0 (greedy) remains valid — it IS what beam decode does.
    t.transcribe_many(audios[:1], temperatures=[0.0])
