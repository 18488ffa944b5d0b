"""Streaming transcription: incremental push/flush matches offline batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.infer.streaming import StreamingTranscriber
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.text.tokenizer import train_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=16, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world test"] * 3, vocab_size=32 + 3 + 256 + 60,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    t = Transcriber(model, variables, family="yoho", tokenizer=tok, batch_size=1,
                    overlap_seconds=0.05)
    return cfg, t


def test_soft_flush_keeps_session_usable(setup):
    """{"op": "flush"} semantics: soft_flush finalizes everything
    buffered so far and the stream keeps accepting audio (the terminal
    flush() made the next push raise, killing live sessions that
    followed the documented protocol)."""
    cfg, t = setup
    g = np.random.default_rng(3)
    stream = StreamingTranscriber(t)
    chunk = t.chunk_samples
    a = (0.1 * g.standard_normal(chunk + chunk // 2)).astype(np.float32)
    b = (0.1 * g.standard_normal(chunk)).astype(np.float32)
    stream.push(a)
    mid = stream.soft_flush()
    for s in mid:
        assert s.end <= len(a) / t.sample_rate + 1e-6
    n_before = len(stream.segments)
    stream.push(b)  # must NOT raise
    tail = stream.flush()
    # Post-flush segments live on the continued absolute timeline.
    for s in tail:
        assert s.start >= len(a) / t.sample_rate - 1e-6
    assert len(stream.segments) == n_before + len(tail)
    # soft_flush after terminal flush stays a no-op.
    assert stream.soft_flush() == []
    with pytest.raises(RuntimeError):
        stream.push(b)


def test_flush_follows_offline_window_plan(setup):
    """A stream ending exactly on decoded coverage must not decode one
    extra overlap window (regression: flush re-decoded the tail, and the
    final window's unbounded ownership kept any hallucinated segment —
    streamed text diverged from offline on window-multiple audio)."""
    cfg, t = setup
    g = np.random.default_rng(7)

    def counted(n_samples):
        calls = []

        def decoder(window):
            calls.append(len(window))
            return t.transcribe(window).segments

        s = StreamingTranscriber(t, window_decoder=decoder)
        s.push((0.1 * g.standard_normal(n_samples)).astype(np.float32))
        s.flush()
        return calls

    from yoho_tpu.infer.longform import chunk_audio

    for n in (t.chunk_samples,            # exactly one offline window
              t.chunk_samples + 1,        # tail window IS planned
              t.chunk_samples // 2,       # short stream: one partial
              2 * t.stride_samples + t.chunk_samples):
        _w, starts = chunk_audio(
            np.zeros(max(n, t.chunk_samples), np.float32),
            t.chunk_samples, t.stride_samples)
        assert len(counted(n)) == len(starts), n


def test_streaming_matches_offline(setup):
    cfg, t = setup
    g = np.random.default_rng(1)
    audio = (0.1 * g.standard_normal(int(cfg.n_samples * 2.6))).astype(np.float32)

    offline = t.transcribe(audio)

    s = StreamingTranscriber(t)
    collected = []
    # push in awkward chunk sizes
    for i in range(0, len(audio), 1234):
        collected.extend(s.push(audio[i : i + 1234]))
    collected.extend(s.flush())

    off = [(x.start, x.end, x.text) for x in offline.segments]
    stream = [(x.start, x.end, x.text) for x in collected]
    assert stream == off
    assert s.text() == offline.text


def test_streaming_incremental_finalization(setup):
    cfg, t = setup
    s = StreamingTranscriber(t)
    # Less than one window: nothing decodes yet.
    out = s.push(np.zeros(cfg.n_samples // 2, np.float32))
    assert out == [] and s.segments == []
    # Completing the first two windows may finalize window 1.
    s.push(np.zeros(cfg.n_samples * 2, np.float32))
    final = s.flush()
    assert isinstance(final, list)
    # flush is TERMINAL: the decoded tail can't be reconstructed, so a
    # later push would silently decode corrupted windows — it raises.
    assert s.flush() == []  # idempotent re-flush
    with pytest.raises(RuntimeError, match="already flushed"):
        s.push(np.zeros(10, np.float32))


def test_streaming_stitching_with_synthetic_segments(setup, monkeypatch):
    """Force deterministic nonempty segments to truly exercise stitching."""
    cfg, t = setup
    tok = t.tokenizer
    text_ids = tok.encode("hello world")

    def fake_decode(b, mel, prompt=None, temperatures=None):
        # one segment spanning frames 4..20 in every window
        seq = [tok.sot_id, tok.timestamp_id(4), *text_ids,
               tok.timestamp_id(20), tok.voiceprint_id, tok.eot_id]
        tokens = np.full((b, t.max_len), tok.eot_id, np.int32)
        tokens[:, : len(seq)] = seq
        lengths = np.full((b,), len(seq), np.int32)
        aux = {"sum_logprob": np.zeros(b, np.float32),
               "no_speech_prob": np.zeros(b, np.float32)}
        return tokens, lengths, aux

    monkeypatch.setattr(t, "_decode_with_fallback", fake_decode)
    monkeypatch.setattr(t, "_attach_voiceprints", lambda *a, **k: None)

    g = np.random.default_rng(2)
    audio = (0.1 * g.standard_normal(int(cfg.n_samples * 2.3))).astype(np.float32)
    offline = t.transcribe(audio)
    assert offline.segments, "synthetic decode must produce segments"

    s = StreamingTranscriber(t)
    collected = []
    for i in range(0, len(audio), 977):
        collected.extend(s.push(audio[i : i + 977]))
    n_before_flush = len(collected)
    collected.extend(s.flush())

    stream = [(x.start, x.text) for x in collected]
    # every streamed segment is unique and ordered
    assert stream == sorted(set(stream))
    assert n_before_flush >= 1  # some segments finalized before end of stream
    # offline vs streaming cover the same time span with the same text
    assert all(x.text == "hello world" for x in collected)
    assert len(collected) >= len(offline.segments) - 1


def test_streaming_vad_gate_skips_silent_windows(setup, monkeypatch):
    """vad_filter on the wrapped Transcriber gates silent stream windows
    away from the device without shifting the timeline."""
    cfg, t_plain = setup
    t = Transcriber(t_plain.model, t_plain.variables, family="yoho",
                    tokenizer=t_plain.tokenizer, batch_size=1,
                    overlap_seconds=0.05, vad_filter=True)
    calls = {"n": 0}
    orig = t._decode_with_fallback

    def counting(b, mel, prompt=None):
        calls["n"] += 1
        return orig(b, mel, prompt)

    t._decode_with_fallback = counting
    s = StreamingTranscriber(t)

    sr = cfg.sample_rate
    g = np.random.default_rng(2)
    speech = (0.3 * np.sin(2 * np.pi * 440 * np.arange(cfg.n_samples) / sr)
              ).astype(np.float32)
    silence = np.zeros(cfg.n_samples, np.float32)
    # speech window, then several pure-silence windows, then speech.
    for chunk in (speech, silence, silence, silence, speech):
        s.push(chunk)
    s.flush()
    # 5 windows' worth of audio was pushed but only ~the 2 speech windows
    # (plus overlap spill) hit the device.
    assert calls["n"] < 5
    for seg in s.segments:
        assert seg.start <= seg.end


def test_streaming_word_timestamps_absolute():
    """Streaming attaches word timings (whisper family) and offsets them
    to absolute stream time like the segments."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBPE:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) % 150 for c in text]

        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

        def convert_ids_to_tokens(self, ids):
            return [" w"] * len(ids)

    from yoho_tpu.nn.whisper import Whisper

    wcfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_vocab=51865,
                         n_text_ctx=32, chunk_seconds=0.32,
                         n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                         n_text_state=32, n_text_head=4, n_text_layer=1)
    model = Whisper(wcfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, wcfg.n_frames, wcfg.n_mels),
                                     jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBPE())
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, word_timestamps=True,
                    overlap_seconds=0.05)
    s = StreamingTranscriber(t)
    g = np.random.default_rng(3)
    audio = (0.1 * g.standard_normal(int(wcfg.n_samples * 2.4))
             ).astype(np.float32)
    for i in range(0, len(audio), wcfg.n_samples // 2):
        s.push(audio[i : i + wcfg.n_samples // 2])
    s.flush()
    dur = len(audio) / wcfg.sample_rate
    saw_words = False
    for seg in s.segments:
        for w in seg.words or []:
            saw_words = True
            assert 0 <= w.start <= w.end <= dur + wcfg.chunk_seconds
            # Word midpoints sit inside (or near) their segment.
            assert seg.start - 0.2 <= (w.start + w.end) / 2 <= seg.end + 0.2
    assert saw_words or all(not sg.words for sg in s.segments)


def test_partial_segments_absolute_timeline(setup):
    """partial_segments exposes the still-revisable window's hypotheses on
    the absolute timeline; finalized + partial covers everything decoded."""
    cfg, t = setup

    st = StreamingTranscriber(t)
    g = np.random.default_rng(0)
    win = cfg.n_samples
    st.push(0.1 * g.standard_normal(win + win // 2).astype(np.float32))
    partials = st.partial_segments()
    for seg in partials:
        assert seg.end >= seg.start >= 0.0
    final = st.flush()
    assert st.partial_segments() == []  # flush finalizes everything
    assert isinstance(final, list)


def test_streaming_through_shared_batcher_matches_default(setup):
    """window_decoder hook (the server passes its shared request batcher
    so concurrent streams pool into shared batches) produces the same
    finalized tokens as the built-in B=1 window decode."""
    from yoho_tpu.infer.batching import MicroBatcher

    cfg, t = setup
    g = np.random.default_rng(7)
    audio = (0.1 * g.standard_normal(int(cfg.n_samples * 2.6))).astype(np.float32)

    default = StreamingTranscriber(t)
    want = list(default.push(audio)) + list(default.flush())

    mb = MicroBatcher(t, max_batch=2, max_wait_ms=5)
    try:
        def hook(window_audio):
            res = mb.submit(window_audio)
            for s in res.segments:
                s.speaker = None
            return res.segments

        shared = StreamingTranscriber(t, window_decoder=hook)
        got = list(shared.push(audio)) + list(shared.flush())
    finally:
        mb.close()

    assert [s.tokens for s in want] == [s.tokens for s in got]
    assert [round(s.start, 4) for s in want] == \
           [round(s.start, 4) for s in got]


def test_streaming_shared_batcher_vad_not_collapsed_twice():
    """With vad_filter on, the streaming gate vets whole windows; routing
    a vetted window through the shared batcher must NOT collapse it again
    (the batcher is told vad=False per window) — otherwise the hook path
    decodes condensed audio and diverges from the built-in B=1 path."""
    from yoho_tpu.infer.batching import MicroBatcher

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=16, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world test"] * 3,
                          vocab_size=32 + 3 + 256 + 60,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(3)
    mel = jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, tok.vocab_size,
                                    size=(1, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    # VAD thresholds scaled to the toy window (0.34 s): windows with
    # speech PASS the gate yet would collapse non-identically (verified:
    # 2400/5360 samples kept) — the exact double-VAD divergence case.
    from yoho_tpu.audio.vad import VadOptions

    opts = VadOptions(min_speech_ms=30.0, min_silence_ms=40.0,
                      speech_pad_ms=10.0)
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1, overlap_seconds=0.05, vad_filter=True,
                    vad_options=opts)

    # Windows mixing speech and in-window silence: the gate passes them,
    # but offline VAD would condense them — the exact divergence case.
    sr = cfg.sample_rate
    n = int(cfg.n_samples * 2.6)
    audio = 0.0005 * g.standard_normal(n).astype(np.float32)
    tdur = np.arange(int(0.35 * cfg.n_samples)) / sr
    burst = (0.5 * np.sin(2 * np.pi * 440.0 * tdur)).astype(np.float32)
    for start in (0, int(1.2 * cfg.n_samples), int(2.0 * cfg.n_samples)):
        audio[start : start + len(burst)] += burst

    default = StreamingTranscriber(t)
    want = list(default.push(audio)) + list(default.flush())

    mb = MicroBatcher(t, max_batch=2, max_wait_ms=5)
    try:
        def hook(window_audio):
            res = mb.submit(window_audio, vad=False)
            for s in res.segments:
                s.speaker = None
            return res.segments

        shared = StreamingTranscriber(t, window_decoder=hook)
        got = list(shared.push(audio)) + list(shared.flush())
    finally:
        mb.close()

    assert [s.tokens for s in want] == [s.tokens for s in got]
    assert [(s.start, s.end) for s in want] == [(s.start, s.end) for s in got]


def test_partial_interval_early_hypotheses(setup):
    """Opt-in partial_interval_seconds: a provisional hypothesis of the
    INCOMPLETE tail window appears after ~interval seconds of audio —
    without it nothing is decoded until a full window fills (the
    first-partial-latency lever; experiments/streaming_bench.py)."""
    cfg, t = setup
    g = np.random.default_rng(11)
    win = t.chunk_samples
    interval_s = 0.1  # >= the enforced floor; still < the half-window push

    st = StreamingTranscriber(t, partial_interval_seconds=interval_s)
    baseline = StreamingTranscriber(t)
    # Half a window: the plain stream has decoded nothing...
    half = (0.1 * g.standard_normal(win // 2)).astype(np.float32)
    st.push(half)
    baseline.push(half)
    assert baseline.partial_segments() == []
    # ...the partial-interval stream decoded the zero-padded tail.
    assert st._provisional is not None
    provisional = st.partial_segments()
    for seg in provisional:
        assert seg.end >= seg.start >= 0.0
    # Completing the window supersedes the provisional hypothesis: the
    # full-window decode clears it (the pending window now carries the
    # freshest hypothesis; with random weights it may hold 0 segments).
    st.push((0.1 * g.standard_normal(win)).astype(np.float32))
    assert st._provisional is None
    assert len(st._pending) >= 1


def test_partial_interval_finals_bit_identical(setup):
    """Provisional decodes never enter finalization: finals (tokens AND
    timestamps) are identical with and without partial_interval_seconds,
    for both the built-in decode and the window_decoder hook."""
    cfg, t = setup
    g = np.random.default_rng(12)
    audio = (0.1 * g.standard_normal(int(cfg.n_samples * 2.7))).astype(np.float32)

    def run(stream):
        out = []
        for i in range(0, len(audio), 517):
            out.extend(stream.push(audio[i : i + 517]))
        out.extend(stream.flush())
        return out

    want = run(StreamingTranscriber(t))
    got = run(StreamingTranscriber(t, partial_interval_seconds=0.1))
    assert [s.tokens for s in want] == [s.tokens for s in got]
    assert [(s.start, s.end, s.text) for s in want] == \
           [(s.start, s.end, s.text) for s in got]

    calls = []

    def hook(window_audio):
        calls.append(len(window_audio))
        return t.transcribe(window_audio).segments

    got_hook = run(StreamingTranscriber(
        t, window_decoder=hook, partial_interval_seconds=0.1))
    assert [s.tokens for s in want] == [s.tokens for s in got_hook]
    # The hook saw extra (provisional, shorter-than-window) decodes.
    assert any(n < t.chunk_samples for n in calls)


def test_partial_interval_validation(setup):
    cfg, t = setup
    import pytest as _pytest
    with _pytest.raises(ValueError, match="partial_interval_seconds"):
        StreamingTranscriber(t, partial_interval_seconds=0.0)
    with _pytest.raises(ValueError, match="partial_interval_seconds"):
        StreamingTranscriber(t, partial_interval_seconds=-1.0)
    # Sub-frame typos (0.00005 for 0.5) would decode every push frame.
    with _pytest.raises(ValueError, match="partial_interval_seconds"):
        StreamingTranscriber(t, partial_interval_seconds=0.00005)
