"""Voice-activity detection + silence collapsing (yoho_tpu.audio.vad).

The reference has no VAD (long audio was only ever split offline by
``train/tools/split_transcribed_tracks.py``); this is a serving feature of
the rebuild, so the tests are behavioral: synthetic tone/silence signals
with known speech spans, map round-trips, and the Transcriber integration
(fewer windows decoded, timestamps restored to the source timeline).
"""

import numpy as np
import pytest

from yoho_tpu.audio.vad import (
    SpeechMap,
    VadOptions,
    collapse_silence,
    detect_speech,
)

SR = 16000


def tone(seconds, freq=440.0, amp=0.3, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(seconds, sr=SR):
    return np.zeros(int(seconds * sr), np.float32)


def test_detect_speech_two_bursts():
    audio = np.concatenate([silence(3), tone(2), silence(5), tone(1.5), silence(3)])
    spans = detect_speech(audio, SR)
    assert len(spans) == 2
    (s0, e0), (s1, e1) = spans
    # Within pad tolerance (300 ms pad + 30 ms frame) of the true spans.
    tol = int(0.4 * SR)
    assert abs(s0 - 3 * SR) < tol and abs(e0 - 5 * SR) < tol
    assert abs(s1 - 10 * SR) < tol and abs(e1 - 11.5 * SR) < tol
    assert all(s < e for s, e in spans)


def test_detect_speech_all_silent():
    assert detect_speech(silence(10), SR) == []
    assert detect_speech(np.zeros(0, np.float32), SR) == []
    # Low-level noise with no structure stays below the absolute floor.
    g = np.random.default_rng(0)
    noise = (g.standard_normal(10 * SR) * 1e-4).astype(np.float32)
    assert detect_speech(noise, SR) == []


def test_short_pause_not_split():
    # 0.4 s gap < min_silence_ms=1000 -> one region.
    audio = np.concatenate([tone(1), silence(0.4), tone(1)])
    spans = detect_speech(audio, SR)
    assert len(spans) == 1


def test_click_rejected():
    # 50 ms blip < min_speech_ms=250 -> dropped.
    audio = np.concatenate([silence(2), tone(0.05), silence(2)])
    assert detect_speech(audio, SR) == []


def test_collapse_and_map_roundtrip():
    audio = np.concatenate([silence(10), tone(2, freq=300), silence(20),
                            tone(3, freq=500), silence(10)])
    condensed, vmap = collapse_silence(audio, SR)
    # Collapsed audio is roughly the 5 s of speech (+pads), far below 45 s.
    assert 4.5 <= vmap.speech_seconds <= 7.0
    assert len(condensed) == vmap.condensed_samples
    # A condensed time inside the first chunk maps near the first burst.
    t0 = vmap.to_original(0.5)
    assert 9.5 <= t0 <= 11.0
    # A condensed time inside the second chunk maps near the second burst
    # (which starts at 10 + 2 + 20 = 32 s in the source).
    c0_len = vmap.chunks[0][2] / SR
    t1 = vmap.to_original(c0_len + 0.5)
    assert 31.5 <= t1 <= 33.0
    # Monotone, and times past the end clamp into the source audio.
    ts = [vmap.to_original(x) for x in np.linspace(0, 60, 50)]
    assert all(b >= a for a, b in zip(ts, ts[1:]))
    assert ts[-1] <= len(audio) / SR


def test_collapse_all_silent():
    condensed, vmap = collapse_silence(silence(30), SR)
    assert len(condensed) == 0
    assert vmap.chunks == []
    assert vmap.to_original(1.0) == 0.0


def test_map_exact_identity_inside_chunks():
    vmap = SpeechMap(chunks=[(0, 16000, 8000), (8000, 64000, 16000)],
                     sample_rate=SR, original_samples=100000)
    assert vmap.to_original(0.0) == pytest.approx(1.0)
    assert vmap.to_original(0.25) == pytest.approx(1.25)
    assert vmap.to_original(0.5) == pytest.approx(4.0)   # second chunk start
    assert vmap.to_original(1.0) == pytest.approx(4.5)
    assert vmap.to_original(99.0) == pytest.approx(5.0)  # clamped to end


def test_transcriber_vad_skips_silent_windows():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import train_tokenizer

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world this is a test"] * 5,
                          vocab_size=1024 + 256 + 35 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len))),
        jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                    .astype(np.float32)),
        method=YOHOModel.forward_with_voiceprints,
    )

    # Mostly silence: ~1 window of speech inside ~20 windows of audio.
    win_s = cfg.n_samples / cfg.sample_rate
    audio = np.concatenate([
        silence(8 * win_s, cfg.sample_rate),
        tone(0.8 * win_s, sr=cfg.sample_rate),
        silence(11 * win_s, cfg.sample_rate),
    ])

    counts = {}

    def counting(t):
        orig = t._decode_with_fallback

        def wrapped(b, mel, prompt=None, **kw):
            counts[id(t)] = counts.get(id(t), 0) + 1
            return orig(b, mel, prompt, **kw)

        t._decode_with_fallback = wrapped
        return t

    t_plain = counting(Transcriber(model, variables, family="yoho",
                                   tokenizer=tok, batch_size=2))
    t_vad = counting(Transcriber(model, variables, family="yoho",
                                 tokenizer=tok, batch_size=2,
                                 vad_filter=True))
    r_plain = t_plain.transcribe(audio)
    r_vad = t_vad.transcribe(audio)
    assert counts[id(t_vad)] < counts[id(t_plain)]
    # Timestamps stay on the source timeline (inside the audio).
    dur = len(audio) / cfg.sample_rate
    for seg in r_vad.segments:
        assert 0 <= seg.start <= seg.end <= dur + 1e-6
    assert isinstance(r_vad.text, str)


def test_transcriber_vad_all_silence_no_decode():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import train_tokenizer

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world"] * 5,
                          vocab_size=1024 + 256 + 35 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_text_len), jnp.int32),
        jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32),
        method=YOHOModel.forward_with_voiceprints,
    )
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=2, vad_filter=True)

    def boom(*a, **k):  # the device must never be touched
        raise AssertionError("decode called on all-silent audio")

    t._decode_with_fallback = boom
    result = t.transcribe(silence(5 * cfg.n_samples / cfg.sample_rate,
                                  cfg.sample_rate))
    assert result.text == ""
    assert result.segments == []


def test_all_speech_window_detected():
    """A window that is entirely speech must not be rejected by the
    adaptive threshold (regression: the noise-floor percentile lands on
    speech energy when no silence exists to estimate from)."""
    spans = detect_speech(tone(0.335), SR)
    assert len(spans) == 1
    s, e = spans[0]
    assert s == 0 and e == len(tone(0.335))


def test_loud_frames_always_speech_quiet_always_silence():
    # -13 dBFS tone -> speech even without contrast; digital silence never.
    assert detect_speech(tone(2.0, amp=0.3), SR)
    assert detect_speech(silence(2.0), SR) == []


def test_short_utterance_near_speech_is_kept():
    """min_speech filtering runs AFTER merging: a short burst within
    merge range of neighboring speech survives (an isolated click does
    not)."""
    import numpy as np

    from yoho_tpu.audio.vad import VadOptions, detect_speech

    sr = 16000
    g = np.random.default_rng(0)
    audio = 0.0005 * g.standard_normal(sr * 10).astype(np.float32)

    def burst(t0, dur):
        s = int(t0 * sr)
        n = int(dur * sr)
        audio[s:s + n] += (0.3 * g.standard_normal(n)).astype(np.float32)

    burst(2.0, 1.0)     # main speech
    burst(3.5, 0.15)    # short "yes" 500 ms after — inside merge range
    opts = VadOptions(min_speech_ms=250.0, min_silence_ms=1000.0,
                      speech_pad_ms=100.0)
    spans = detect_speech(audio, sr, opts)
    covered = any(s <= 3.5 * sr and e >= 3.65 * sr for s, e in spans)
    assert covered, f"short utterance dropped: {[(s/sr, e/sr) for s, e in spans]}"


def test_speechmap_boundary_end_resolves_to_previous_chunk():
    """An end-timestamp landing exactly on a chunk boundary maps to the
    PREVIOUS chunk's end, not across the removed silence gap."""
    from yoho_tpu.audio.vad import SpeechMap

    sr = 16000
    smap = SpeechMap(chunks=[(0, 0, 10 * sr), (10 * sr, 100 * sr, 5 * sr)],
                     sample_rate=sr, original_samples=110 * sr)
    assert smap.to_original(10.0) == 100.0          # start: next chunk
    assert smap.to_original(10.0, end=True) == 10.0  # end: previous chunk
    assert smap.to_original(12.0, end=True) == 102.0  # interior unaffected


def test_per_request_vad_override():
    """transcribe_many(vad=[...]) overrides the configured vad_filter per
    request: False on a vad_filter=True transcriber must decode the RAW
    audio (identical to a plain transcriber), None keeps the default.
    The streaming server relies on this to avoid collapsing pre-gated
    windows a second time (cli/serve.py _decode_shared)."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import train_tokenizer

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    tok = train_tokenizer(["hello world this is a test"] * 5,
                          vocab_size=1024 + 256 + 35 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len))),
        jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                    .astype(np.float32)),
        method=YOHOModel.forward_with_voiceprints,
    )
    win_s = cfg.n_samples / cfg.sample_rate
    audio = np.concatenate([
        tone(0.8 * win_s, sr=cfg.sample_rate),
        silence(6 * win_s, cfg.sample_rate),
        tone(0.8 * win_s, sr=cfg.sample_rate),
    ])

    t_plain = Transcriber(model, variables, family="yoho", tokenizer=tok,
                          batch_size=2)
    t_vad = Transcriber(model, variables, family="yoho", tokenizer=tok,
                        batch_size=2, vad_filter=True)

    want = t_plain.transcribe_many([audio])[0]
    got = t_vad.transcribe_many([audio], vad=[False])[0]
    assert [(s.start, s.end, s.tokens) for s in got.segments] == \
           [(s.start, s.end, s.tokens) for s in want.segments]

    # None keeps the configured behavior (still collapses).
    default = t_vad.transcribe_many([audio], vad=[None])[0]
    configured = t_vad.transcribe_many([audio])[0]
    assert [(s.start, s.end, s.tokens) for s in default.segments] == \
           [(s.start, s.end, s.tokens) for s in configured.segments]

    with pytest.raises(ValueError, match="vad has"):
        t_vad.transcribe_many([audio], vad=[False, True])
