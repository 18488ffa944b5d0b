import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.infer.longform import Segment, chunk_audio, stitch_segments
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.text.tokenizer import train_tokenizer


def test_chunk_audio_short():
    wins, starts = chunk_audio(np.ones(100, np.float32), 400, 300)
    assert wins.shape == (1, 400)
    assert starts == [0]
    assert wins[0, :100].sum() == 100 and wins[0, 100:].sum() == 0


def test_chunk_audio_long_covers_tail():
    audio = np.arange(1000, dtype=np.float32)
    wins, starts = chunk_audio(audio, 400, 300)
    assert starts[0] == 0
    assert starts[-1] + 400 >= 1000
    for w, s in zip(wins, starts):
        n = min(400, 1000 - s)
        np.testing.assert_array_equal(w[:n], audio[s : s + n])


def test_stitch_dedupes_overlap():
    # two windows, 4 s chunks, 3 s stride (1 s overlap @ sr=1)
    sr, chunk, stride = 1, 4, 3
    w0 = [Segment(0.5, 1.0, "a"), Segment(3.2, 3.8, "dup")]
    w1 = [Segment(0.2, 0.8, "dup"), Segment(1.5, 2.0, "b")]  # abs: 3.2-3.8, 4.5-5.0
    out = stitch_segments([w0, w1], [0, 3], sr, chunk, stride)
    texts = [s.text for s in out]
    assert texts.count("dup") == 1
    assert texts == ["a", "dup", "b"]
    dup = out[texts.index("dup")]
    assert abs(dup.start - 3.2) < 1e-6


@pytest.fixture(scope="module")
def yoho_setup():
    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    corpus = ["hello world this is a test", "the quick brown fox"] * 5
    tok = train_tokenizer(corpus, vocab_size=1024 + 256 + 35 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    return cfg, model, variables, tok


def test_transcriber_end_to_end_smoke(yoho_setup):
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=2, overlap_seconds=0.05)
    # ~3 windows of audio
    audio = np.random.default_rng(1).standard_normal(int(cfg.n_samples * 2.5)) * 0.1
    result = t.transcribe(audio.astype(np.float32))
    assert result.language == "en"
    assert isinstance(result.text, str)
    for seg in result.segments:
        assert 0 <= seg.start <= seg.end


def test_transcriber_batch_smoke(yoho_setup):
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok, batch_size=4)
    clips = [np.zeros(cfg.n_samples, np.float32) for _ in range(3)]
    results = t.transcribe_batch(clips)
    assert len(results) == 3
    # identical inputs -> identical outputs (determinism)
    assert results[0].text == results[1].text == results[2].text


def test_transcriber_beam_smoke(yoho_setup):
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1, beams=2)
    audio = np.zeros(cfg.n_samples, np.float32)
    result = t.transcribe(audio)
    assert isinstance(result.text, str)


def test_diarization_clustering():
    from yoho_tpu.infer.diarize import cluster_voiceprints, identify_speaker

    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.95, 0.3, 0.0])  # close to a
    c = np.array([0.0, 1.0, 0.0])   # different speaker
    labels = cluster_voiceprints([a, None, b, c, a])
    assert labels[0] == labels[2] == labels[4] == 0
    assert labels[1] is None
    assert labels[3] == 1

    assert identify_speaker(a, {"alice": a, "bob": c}) == "alice"
    assert identify_speaker(np.array([0.0, 0.0, 1.0]), {"alice": a}) is None


def test_transcriber_diarizes(yoho_setup):
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok, batch_size=1)
    audio = np.zeros(cfg.n_samples, np.float32)
    result = t.transcribe(audio)
    for seg in result.segments:
        assert seg.speaker is None or isinstance(seg.speaker, int)


def test_whisper_language_detection():
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    # Tiny model with the REAL vocab size so language token ids exist.
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
                    batch_size=1)
    lang, probs = t.detect_language(np.zeros(cfg.n_samples, np.float32))
    assert lang in table.languages
    assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_temperature_fallback_smoke():
    """Fallback path: random tiny whisper model decodes with a (0.0, 0.5)
    temperature ladder without error; compression-ratio helper sane."""
    import jax
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
                    batch_size=1, temperatures=(0.0, 0.5))
    res = t.transcribe(np.zeros(cfg.n_samples, np.float32))
    assert isinstance(res.text, str)
    assert Transcriber._compression_ratio("") == 0.0
    assert Transcriber._compression_ratio("ab " * 200) > 2.4  # repetitive
    assert Transcriber._compression_ratio("the quick brown fox") < 2.4


def _tiny_whisper_transcriber(**kw):
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
    return Transcriber(model, variables, family="whisper",
                       token_table=table, batch_size=1, **kw), cfg


def test_no_speech_measured_at_sot_position():
    """no_speech_prob is the <|nospeech|> softmax mass at the SOT
    position's output distribution (OpenAI's probs_at_sot), not at the
    last prompt token — verified against a manual teacher-forced pass."""
    t, cfg = _tiny_whisper_transcriber(no_speech_threshold=1.1)
    mel = jnp.zeros((1, 32, 8), jnp.float32)
    _tokens, _lengths, aux = t._decode_with_fallback(1, mel)
    prompt = np.asarray([t._prompt_ids()], np.int32)
    sot_i = t._sot_index(prompt.shape[1])
    assert sot_i == 0  # base prompt starts with <|startoftranscript|>
    # Manual: full teacher-forced logits, softmax at the SOT position.
    logits = t.model.apply(t.variables, jnp.asarray(prompt),
                           t.model.apply(t.variables, mel,
                                         method=type(t.model).encode_audio),
                           method=type(t.model).decode_text)
    probs = np.asarray(jax.nn.softmax(logits[:, sot_i].astype(jnp.float32),
                                      axis=-1))
    want = float(probs[0, t.token_table.no_speech])
    assert abs(float(aux["no_speech_prob"][0]) - want) < 1e-4
    # Prompted requests: SOT sits after the <|startofprev|> context.
    plen = prompt.shape[1] + 6
    assert t._sot_index(plen) == 6


def test_hallucination_silence_filter():
    """_drop_silence_hallucinations: a segment over pure silence inside a
    long silent run is dropped; segments over speech (or silence shorter
    than the threshold) are kept; disabled by default."""
    t, cfg = _tiny_whisper_transcriber(hallucination_silence_threshold=2.0)
    sr = t.sample_rate
    g = np.random.default_rng(0)
    # 10 s: speech (tone bursts) at 0-2 s and 8-10 s; silence 2-8 s.
    audio = np.zeros(10 * sr, np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 400 * np.arange(2 * sr) / sr)
    audio[: 2 * sr] = tone
    audio[8 * sr:] = tone
    speech_seg = Segment(0.2, 1.8, "real", [5])
    ghost_seg = Segment(4.0, 5.0, "ghost", [6])
    kept = t._drop_silence_hallucinations([speech_seg, ghost_seg], audio)
    assert kept == [speech_seg]
    # Threshold longer than the silence run: nothing dropped.
    t2, _ = _tiny_whisper_transcriber(hallucination_silence_threshold=30.0)
    assert t2._drop_silence_hallucinations(
        [speech_seg, ghost_seg], audio) == [speech_seg, ghost_seg]
    # Disabled (default None): untouched.
    t3, _ = _tiny_whisper_transcriber()
    assert t3._drop_silence_hallucinations(
        [speech_seg, ghost_seg], audio) == [speech_seg, ghost_seg]
    with pytest.raises(ValueError):
        _tiny_whisper_transcriber(hallucination_silence_threshold=0.0)


def test_length_penalty_plumbs_into_beam_decode():
    """Transcriber(length_penalty=) reaches beam_search: a beamed decode
    with an extreme penalty compiles and runs; the knob defaults to the
    whisper-standard 1.0."""
    t, cfg = _tiny_whisper_transcriber(beams=2, length_penalty=0.0,
                                       no_speech_threshold=1.1)
    assert t.length_penalty == 0.0
    mel = jnp.zeros((1, 32, 8), jnp.float32)
    tokens, lengths, _ = t._decode_with_fallback(1, mel)
    assert int(lengths[0]) >= len(t._prompt_ids())
    t2, _cfg = _tiny_whisper_transcriber()
    assert t2.length_penalty == 1.0


def test_language_probability_on_autodetect():
    """language=None populates result.language_probability (softmax prob
    of the detected language token) on both the single and batched
    paths; a pinned language leaves it None."""
    t, cfg = _tiny_whisper_transcriber(language=None, no_speech_threshold=1.1)
    g = np.random.default_rng(0)
    audio = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
    res = t.transcribe(audio)
    assert res.language in t.token_table.languages
    assert res.language_probability is not None
    assert 0.0 < res.language_probability <= 1.0
    # consistency with the detection APIs
    lang, probs = t.detect_language(audio)
    assert res.language == lang
    assert abs(res.language_probability - probs[lang]) < 1e-5
    (langs, lp) = t.detect_language_many([audio], return_probs=True)
    assert langs[0] == lang and abs(lp[0] - probs[lang]) < 1e-5
    many = t.transcribe_many([audio])[0]
    assert many.language == lang
    assert abs(many.language_probability - probs[lang]) < 1e-5

    pinned, cfg = _tiny_whisper_transcriber(language="en")
    res = pinned.transcribe(audio)
    assert res.language == "en" and res.language_probability is None


def test_best_of_selects_highest_avg_logprob():
    """best_of=3 at a sampling rung returns exactly the candidate a manual
    3-seed sweep would pick by mean logprob (OpenAI whisper's rule), and
    the PRNG seed rides the SAME compiled program as a traced argument."""
    t, cfg = _tiny_whisper_transcriber(temperatures=(1.0,), best_of=3)
    mel = jnp.zeros((1, 32, 8), jnp.float32)
    tokens, lengths, aux = t._decode_with_fallback(1, mel)

    fn = t._decode_fn(1, 1.0, None)
    n_prompt = len(t._prompt_ids())
    best_lp, want = -np.inf, None
    cands = []
    for seed in range(3):
        tk, ln, ax = fn(t.variables, mel, seed=seed)
        tk, ln = np.asarray(tk), np.asarray(ln)
        cands.append(tk[0, : ln[0]].tolist())
        lp = float(np.asarray(ax["sum_logprob"])[0]) / max(ln[0] - n_prompt, 1)
        if lp > best_lp:
            best_lp, want = lp, tk[0, : ln[0]].tolist()
    got = tokens[0, : lengths[0]].tolist()
    assert got == want
    # Distinct seeds actually sample distinct candidates (vocab 51865,
    # random weights: a collision means the seed is not reaching the
    # sampler).
    assert len({tuple(c) for c in cands}) > 1
    # Exactly ONE compiled program serves all three seeds.
    assert len(t._jitted) == 1


def test_best_of_default_is_single_sample():
    """best_of=1 (default) at temperature>0 is exactly the seed-0 sample;
    best_of < 1 is rejected."""
    t, cfg = _tiny_whisper_transcriber(temperatures=(1.0,))
    mel = jnp.zeros((1, 32, 8), jnp.float32)
    tokens, lengths, _ = t._decode_with_fallback(1, mel)
    tk, ln, _ = t._decode_fn(1, 1.0, None)(t.variables, mel, seed=0)
    assert tokens[0, : lengths[0]].tolist() == \
        np.asarray(tk)[0, : np.asarray(ln)[0]].tolist()
    with pytest.raises(ValueError):
        _tiny_whisper_transcriber(best_of=0)


def test_transcriber_speculative_matches_plain():
    """Transcriber with a draft model produces EXACTLY the plain greedy
    transcript (speculative decoding changes throughput, never content)."""
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    kw = dict(n_mels=8, n_audio_ctx=16, n_vocab=51865, n_text_ctx=16,
              chunk_seconds=0.32)
    cfg_t = WhisperConfig(n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                          n_text_state=32, n_text_head=4, n_text_layer=1, **kw)
    cfg_d = WhisperConfig(n_audio_state=16, n_audio_head=2, n_audio_layer=1,
                          n_text_state=16, n_text_head=2, n_text_layer=1, **kw)
    table = WhisperTokenTable(multilingual=True)

    def init(cfg, seed):
        m = Whisper(cfg)
        v = m.init(jax.random.PRNGKey(seed),
                   jnp.zeros((1, 32, cfg.n_mels), jnp.float32),
                   jnp.zeros((1, 4), jnp.int32))
        return m, v

    model, variables = init(cfg_t, 0)
    draft, draft_vars = init(cfg_d, 1)

    g = np.random.default_rng(0)
    audio = (0.1 * g.standard_normal(cfg_t.n_samples)).astype(np.float32)

    plain = Transcriber(model, variables, family="whisper",
                        token_table=table, batch_size=1, timestamps=False)
    spec = Transcriber(model, variables, family="whisper", token_table=table,
                       batch_size=1, timestamps=False, draft_model=draft,
                       draft_variables=draft_vars, speculative_gamma=3)

    r_plain = plain.transcribe(audio)
    r_spec = spec.transcribe(audio)
    assert [s.text for s in r_plain.segments] == [s.text for s in r_spec.segments]

    # With timestamp rules enabled the equivalence must also hold (the
    # speculative work buffer feeds the rules the same context greedy sees).
    plain_ts = Transcriber(model, variables, family="whisper",
                           token_table=table, batch_size=1, timestamps=True)
    spec_ts = Transcriber(model, variables, family="whisper",
                          token_table=table, batch_size=1, timestamps=True,
                          draft_model=draft, draft_variables=draft_vars,
                          speculative_gamma=3)
    r_plain_ts = plain_ts.transcribe(audio)
    r_spec_ts = spec_ts.transcribe(audio)
    assert ([(round(s.start, 3), s.text) for s in r_plain_ts.segments]
            == [(round(s.start, 3), s.text) for s in r_spec_ts.segments])


def test_initial_prompt_conditioning():
    """<|startofprev|> context tokens land at the head of the decode
    prompt and the transcript still comes back cleanly."""
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBPE:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) % 200 for c in text]

        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBPE())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False,
                    initial_prompt="Hello YOHO")
    ids = t._prompt_ids()
    assert ids[0] == table.sot_prev
    assert ids[-1] == table.sot_sequence("en", "transcribe", False)[-1]
    # Context truncated to half the text context.
    assert len(ids) <= cfg.n_text_ctx // 2 - 1 + 1 + 4

    res = t.transcribe(np.zeros(cfg.n_samples, np.float32))
    assert isinstance(res.text, str)

    plain = Transcriber(model, variables, family="whisper", token_table=table,
                        batch_size=1, timestamps=False)
    assert plain._prompt_ids()[0] != table.sot_prev


def test_condition_on_previous_text_sequential():
    """Conditioned long-form: single-window output equals the batched
    path; multi-window audio threads history with at most TWO compiled
    prompt signatures; high-temp fallback would reset context."""
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))

    plain = Transcriber(model, variables, family="whisper", token_table=table,
                        batch_size=1, timestamps=False)
    cond = Transcriber(model, variables, family="whisper", token_table=table,
                       batch_size=1, timestamps=False,
                       condition_on_previous_text=True)

    g = np.random.default_rng(0)
    short = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
    r_plain = plain.transcribe(short)
    r_cond = cond.transcribe(short)
    assert [s.text for s in r_plain.segments] == [s.text for s in r_cond.segments]

    long = (0.1 * g.standard_normal(int(cfg.n_samples * 3.4))).astype(np.float32)
    r_long = cond.transcribe(long)
    assert isinstance(r_long.text, str)
    # Static-shape discipline: decode programs for at most 2 prompt lengths
    # (base + fixed-budget conditioned) per temperature.
    prompt_lens = {k[3] for k in cond._jitted if isinstance(k, tuple)
                   and len(k) == 4}
    assert len(prompt_lens) <= 2, prompt_lens

    with pytest.raises(ValueError):
        Transcriber(model, variables, family="whisper", token_table=table,
                    beams=3, condition_on_previous_text=True)

    # transcribe_many must honor the conditioned mode (each request runs
    # the sequential path) — it previously decoded unconditioned, so the
    # micro-batching server silently dropped the configured conditioning.
    r_many = cond.transcribe_many([short, long])
    assert [s.tokens for s in r_many[0].segments] == \
           [s.tokens for s in r_cond.segments]
    assert [s.tokens for s in r_many[1].segments] == \
           [s.tokens for s in r_long.segments]
    with pytest.raises(ValueError, match="condition_on_previous_text"):
        cond.transcribe_many([short], prompts=["ctx"])

    # The slot engine rejects conditioned transcribers outright (slots
    # decode windows independently; running anyway would silently drop
    # the conditioning).
    from yoho_tpu.infer.slot_engine import SlotEngine

    with pytest.raises(ValueError, match="condition_on_previous_text"):
        SlotEngine(cond)


def test_auto_language_detection_transcribe():
    """language=None: the detected language lands in the prompt and the
    result, with no extra compiled decode programs (prompt is a traced
    argument)."""
    import jax
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
                    batch_size=2, timestamps=False, language=None)

    g = np.random.default_rng(0)
    a1 = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
    a2 = (0.1 * g.standard_normal(cfg.n_samples * 2)).astype(np.float32)
    r1, r2 = t.transcribe_many([a1, a2])
    assert r1.language in table.languages
    assert r2.language in table.languages

    # Explicit language still honored.
    t_de = Transcriber(model, variables, family="whisper", token_table=table,
                       batch_size=1, timestamps=False, language="de")
    assert t_de.transcribe(a1).language == "de"
    assert table.language_token("de") in t_de._prompt_ids()


def test_custom_suppress_tokens(yoho_setup):
    """User-supplied suppress_tokens never appear in the decode output
    (both families share the suppression plumbing)."""
    cfg, model, variables, tok = yoho_setup
    banned = tuple(range(300, 340))
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1, suppress_tokens=banned)
    assert set(banned) <= set(t._suppress_ids())
    audio = (0.1 * np.random.default_rng(0).standard_normal(cfg.n_samples)
             ).astype(np.float32)
    res = t.transcribe(audio)
    for seg in res.segments:
        assert not set(seg.tokens) & set(banned)


def test_initial_prompt_does_not_leak_into_transcript():
    """Context text tokens in the prompt must never appear in segments
    (regression: the batched segment parser used to parse from index 0)."""
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBPE:
        def encode(self, text, add_special_tokens=False):
            return [777] * 5  # recognizable context ids

        def decode(self, ids):
            return "CTX" if 777 in ids else "x" * len(ids)

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBPE())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False,
                    initial_prompt="some known context")
    audio = (0.1 * np.random.default_rng(2).standard_normal(cfg.n_samples)
             ).astype(np.float32)
    res = t.transcribe(audio)
    for seg in res.segments:
        assert 777 not in seg.tokens, "prompt context leaked into transcript"
        assert "CTX" not in seg.text


def test_translate_task_prompt_and_smoke():
    """task="translate" puts the translate token in the prompt and decodes."""
    import jax
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
                    batch_size=1, timestamps=False, language="de",
                    task="translate")
    ids = t._prompt_ids()
    assert table.translate in ids and table.transcribe not in ids
    res = t.transcribe(np.zeros(cfg.n_samples, np.float32))
    assert isinstance(res.text, str)

    with pytest.raises(ValueError):
        Transcriber(model, variables, family="whisper", token_table=table,
                    task="summarize")


def test_segment_quality_signals():
    """Whisper-family segments carry window-level quality signals
    (avg_logprob / no_speech_prob / temperature / compression_ratio) —
    the per-segment metadata OpenAI's verbose_json exposes."""
    import jax
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
                    batch_size=1)
    g = np.random.default_rng(0)
    res = t.transcribe(0.1 * g.standard_normal(cfg.n_samples).astype(np.float32))
    for seg in res.segments:
        assert seg.avg_logprob is not None and seg.avg_logprob <= 0.0
        assert seg.no_speech_prob is not None and 0.0 <= seg.no_speech_prob <= 1.0
        assert seg.temperature == 0.0
        assert seg.compression_ratio is not None and seg.compression_ratio >= 0.0


def test_detect_language_many_matches_single():
    """Batched language ID returns exactly the per-request results of
    detect_language (padding slots must not perturb real rows)."""
    import jax
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
                    batch_size=2)
    g = np.random.default_rng(1)
    audios = [0.1 * g.standard_normal(cfg.n_samples).astype(np.float32)
              for _ in range(3)] + [np.zeros(0, np.float32)]
    many = t.detect_language_many(audios)
    singles = [t.detect_language(a)[0] for a in audios[:3]]
    assert many[:3] == singles
    assert many[3] == "en"  # empty audio defaults without a device call


def test_prepare_audio_downmixes_stereo(yoho_setup):
    """Stereo arrays are downmixed to mono instead of being silently
    treated as a sample sequence of rows; junk ranks raise."""
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok, batch_size=1)
    g = np.random.default_rng(0)
    mono = 0.1 * g.standard_normal(cfg.n_samples).astype(np.float32)
    stereo = np.stack([mono, mono], axis=1)          # (N, 2)
    planar = np.stack([mono, mono], axis=0)          # (2, N)
    np.testing.assert_allclose(t._prepare_audio(stereo, None), mono, atol=1e-6)
    np.testing.assert_allclose(t._prepare_audio(planar, None), mono, atol=1e-6)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="1-D mono"):
        t._prepare_audio(np.zeros((2, 3, 4), np.float32), None)


def test_orphan_text_between_timestamps_gets_gap_segment():
    """Text between a closing and the next opening timestamp (model
    skipped the paired double) becomes its OWN segment over the gap —
    neither dropped (old yoho branch) nor mis-timed into the next
    segment (old whisper branch)."""
    import jax
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=48, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=8.0)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1)
    ts = table.timestamp_begin
    word = 9000  # arbitrary text token id
    # <|0.00|> w <|2.00|> w <|4.00|> w <|6.00|>   (single ts separators)
    stream = t._prompt_ids() + [ts + 0, word, ts + 100, word, ts + 200,
                                word, ts + 300, table.eot]
    toks = np.asarray(stream, np.int32)
    segs = t._tokens_to_segments(toks, len(toks))
    spans = [(s.start, s.end) for s in segs]
    assert spans == [(0.0, 2.0), (2.0, 4.0), (4.0, 6.0)], spans
    assert all(s.tokens == [word] for s in segs)


def test_whisper_family_postpass_diarization():
    """Whisper checkpoints have no speaker head; a VoiceprintEncoder
    attached via diarize_encoder= embeds segment spans post-decode and
    clusters them (the whisperX shape). Every non-empty segment gets a
    speaker label and an L2-normalized voiceprint."""
    import jax
    from yoho_tpu.core.config import WhisperConfig, YOHOConfig
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder
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

    vp_cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=8,
                        dims=32, n_audio_heads=4, n_audio_blocks=1,
                        n_text_heads=4, n_text_blocks=1)
    enc = VoiceprintEncoder(vp_cfg, embedding_dim=16)
    enc_vars = enc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, vp_cfg.max_audio_len, 16), jnp.float32),
                        jnp.ones((1, vp_cfg.max_audio_len), jnp.float32))

    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, diarize_encoder=enc,
                    diarize_variables=enc_vars)
    g = np.random.default_rng(0)
    res = t.transcribe(0.1 * g.standard_normal(cfg.n_samples * 2)
                       .astype(np.float32))
    assert res.segments, "need segments to diarize"
    for seg in res.segments:
        assert seg.speaker is not None and isinstance(seg.speaker, int)
        assert seg.voiceprint is not None
        np.testing.assert_allclose(np.linalg.norm(seg.voiceprint), 1.0,
                                   atol=1e-3)


def test_sequential_conditioning_diarizes_too():
    """condition_on_previous_text must not silently drop requested
    post-pass diarization."""
    import jax
    from yoho_tpu.core.config import WhisperConfig, YOHOConfig
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    vp_cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=8,
                        dims=32, n_audio_heads=4, n_audio_blocks=1,
                        n_text_heads=4, n_text_blocks=1)
    enc = VoiceprintEncoder(vp_cfg, embedding_dim=16)
    enc_vars = enc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, vp_cfg.max_audio_len, 16), jnp.float32),
                        jnp.ones((1, vp_cfg.max_audio_len), jnp.float32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, condition_on_previous_text=True,
                    diarize_encoder=enc, diarize_variables=enc_vars)
    g = np.random.default_rng(0)
    res = t.transcribe(0.1 * g.standard_normal(cfg.n_samples * 2)
                       .astype(np.float32))
    assert res.segments
    assert all(s.speaker is not None for s in res.segments)


def test_per_request_language_exact_tokens():
    """transcribe_many(languages=[...]) decodes EXACTLY what per-configured
    Transcribers decode — the override changes the traced prompt, not the
    compiled program (``serve.py`` per-request language support)."""
    import jax
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
    g = np.random.default_rng(2)
    audio_a = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
    audio_b = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)

    mixed = Transcriber(model, variables, family="whisper",
                        token_table=table, batch_size=2)
    res = mixed.transcribe_many([audio_a, audio_b], languages=["en", "de"])
    assert [r.language for r in res] == ["en", "de"]
    # One compiled program served both languages.
    decode_keys = [k for k in mixed._jitted if isinstance(k, tuple)]
    assert len(decode_keys) == 1

    for audio, lang, got in zip((audio_a, audio_b), ("en", "de"), res):
        fixed = Transcriber(model, variables, family="whisper",
                            token_table=table, batch_size=2, language=lang)
        want = fixed.transcribe_many([audio])[0]
        assert [s.tokens for s in got.segments] == \
               [s.tokens for s in want.segments]


def test_prepare_audio_scales_integer_pcm(yoho_setup):
    """Raw integer PCM is scaled to [-1, 1] (soundfile convention), not
    naively cast — a plain float cast would feed +-32767-amplitude audio
    into the log-mel frontend and silently wreck the features."""
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1)
    g = np.random.default_rng(2)
    mono = np.clip(0.25 * g.standard_normal(cfg.n_samples), -1, 1)
    i16 = (mono * 32767).astype(np.int16)
    got16 = t._prepare_audio(i16, None)
    assert np.abs(got16).max() <= 1.0
    np.testing.assert_allclose(got16, i16 / 32768.0, atol=1e-7)
    np.testing.assert_allclose(got16, mono, atol=2.5 / 32768)
    i32 = (mono * (2**31 - 1)).astype(np.int32)
    np.testing.assert_allclose(t._prepare_audio(i32, None), mono, atol=1e-6)
    u8 = np.clip(np.round(mono * 128) + 128, 0, 255).astype(np.uint8)
    got8 = t._prepare_audio(u8, None)
    assert np.abs(got8).max() <= 1.0
    np.testing.assert_allclose(got8, mono, atol=1.5 / 128)


def test_prepare_audio_rejects_non_pcm_integer_dtypes(yoho_setup):
    """A Python list of int16-range samples becomes int64 under
    np.asarray; dividing by 2^63 would silently turn it into
    near-silence, so non-PCM integer dtypes raise instead (ADVICE r4)."""
    cfg, model, variables, tok = yoho_setup
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1)
    with pytest.raises(ValueError, match="not a PCM dtype"):
        t._prepare_audio([0, 100, -100, 32000], None)  # int64 via asarray
    with pytest.raises(ValueError, match="not a PCM dtype"):
        t._prepare_audio(np.zeros(64, np.int64), None)
    with pytest.raises(ValueError, match="not a PCM dtype"):
        t._prepare_audio(np.zeros(64, np.uint16), None)
