"""Logit biasing: explicit logit_bias deltas + hotword phrase boosting.

A serving feature absent from the reference (its decode is bare argmax,
``yoho/src/nn/whisper.py:279``): per-token logit deltas (OpenAI
logit_bias semantics) and hotword phrases whose token ids get boosted,
applied INSIDE the compiled decode programs — greedy, beam, and the
continuous slot engine must all see the identical biased distribution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig, YOHOConfig
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.text.tokenizer import train_tokenizer
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

WORDS = ["alpha", "bravo", "charlie", "delta"]


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
def whisper_setup():
    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=24, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=_WordBackend(WORDS))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    audio = (0.1 * np.random.default_rng(0).standard_normal(cfg.n_samples)
             ).astype(np.float32)
    return cfg, model, variables, table, audio


def _tokens(result):
    return [s.tokens for s in result.segments]


def test_zero_delta_bias_is_identity(whisper_setup):
    _cfg, model, variables, table, audio = whisper_setup
    kw = dict(family="whisper", token_table=table, batch_size=1,
              timestamps=False, language="en")
    plain = Transcriber(model, variables, **kw)
    biased = Transcriber(model, variables, logit_bias={100: 0.0}, **kw)
    assert biased._bias_logits_fn() is not None
    assert _tokens(plain.transcribe(audio)) == \
        _tokens(biased.transcribe(audio))


def test_strong_bias_forces_token_greedy_and_beam(whisper_setup):
    _cfg, model, variables, table, audio = whisper_setup
    wid = next(i for i in (100, 101, 102)
               if i not in Transcriber(
                   model, variables, family="whisper", token_table=table,
                   batch_size=1, timestamps=False)._suppress_ids())
    for beams in (0, 2):
        t = Transcriber(model, variables, family="whisper",
                        token_table=table, batch_size=1, beams=beams,
                        timestamps=False, language="en",
                        logit_bias={wid: 1e6})
        toks = [tok for seg in t.transcribe(audio).segments
                for tok in seg.tokens]
        assert toks and all(tok == wid for tok in toks), (beams, toks)


def test_hotwords_resolve_and_boost(whisper_setup):
    _cfg, model, variables, table, audio = whisper_setup
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False, language="en",
                    hotwords="alpha, bravo", hotword_boost=3.0)
    want = {table.encode_text(" alpha")[0], table.encode_text(" bravo")[0]}
    assert set(t._logit_bias_entries) == want
    assert all(v == 3.0 for v in t._logit_bias_entries.values())
    # explicit logit_bias stacks with hotword boost on the same id
    wid = table.encode_text(" alpha")[0]
    t2 = Transcriber(model, variables, family="whisper", token_table=table,
                     batch_size=1, timestamps=False, language="en",
                     hotwords="alpha", hotword_boost=3.0,
                     logit_bias={wid: -1.0})
    assert t2._logit_bias_entries[wid] == pytest.approx(2.0)


def test_hotwords_steer_decode_output(whisper_setup):
    _cfg, model, variables, table, audio = whisper_setup
    kw = dict(family="whisper", token_table=table, batch_size=1,
              timestamps=False, language="en")
    plain = Transcriber(model, variables, **kw)
    hot = Transcriber(model, variables, hotwords="alpha",
                      hotword_boost=1e6, **kw)
    wid = table.encode_text(" alpha")[0]
    toks = [tok for seg in hot.transcribe(audio).segments
            for tok in seg.tokens]
    assert toks and all(tok == wid for tok in toks)
    assert _tokens(plain.transcribe(audio)) != _tokens(hot.transcribe(audio))


def test_bias_applies_before_timestamp_rules(whisper_setup):
    """With timestamps on, the rules still run (well-formed alternating
    structure) over the biased distribution — biasing must not bypass
    them."""
    _cfg, model, variables, table, audio = whisper_setup
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=True, language="en",
                    hotwords="charlie", hotword_boost=1e6)
    for seg in t.transcribe(audio).segments:
        assert all(not table.is_timestamp(tok) for tok in seg.tokens)
        assert 0.0 <= seg.start <= seg.end


def test_continuous_parity_with_bias(whisper_setup):
    from yoho_tpu.infer.continuous import ContinuousBatcher

    _cfg, model, variables, table, audio = whisper_setup
    g = np.random.default_rng(1)
    audios = [(0.1 * g.standard_normal(len(audio))).astype(np.float32)
              for _ in range(3)]
    kw = dict(family="whisper", token_table=table, batch_size=2,
              timestamps=False, language="en", hotwords="bravo",
              hotword_boost=2.5)
    want = Transcriber(model, variables, **kw).transcribe_many(audios)
    batcher = ContinuousBatcher(Transcriber(model, variables, **kw),
                                max_batch=2, chunk_tokens=4)
    try:
        got = [batcher.submit(a) for a in audios]
    finally:
        batcher.close()
    for w, g_res in zip(want, got):
        assert _tokens(w) == _tokens(g_res)


def test_validation_errors(whisper_setup):
    _cfg, model, variables, table, _audio = whisper_setup
    kw = dict(family="whisper", token_table=table, batch_size=1)
    with pytest.raises(ValueError, match="out of range"):
        Transcriber(model, variables, logit_bias={51865: 1.0}, **kw)
    with pytest.raises(ValueError, match="out of range"):
        Transcriber(model, variables, logit_bias={-1: 1.0}, **kw)
    with pytest.raises(ValueError, match="no phrases"):
        Transcriber(model, variables, hotwords=" , ", **kw)
    bare = WhisperTokenTable(multilingual=True)  # no text backend
    with pytest.raises(ValueError, match="text backend"):
        Transcriber(model, variables, family="whisper", token_table=bare,
                    batch_size=1, hotwords="alpha")


def test_yoho_family_hotwords():
    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    corpus = ["hello world this is a test", "the quick brown fox"] * 5
    tok = train_tokenizer(corpus, vocab_size=1024 + 256 + 35 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal(
        (1, cfg.max_audio_len, cfg.n_mel_bands)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, tok.vocab_size,
                                    size=(1, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    audio = (0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)

    hot = Transcriber(model, variables, family="yoho", tokenizer=tok,
                      batch_size=1, hotwords="fox", hotword_boost=1e6)
    assert set(hot._logit_bias_entries) == set(tok.encode("fox"))
    assert hot._bias_logits_fn() is not None
    # The biased program builds and runs; a wall-to-wall forced token
    # yields no <|t-a|>text<|t-b|> structure, so no segments — the
    # steering behavior itself is pinned on the whisper family above.
    result = hot.transcribe(audio)
    assert result.segments == []
