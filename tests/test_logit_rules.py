"""Repetition-control logit rules: goldens from HF transformers.

``make_repetition_rules`` reimplements transformers'
RepetitionPenaltyLogitsProcessor / NoRepeatNGramLogitsProcessor as
static-shape vocab-mask math for the jitted decode loop; these tests pin
the semantics against the originals (goldens from torch/transformers per
the repo test policy) plus the jit-specific surfaces the originals don't
have (buffer padding beyond pos, per-row vector pos, bannable masks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.infer.logit_rules import NEG_INF, make_repetition_rules


def _case(b=3, v=23, t=9, pos=6, seed=0):
    g = np.random.default_rng(seed)
    logits = g.standard_normal((b, v)).astype(np.float32)
    # Buffer positions >= pos hold garbage the rules must ignore.
    tokens = g.integers(0, v, size=(b, t)).astype(np.int32)
    return logits, tokens, pos


def test_repetition_penalty_matches_transformers():
    import torch
    from transformers import RepetitionPenaltyLogitsProcessor

    logits, tokens, pos = _case()
    fn = make_repetition_rules(repetition_penalty=1.7)
    got = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens), pos))
    want = RepetitionPenaltyLogitsProcessor(1.7)(
        torch.tensor(tokens[:, :pos].astype(np.int64)),
        torch.tensor(logits)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_no_repeat_ngram_matches_transformers():
    import torch
    from transformers import NoRepeatNGramLogitsProcessor

    for seed in range(4):
        # Force repeats: tiny vocab so 2-grams collide often.
        g = np.random.default_rng(seed)
        b, v, t, pos = 2, 5, 12, 9
        logits = g.standard_normal((b, v)).astype(np.float32)
        tokens = g.integers(0, v, size=(b, t)).astype(np.int32)
        fn = make_repetition_rules(no_repeat_ngram_size=2)
        got = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens), pos))
        want = NoRepeatNGramLogitsProcessor(2)(
            torch.tensor(tokens[:, :pos].astype(np.int64)),
            torch.tensor(logits)).numpy()
        # Same ban set (transformers uses -inf; we use f32 min).
        np.testing.assert_array_equal(got <= NEG_INF / 2,
                                      np.isinf(want) & (want < 0), seed)
        unbanned = ~(got <= NEG_INF / 2)
        np.testing.assert_allclose(got[unbanned], want[unbanned], rtol=1e-6)


def test_vector_pos_matches_per_row_scalar():
    """Per-row pos (the continuous slot engine's layout) gives exactly
    the row-wise scalar results."""
    logits, tokens, _ = _case(b=4, v=7, t=10, seed=3)
    pos = np.asarray([2, 5, 7, 9])
    fn = make_repetition_rules(repetition_penalty=1.3,
                               no_repeat_ngram_size=2)
    got = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens),
                        jnp.asarray(pos)))
    for r in range(4):
        row = np.asarray(fn(jnp.asarray(logits[r : r + 1]),
                            jnp.asarray(tokens[r : r + 1]), int(pos[r])))
        np.testing.assert_allclose(got[r], row[0], rtol=1e-6)


def test_prompt_region_is_never_penalized():
    """Tokens at positions < n_prompt (the forced prompt) don't count:
    a prompt full of token 3 leaves token 3's logit untouched."""
    v = 11
    logits = np.zeros((1, v), np.float32) + 1.0
    tokens = np.full((1, 8), 3, np.int32)
    tokens[0, 4:] = 5  # generated region
    fn = make_repetition_rules(repetition_penalty=2.0, n_prompt=4)
    got = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens), 8))
    assert got[0, 3] == 1.0  # prompt-only token untouched
    assert got[0, 5] == 0.5  # generated token damped


def test_bannable_mask_protects_special_ids():
    """ids outside ``bannable`` (timestamps/specials) are never banned or
    penalized even when repeated — the timestamp pairing rules own them."""
    v = 9
    bannable = np.zeros(v, bool)
    bannable[:6] = True  # 6..8 are "specials"
    logits = np.ones((1, v), np.float32)
    # History [0, 7, 0, 0] at pos=4: prefix is (0,); matching windows
    # are j=0 (follower 7 — special, protected) and j=2 (follower 0 —
    # text, banned). Penalty sees generated text ids {0, 3}.
    tokens = np.asarray([[0, 7, 0, 0, 0, 0, 0, 0]], np.int32)
    fn = make_repetition_rules(repetition_penalty=2.0,
                               no_repeat_ngram_size=2, bannable=bannable)
    got = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens), 4))
    assert got[0, 7] == 1.0  # special: generated + follower, untouched
    assert got[0, 0] <= NEG_INF / 2  # text follower of (0,): banned
    assert got[0, 1] == 1.0  # unseen text id untouched
    # Penalty-only case (no completable n-gram bans a text id):
    tokens2 = np.asarray([[3, 7, 3, 5, 0, 0, 0, 0]], np.int32)
    got2 = np.asarray(fn(jnp.asarray(logits), jnp.asarray(tokens2), 4))
    assert got2[0, 5] == 0.5  # generated text id damped
    assert got2[0, 7] == 1.0  # special damped never


def test_inactive_returns_none():
    assert make_repetition_rules() is None
    assert make_repetition_rules(repetition_penalty=1.0,
                                 no_repeat_ngram_size=1) is None
    with pytest.raises(ValueError):
        make_repetition_rules(repetition_penalty=-1.0)


def test_greedy_decode_respects_no_repeat_ngram():
    """End to end: a random tiny whisper decodes with
    no_repeat_ngram_size=2 and the generated text tokens contain no
    repeated bigram (random weights love repetition loops, making this a
    strong property); jit path, timestamps off."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=24, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False, no_speech_threshold=1.1,
                    no_repeat_ngram_size=2)
    mel = jnp.zeros((1, 32, 8), jnp.float32)
    tokens, lengths, _ = t._decode_with_fallback(1, mel)
    n_prompt = len(t._prompt_ids())
    text = [int(x) for x in tokens[0, n_prompt: int(lengths[0])]
            if x < table.eot]
    bigrams = [(a, b) for a, b in zip(text, text[1:])]
    assert len(bigrams) == len(set(bigrams)), bigrams
