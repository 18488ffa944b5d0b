"""Unit tests for the jit-safe Whisper timestamp rules."""

import numpy as np

import jax
import jax.numpy as jnp

from yoho_tpu.infer.whisper_rules import NEG_INF, make_timestamp_rules
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

TABLE = WhisperTokenTable(multilingual=True)
P = 4  # prompt length


def _apply(tokens_row, pos, logits_row=None):
    fn = make_timestamp_rules(TABLE, P)
    v = TABLE.n_vocab
    logits = jnp.zeros((1, v)) if logits_row is None else jnp.asarray(logits_row)[None]
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(tokens_row)] = tokens_row
    out = jax.jit(fn)(logits, jnp.asarray(buf), pos)
    return np.asarray(out)[0]


def test_first_token_must_be_initial_timestamp():
    out = _apply([1, 2, 3, 4], P)
    ts0 = TABLE.timestamp_begin
    # all text suppressed, early timestamps allowed, late ones capped
    assert out[100] == NEG_INF
    assert out[ts0] > NEG_INF
    assert out[ts0 + 25] > NEG_INF  # 0.5 s < 1.0 s cap
    assert out[ts0 + 100] == NEG_INF  # 2.0 s > cap


def test_after_lone_timestamp_only_ts_or_eot():
    ts = TABLE.timestamp_begin + 10
    out = _apply([1, 2, 3, 4, 500, ts], P + 2)
    assert out[500] == NEG_INF  # text blocked
    assert out[ts + 5] > NEG_INF  # later timestamp fine
    # With uniform logits the probability rule then also forces a timestamp
    # (OpenAI masks everything below timestamp_begin, EOT included).
    assert out[TABLE.eot] == NEG_INF


def test_after_timestamp_pair_no_ts():
    ts = TABLE.timestamp_begin + 10
    out = _apply([1, 2, 3, 4, 500, ts, ts + 2], P + 3)
    assert out[ts + 5] == NEG_INF  # timestamps blocked after a pair
    # the probability rule may still also constrain text; check the
    # pairing mask specifically: an earlier timestamp is blocked too
    assert out[ts] == NEG_INF


def test_monotonic_timestamps():
    ts = TABLE.timestamp_begin
    out = _apply([1, 2, 3, 4, ts + 50, 500, 600], P + 3)
    assert out[ts + 10] == NEG_INF  # below floor
    assert out[ts + 60] > NEG_INF


def test_probability_rule_forces_timestamp():
    v = TABLE.n_vocab
    logits = np.zeros(v, np.float32)
    # big mass spread across timestamps, weak text
    logits[TABLE.timestamp_begin:] = 5.0
    logits[:100] = 0.0
    ts = TABLE.timestamp_begin + 10
    out = _apply([1, 2, 3, 4, ts, 500], P + 2, logits)  # pair done -> text turn
    # pairing rule forbids ts... use a state where text is allowed:
    out = _apply([1, 2, 3, 4, ts, 700, 800], P + 3, logits)
    # with overwhelming ts mass, text must be suppressed
    assert np.all(out[:100] == NEG_INF)


def test_text_follows_forced_initial_timestamp():
    """OpenAI counts fewer-than-two sampled tokens as penultimate-was-
    timestamp: after the forced initial <|t0|>, timestamps are suppressed
    so TEXT follows (the inverted rule forced every window to open with
    two timestamps)."""
    ts0 = TABLE.timestamp_begin
    out = _apply([1, 2, 3, 4, ts0], P + 1)
    assert out[ts0 + 5] == NEG_INF   # another timestamp is blocked
    assert out[500] > NEG_INF        # text may follow


def test_zero_length_segment_blocked():
    """A closing timestamp must STRICTLY exceed the opening one (OpenAI's
    +1 floor, 'to prevent infinite looping')."""
    ts = TABLE.timestamp_begin + 50
    # <|t50|> text — the close is being decided now.
    out = _apply([1, 2, 3, 4, ts, 500], P + 2)
    assert out[ts] == NEG_INF        # equal close -> zero-length segment
    assert out[ts + 1] > NEG_INF     # strictly later close allowed


def test_pair_second_timestamp_may_repeat():
    """The pairing's SECOND timestamp may equal the segment close (floor
    without +1 exactly when the second-of-pair is due)."""
    ts = TABLE.timestamp_begin + 50
    # text <|t52|> — the pair's second timestamp is being decided.
    out = _apply([1, 2, 3, 4, 500, ts + 2], P + 2)
    assert out[ts + 2] > NEG_INF     # equality allowed here
    assert out[ts + 1] == NEG_INF    # below the close is still blocked
