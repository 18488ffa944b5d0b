"""Whisper timestamp decoding rules as a jit-safe logits processor.

OpenAI's ``ApplyTimestampRules`` reimplemented for the fully-jitted decode
loop (the reference has no timestamp handling at all — its demo decodes
with ``<|notimestamps|>``, ``whisper.py:270``):

  1. pairing: after a LONE generated timestamp (including the forced
     initial one — OpenAI treats ``len(sampled) < 2`` as
     penultimate-was-timestamp), timestamps are suppressed so text can
     follow; after a ``text <|t|>`` close, text is suppressed so the
     pairing ``<|t|><|t|>`` (or EOT) follows;
  2. timestamps never decrease, and must STRICTLY increase except when
     the pair's second timestamp is due (prevents zero-length segments
     and the infinite-repetition loop OpenAI's +1 exists for);
  3. the first generated token must be a timestamp, bounded by
     ``max_initial_timestamp`` (pass None to disable the cap);
  4. when the total probability mass on timestamps exceeds the best
     non-timestamp token (EOT included, exactly like upstream — else
     end-of-speech windows cannot terminate), a timestamp is forced.

Everything is expressed as vocabulary-range masks over the (B, V) logits
given the token buffer — no data-dependent control flow. Semantics are
kept line-for-line comparable with OpenAI's ``ApplyTimestampRules``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def make_timestamp_rules(
    table,
    prompt_len: int,
    max_initial_timestamp: Optional[float] = 1.0,
) -> Callable:
    """Returns ``fn(logits (B, V) f32, tokens (B, T), pos) -> logits``.

    ``pos`` is the buffer index of the token about to be generated;
    ``tokens[:, :pos]`` are already decided.
    """
    ts_begin = table.timestamp_begin
    eot = table.eot
    max_initial_offset = (None if max_initial_timestamp is None
                          else int(round(max_initial_timestamp / 0.02)))

    def fn(logits, tokens, pos):
        """``pos`` may be a scalar (all rows at the same buffer index —
        the batched decode loop) or a per-row vector (B,) (continuous
        batching: every slot at its own position)."""
        b, v = logits.shape
        vocab_ids = jnp.arange(v)
        is_ts_vocab = vocab_ids >= ts_begin
        # "Text" for the masks below follows OpenAI: plain text tokens
        # are [0, eot); the probability rule compares against ALL
        # non-timestamp ids [0, ts_begin) — EOT and specials included.
        is_text_vocab = vocab_ids < eot

        if getattr(pos, "ndim", 0) == 1:
            last = jnp.take_along_axis(tokens, (pos - 1)[:, None],
                                       axis=1)[:, 0]
            penult = jnp.take_along_axis(
                tokens, jnp.maximum(pos - 2, 0)[:, None], axis=1)[:, 0]
        else:
            last = tokens[:, pos - 1]
            penult = tokens[:, pos - 2]
        last_is_ts = jnp.logical_and(last >= ts_begin, pos - 1 >= prompt_len)
        # OpenAI: penultimate_was_timestamp = len(sampled) < 2 or
        # sampled[-2] >= ts_begin — fewer than two generated tokens
        # counts as True (so text may follow the forced initial ts).
        penult_is_ts = jnp.logical_or(pos - 2 < prompt_len,
                                      penult >= ts_begin)

        # 1. pairing. last ts + penult ts (a completed pair, or the lone
        # initial ts): suppress timestamps -> text follows. last ts with
        # text before it (segment close): suppress text [0, eot) -> the
        # pair's second ts or EOT follows (specials stay available,
        # exactly as upstream; the suppress-list removes them anyway).
        needs_second = jnp.logical_and(last_is_ts, ~penult_is_ts)
        after_pair = jnp.logical_and(last_is_ts, penult_is_ts)
        mask = jnp.zeros_like(logits, bool)
        mask = mask | (needs_second[:, None] & is_text_vocab[None, :])
        mask = mask | (after_pair[:, None] & is_ts_vocab[None, :])

        # 2. monotonicity. Floor = max generated timestamp; STRICTLY
        # above it except when the pair's second timestamp is due
        # (needs_second), which may repeat the opening time — OpenAI's
        # ``timestamps[-1] + 1`` rule, "to prevent infinite looping".
        positions = jnp.arange(tokens.shape[1])
        pos_col = pos[:, None] if getattr(pos, "ndim", 0) == 1 else pos
        seen = jnp.logical_and(positions[None, :] < pos_col,
                               positions[None, :] >= prompt_len)
        ts_vals = jnp.where(jnp.logical_and(seen, tokens >= ts_begin), tokens, 0)
        ts_max = jnp.max(ts_vals, axis=1)  # 0 when none seen
        ts_floor = jnp.where(ts_max > 0,
                             ts_max + jnp.where(needs_second, 0, 1), 0)
        mask = mask | (is_ts_vocab[None, :]
                       & (vocab_ids[None, :] < ts_floor[:, None]))

        # 3. first generated token must be a timestamp, within the
        # (optional) initial cap.
        initial = pos == prompt_len
        if getattr(initial, "ndim", 0) == 1:
            initial = initial[:, None]
        init_mask = ~is_ts_vocab
        if max_initial_offset is not None:
            init_mask = init_mask | (vocab_ids > ts_begin + max_initial_offset)
        mask = jnp.where(initial, mask | init_mask[None, :], mask)

        logits = jnp.where(mask, NEG_INF, logits)

        # 4. probability rule: force a timestamp when its total mass
        # beats the best NON-timestamp token (EOT included — excluding
        # it would stop decode from terminating at end of speech).
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_logprob = jax.nn.logsumexp(
            jnp.where(is_ts_vocab[None, :], logprobs, NEG_INF), axis=-1
        )
        max_text = jnp.max(jnp.where(~is_ts_vocab[None, :], logprobs, NEG_INF),
                           axis=-1)
        force_ts = ts_logprob > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts_vocab[None, :], NEG_INF,
                           logits)
        return logits

    return fn
