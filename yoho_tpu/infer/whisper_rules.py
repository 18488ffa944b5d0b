"""Whisper timestamp decoding rules as a jit-safe logits processor.

OpenAI's ``ApplyTimestampRules`` reimplemented for the fully-jitted decode
loop (the reference has no timestamp handling at all — its demo decodes
with ``<|notimestamps|>``, ``whisper.py:270``):

  1. timestamps come in pairs (except directly before EOT): after a lone
     timestamp only timestamps (or EOT) may follow; after a completed pair,
     text must follow;
  2. timestamps are monotonically non-decreasing within a window;
  3. the first generated token must be a timestamp, bounded by
     ``max_initial_timestamp``;
  4. when the total probability mass on timestamps exceeds the best text
     token, a timestamp is forced.

Everything is expressed as vocabulary-range masks over the (B, V) logits
given the token buffer — no data-dependent control flow.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def make_timestamp_rules(
    table,
    prompt_len: int,
    max_initial_timestamp: float = 1.0,
) -> Callable:
    """Returns ``fn(logits (B, V) f32, tokens (B, T), pos) -> logits``.

    ``pos`` is the buffer index of the token about to be generated;
    ``tokens[:, :pos]`` are already decided.
    """
    ts_begin = table.timestamp_begin
    eot = table.eot
    n_vocab = table.n_vocab
    max_initial_offset = int(round(max_initial_timestamp / 0.02))

    def fn(logits, tokens, pos):
        b, v = logits.shape
        vocab_ids = jnp.arange(v)
        is_ts_vocab = vocab_ids >= ts_begin
        is_text_vocab = vocab_ids < eot  # plain text tokens (specials excluded)

        last = tokens[:, pos - 1]
        penult = tokens[:, pos - 2]
        last_is_ts = jnp.logical_and(last >= ts_begin, pos - 1 >= prompt_len)
        penult_is_ts = jnp.logical_and(penult >= ts_begin, pos - 2 >= prompt_len)

        # 1. pairing: lone timestamp -> only ts/EOT next; pair -> no ts next.
        after_single = jnp.logical_and(last_is_ts, ~penult_is_ts)
        after_pair = jnp.logical_and(last_is_ts, penult_is_ts)
        mask = jnp.zeros_like(logits, bool)
        mask = mask | (after_single[:, None]
                       & ~(is_ts_vocab | (vocab_ids == eot))[None, :])
        mask = mask | (after_pair[:, None] & is_ts_vocab[None, :])

        # 2. monotonicity: suppress timestamps below the max seen so far.
        positions = jnp.arange(tokens.shape[1])
        seen = jnp.logical_and(positions[None, :] < pos,
                               positions[None, :] >= prompt_len)
        ts_vals = jnp.where(jnp.logical_and(seen, tokens >= ts_begin), tokens, 0)
        ts_floor = jnp.max(ts_vals, axis=1)  # 0 when none seen
        mask = mask | (is_ts_vocab[None, :]
                       & (vocab_ids[None, :] < ts_floor[:, None]))

        # 3. first generated token must be a timestamp, within the initial cap.
        if max_initial_offset is not None:
            initial = pos == prompt_len
            init_mask = ~is_ts_vocab | (vocab_ids > ts_begin + max_initial_offset)
            mask = jnp.where(initial, mask | init_mask[None, :], mask)

        logits = jnp.where(mask, NEG_INF, logits)

        # 4. probability rule: force a timestamp when its total mass beats
        # the best text token.
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_logprob = jax.nn.logsumexp(
            jnp.where(is_ts_vocab[None, :], logprobs, NEG_INF), axis=-1
        )
        max_text = jnp.max(jnp.where(is_text_vocab[None, :], logprobs, NEG_INF),
                           axis=-1)
        force_ts = ts_logprob > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts_vocab[None, :], NEG_INF,
                           logits)
        return logits

    return fn
