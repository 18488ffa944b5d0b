"""Repetition-control logit rules as jit-safe processors.

Hallucination controls faster-whisper / HF-transformers users expect and
the reference lacks entirely (its demo is plain greedy argmax,
``yoho/src/nn/whisper.py:279``): ``repetition_penalty`` (CTRL-style
down-weighting of already-generated tokens) and ``no_repeat_ngram_size``
(hard ban on completing an n-gram that already occurred).

TPU-shaped: both rules are vocabulary-mask math over the STATIC token
buffer inside the compiled decode loop — a (B, V) scatter of the
generated history and an all-shifts window compare; no data-dependent
shapes, no host round-trips. One implementation serves greedy, beam,
speculative, and the continuous slot engine (``pos`` may be a scalar or
a per-row vector, exactly like ``whisper_rules``).

Semantics match transformers' ``RepetitionPenaltyLogitsProcessor`` and
``NoRepeatNGramLogitsProcessor`` over the generated region (prompt
tokens are never penalized — a long initial_prompt must not distort
decoding), golden-tested against transformers in
``tests/test_logit_rules.py``. ``bannable`` restricts both rules to
plain-text token ids: penalizing whisper's timestamp/special tokens
would fight the timestamp pairing rules (which run AFTER these, so
their forcing always wins).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

NEG_INF = float(jnp.finfo(jnp.float32).min)


def make_repetition_rules(
    repetition_penalty: Optional[float] = None,
    no_repeat_ngram_size: int = 0,
    n_prompt: int = 0,
    bannable: Optional[np.ndarray] = None,
) -> Optional[Callable]:
    """Returns ``fn(logits (B, V), tokens (B, T), pos) -> logits`` or
    None when neither rule is active.

    ``pos`` is the buffer index about to be generated (scalar or (B,)
    per-row vector); ``tokens[:, :pos]`` are already decided and
    positions ``>= n_prompt`` of them are the generated region.
    """
    penalty = (None if repetition_penalty in (None, 1.0)
               else float(repetition_penalty))
    n = int(no_repeat_ngram_size or 0)
    if penalty is None and n <= 1:
        return None
    if penalty is not None and penalty <= 0:
        raise ValueError(f"repetition_penalty must be > 0, got {penalty}")
    ban_const = None if bannable is None else np.asarray(bannable, bool)

    def fn(logits: jnp.ndarray, tokens: jnp.ndarray, pos) -> jnp.ndarray:
        b, v = logits.shape
        t = tokens.shape[1]
        idx = jnp.arange(t)
        pvec = jnp.broadcast_to(jnp.asarray(pos), (b,))
        gen = (idx[None, :] >= n_prompt) & (idx[None, :] < pvec[:, None])
        ban_mask = (jnp.ones((v,), bool) if ban_const is None
                    else jnp.asarray(ban_const[:v]))
        rows = jnp.arange(b)[:, None]
        if penalty is not None:
            # Scatter generated ids into a (B, V) "seen" mask (column V
            # is the discard slot for non-generated positions).
            hist = jnp.where(gen, tokens, v)
            seen = jnp.zeros((b, v + 1), bool).at[rows, hist].set(True)[:, :v]
            seen = seen & ban_mask[None, :]
            logits = jnp.where(
                seen,
                jnp.where(logits > 0, logits / penalty, logits * penalty),
                logits)
        if n > 1:
            # The (n-1)-gram about to be completed: the last n-1
            # generated tokens of each row.
            offs = jnp.arange(n - 1)
            last_idx = jnp.clip(pvec[:, None] - (n - 1) + offs[None, :],
                                0, t - 1)
            last = jnp.take_along_axis(tokens, last_idx, axis=1)
            # Every history window of n-1 tokens (start j = 0..T-n),
            # compared against `last` via n-1 static shifts.
            win = jnp.stack([tokens[:, k : t - n + 1 + k]
                             for k in range(n - 1)], axis=-1)
            match = jnp.all(win == last[:, None, :], axis=-1)
            j_idx = jnp.arange(t - n + 1)
            valid = (match
                     & (j_idx[None, :] >= n_prompt)
                     & (j_idx[None, :] + n - 1 < pvec[:, None])
                     # no ban until n-1 generated tokens exist at all
                     & (pvec[:, None] - (n - 1) >= n_prompt))
            follow = tokens[:, n - 1:]
            banned = jnp.zeros((b, v + 1), bool).at[
                rows, jnp.where(valid, follow, v)].set(True)[:, :v]
            banned = banned & ban_mask[None, :]
            logits = jnp.where(banned, NEG_INF, logits)
        return logits

    return fn
