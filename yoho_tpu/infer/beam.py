"""Batched beam search, fully on-device (static beam tensors under one jit).

Absent from the reference (greedy argmax only — ``whisper.py:279``,
SURVEY.md §1 "what does NOT exist"). TPU-first design: beams live as a
folded (batch*beam) leading axis on the caches so every step is one batched
decode; beam reordering is a gather along that axis; GNMT length penalty at
finalization keeps selection deterministic.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from yoho_tpu.infer.decode import as_f32_logits

NEG_INF = jnp.finfo(jnp.float32).min


def tile_beams(tree, k: int):
    """Repeat each batch row k times along axis 0: (B, ...) -> (B*k, ...)."""
    return jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0), tree)


def _gather_beams(tree, beam_src: jnp.ndarray):
    """Reorder a (B*K, ...)-leading pytree by per-batch beam indices (B, K)."""
    b, k = beam_src.shape

    def _g(x):
        xs = x.reshape(b, k, *x.shape[1:])
        idx = beam_src.reshape(b, k, *([1] * (x.ndim - 1)))
        return jnp.take_along_axis(xs, idx, axis=1).reshape(x.shape)

    return jax.tree_util.tree_map(_g, tree)


def beam_search(
    step_fn: Callable,
    caches,  # caches built for batch B*K
    prompt: jnp.ndarray,  # (B, P)
    max_len: int,
    eot_id: int,
    beams: int = 5,
    length_penalty: float = 1.0,
    suppress_ids: Sequence[int] = (),
    logits_fn=None,
    return_aux: bool = False,
    no_speech_id=None,
    sot_index=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(tokens (B, max_len), lengths (B,), best scores (B,))``.

    ``step_fn`` must operate on a folded (B*K) batch. Close over the
    UNtiled (B, ...) ``cross_kvs``: the attention layers detect the
    batch mismatch and fold beams into the query axis so all K beams
    share one cross-KV read (``nn.layers._beam_fold``); tiling with
    :func:`tile_beams` still works but costs K x the cross-KV HBM
    traffic per step.

    ``return_aux=True`` additionally returns the quality-signal dict of
    :func:`yoho_tpu.infer.decode.greedy_decode`: ``sum_logprob`` is the
    best beam's RAW cumulative logprob (unpenalized — the returned
    ``scores`` stay length-penalized, they drive selection), and
    ``no_speech_prob`` (when ``no_speech_id`` is given) is measured on
    beam 0 at the first generated position.
    """
    b, p = prompt.shape
    k = beams
    v_prompt = tile_beams(prompt, k)  # (B*K, P)

    tokens = jnp.full((b, k, max_len), eot_id, jnp.int32)
    tokens = tokens.at[:, :, :p].set(prompt[:, None, :].astype(jnp.int32))
    # Beam 0 active, rest -inf so the first expansion doesn't duplicate.
    scores = jnp.tile(jnp.asarray([0.0] + [float(NEG_INF)] * (k - 1)), (b, 1))
    finished = jnp.zeros((b, k), bool)

    logits_all, caches = step_fn(v_prompt.astype(jnp.int32), caches, 0)
    logits = logits_all[:, -1]  # (B*K, V)
    vocab = logits.shape[-1]

    no_speech_prob = None
    if no_speech_id is not None:
        # Whisper silence signal: <|nospeech|> mass at the SOT position's
        # output distribution (OpenAI's probs_at_sot), beam 0 (all beams
        # are identical before the first expansion).
        src = (logits_all[:, sot_index]
               if sot_index is not None else logits)
        probs0 = jax.nn.softmax(
            as_f32_logits(src.reshape(b, k, vocab)[:, 0]), axis=-1)
        no_speech_prob = probs0[:, no_speech_id]

    if len(suppress_ids):
        sup = jnp.asarray(list(suppress_ids), jnp.int32)
    else:
        sup = None

    def expand(logits, scores, finished, tokens, pos):
        logits = as_f32_logits(logits)
        if sup is not None:
            # Suppress BEFORE the rules, matching greedy (decode.pick) and
            # OpenAI's processor order — the timestamp probability rule's
            # softmax must not see mass on suppressed specials.
            neg = jnp.full(sup.shape, NEG_INF, jnp.float32)
            logits = logits.at[:, sup].set(neg[None, :])
        if logits_fn is not None:
            # Per-beam logits processing (e.g. whisper timestamp rules);
            # sees the flattened (B*K, T) token buffer.
            logits = logits_fn(logits, tokens.reshape(b * k, -1), pos)
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp = logp.reshape(b, k, vocab)
        # Finished beams may only emit EOT, at no additional cost.
        eot_only = jnp.full((vocab,), NEG_INF).at[eot_id].set(0.0)
        logp = jnp.where(finished[:, :, None], eot_only[None, None, :], logp)
        total = scores[:, :, None] + logp  # (B, K, V)
        flat = total.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        beam_src = (top_idx // vocab).astype(jnp.int32)
        tok = (top_idx % vocab).astype(jnp.int32)
        return top_scores, beam_src, tok

    top_scores, beam_src, tok = expand(logits, scores, finished, tokens, p)
    tokens = _gather_beams(tokens.reshape(b * k, max_len), beam_src).reshape(b, k, max_len)
    caches = _gather_beams(caches, beam_src)
    finished = jnp.take_along_axis(finished, beam_src, axis=1) | (tok == eot_id)
    tokens = tokens.at[:, :, p].set(tok)
    scores = top_scores

    def cond(state):
        pos, _t, _c, _s, finished = state
        return jnp.logical_and(pos + 1 < max_len, ~jnp.all(finished))

    identity_src = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (b, 1))

    def body(state):
        pos, tokens, caches, scores, finished = state
        cur = jax.lax.dynamic_slice(tokens.reshape(b * k, max_len), (0, pos), (b * k, 1))
        logits, caches = step_fn(cur, caches, pos)
        top_scores, beam_src, tok = expand(logits[:, -1], scores, finished,
                                           tokens, pos + 1)
        tokens = _gather_beams(tokens.reshape(b * k, max_len), beam_src).reshape(
            b, k, max_len
        )
        # The cache reorder is the step's big HBM write (every layer's
        # K/V moved). When the expansion keeps every beam in place —
        # common once beams settle on confident stretches — skip it:
        # lax.cond executes only the taken branch, and the identity
        # branch returns the operands untouched.
        caches = jax.lax.cond(
            jnp.all(beam_src == identity_src),
            lambda c: c,
            lambda c: _gather_beams(c, beam_src),
            caches,
        )
        finished = jnp.take_along_axis(finished, beam_src, axis=1) | (tok == eot_id)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok[:, :, None], (0, 0, pos + 1)
        )
        return pos + 1, tokens, caches, top_scores, finished

    _pos, tokens, _caches, scores, _fin = jax.lax.while_loop(
        cond, body, (jnp.asarray(p, jnp.int32), tokens, caches, scores, finished)
    )

    # Lengths per beam (first EOT after prompt, inclusive).
    is_eot = tokens[:, :, p:] == eot_id
    any_eot = jnp.any(is_eot, axis=-1)
    first_eot = jnp.argmax(is_eot, axis=-1)
    lengths = jnp.where(any_eot, p + first_eot + 1, max_len)

    # GNMT length penalty: score / ((5 + GENERATED len) / 6) ** alpha.
    # Generated-token count only — including the prompt would couple the
    # ranking to prompt length (a ~200-token conditioning prompt
    # collapses the 5-vs-50-token penalty ratio from ~5.5x to ~1.2x) and
    # diverge from OpenAI's MaximumLikelihoodRanker.
    gen = (lengths - p).astype(jnp.float32)
    lp = ((5.0 + gen) / 6.0) ** length_penalty
    final = scores / lp
    best = jnp.argmax(final, axis=1)

    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    if return_aux:
        aux = {"sum_logprob":
               jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]}
        if no_speech_prob is not None:
            aux["no_speech_prob"] = no_speech_prob
        return best_tokens, best_lengths.astype(jnp.int32), best_scores, aux
    return best_tokens, best_lengths.astype(jnp.int32), best_scores
