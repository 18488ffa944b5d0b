"""Fully-jitted autoregressive decoding (greedy / temperature sampling).

The reference's decode loop re-runs the full decoder over all 448 positions
per emitted token from Python, syncing to host every step
(``yoho/src/nn/whisper.py:274-285`` — SURVEY.md §3.1 marks it the #1 perf
target). Here the whole loop is one ``lax.while_loop`` under ``jit``:
static-shape token buffer, per-layer KV caches, per-stream EOT tracking with
early exit when every stream finished. No host sync until the final buffer
comes back.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def make_whisper_step_fn(model, variables, cross_kvs):
    """step_fn(tokens, caches, pos) -> (ALL-position logits (B, S, V),
    new caches). Decoders slice ``[:, -1]`` for the autoregressive pick
    (free: the in-loop steps have S=1); the full prefill logits also
    carry the <|nospeech|> distribution at the SOT position — OpenAI
    reads no-speech probability at ``sot_index``, not at the last
    prompt token (whisper decoding.py ``probs_at_sot``)."""

    def step(tokens, caches, pos):
        logits, new_caches = model.apply(
            variables, tokens, caches, cross_kvs, pos, method=type(model).decode_step
        )
        return logits, new_caches

    return step


def make_yoho_step_fn(model, variables, cross_kvs):
    """Same contract for the YOHO model (voiceprints are extracted after
    decoding by one teacher-forced pass — see ``yoho_tpu.infer.pipeline``)."""

    def step(tokens, caches, pos):
        logits, _vp, new_caches = model.apply(
            variables, tokens, caches, cross_kvs, pos, method=type(model).decode_step
        )
        return logits, new_caches

    return step


def as_f32_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """bf16 logits -> f32 for sampling/softmax, fusion-safely.

    A plain ``.astype(jnp.float32)`` lets XLA:CPU fuse the convert into
    the producing bf16 tied-embedding dot, emitting a BF16 x BF16 = F32
    DotThunk its runtime cannot execute (UNIMPLEMENTED, surfacing at
    materialization — observed at B >= 2). The barrier keeps the dot
    bf16-out with a separate convert; free on TPU (one elementwise op on
    a (B, V) tensor)."""
    if logits.dtype == jnp.float32:
        return logits
    return jax.lax.optimization_barrier(logits).astype(jnp.float32)


def _suppress(logits: jnp.ndarray, suppress_ids) -> jnp.ndarray:
    if len(suppress_ids):
        ids = jnp.asarray(list(suppress_ids), jnp.int32)
        neg = jnp.full((len(suppress_ids),), jnp.finfo(jnp.float32).min, logits.dtype)
        logits = logits.at[:, ids].set(neg[None, :])
    return logits


def greedy_decode(
    step_fn: Callable,
    caches,
    prompt: jnp.ndarray,  # (B, P) int32 — same prompt length for all streams
    max_len: int,
    eot_id: int,
    suppress_ids: Sequence[int] = (),
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    logits_fn: Optional[Callable] = None,
    return_aux: bool = False,
    no_speech_id: Optional[int] = None,
    sot_index: Optional[int] = None,
):
    """Decode up to ``max_len`` total tokens (prompt included).

    Returns ``(tokens (B, max_len) int32, lengths (B,) int32)``. After a
    stream emits ``eot_id`` its remaining positions are filled with
    ``eot_id``. ``lengths`` counts tokens up to and including EOT.
    ``logits_fn(logits, tokens, pos)`` optionally post-processes logits per
    step, seeing the full token buffer and the position being generated
    (timestamp rules etc.) — must be jit-traceable.

    ``return_aux=True`` additionally returns a dict with per-stream quality
    signals: ``sum_logprob`` (sum over emitted tokens, EOT included) and —
    when ``no_speech_id`` is given — ``no_speech_prob`` measured at the
    first generated position (whisper silence detection).
    """
    b, p = prompt.shape
    assert p < max_len, "prompt must be shorter than max_len"
    tokens = jnp.full((b, max_len), eot_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))

    # Prefill the whole prompt in one step; sample the first new token.
    logits_all, caches = step_fn(prompt.astype(jnp.int32), caches, 0)
    logits = logits_all[:, -1]

    no_speech_prob = None
    if no_speech_id is not None:
        # OpenAI measures <|nospeech|> mass at the SOT position's output
        # distribution (whisper decoding.py probs_at_sot), where the
        # model was trained to emit it — NOT at the last prompt token.
        src = logits_all[:, sot_index] if sot_index is not None else logits
        probs0 = jax.nn.softmax(as_f32_logits(src), axis=-1)
        no_speech_prob = probs0[:, no_speech_id]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def pick(logits, tokens, pos, key):
        logits = _suppress(as_f32_logits(logits), suppress_ids)
        if logits_fn is not None:
            logits = logits_fn(logits, tokens, pos)
        if temperature > 0.0:
            nxt = jax.random.categorical(key, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        if return_aux:
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        else:
            lp = jnp.zeros((b,), jnp.float32)
        return nxt, lp

    first, lp0 = pick(logits, tokens, p, jax.random.fold_in(rng, p))
    first = first.astype(jnp.int32)
    tokens = tokens.at[:, p].set(first)
    finished0 = first == eot_id

    def cond(state):
        pos, _tokens, _caches, finished, _sum_lp = state
        return jnp.logical_and(pos + 1 < max_len, ~jnp.all(finished))

    def body(state):
        pos, tokens, caches, finished, sum_lp = state
        cur = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))
        logits, caches = step_fn(cur, caches, pos)
        logits = logits[:, -1]
        nxt, lp = pick(logits, tokens, pos + 1, jax.random.fold_in(rng, pos + 1))
        nxt = nxt.astype(jnp.int32)
        nxt = jnp.where(finished, eot_id, nxt)
        sum_lp = sum_lp + jnp.where(finished, 0.0, lp)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        finished = jnp.logical_or(finished, nxt == eot_id)
        return pos + 1, tokens, caches, finished, sum_lp

    _pos, tokens, _caches, _fin, sum_lp = jax.lax.while_loop(
        cond, body, (jnp.asarray(p, jnp.int32), tokens, caches, finished0, lp0)
    )

    # Length = index of first EOT at/after the prompt, +1 (includes EOT);
    # streams that never emitted EOT get max_len.
    is_eot = tokens[:, p:] == eot_id
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(any_eot, p + first_eot + 1, max_len).astype(jnp.int32)
    if return_aux:
        aux = {"sum_logprob": sum_lp}
        if no_speech_prob is not None:
            aux["no_speech_prob"] = no_speech_prob
        return tokens, lengths, aux
    return tokens, lengths
