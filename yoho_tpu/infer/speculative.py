"""Speculative greedy decoding (draft-verify) — beyond-reference serving.

A small draft model proposes ``gamma`` tokens autoregressively; the target
model verifies all of them in ONE cached decode step (S = gamma + 1). The
cache sweep that dominates decode cost (PERFORMANCE.md: int8 cross-KV reads
are ~66% of the step and already run at ~90% of HBM peak, so the only lever
left is amortization) is thus shared by several tokens. Greedy verification
commits the longest prefix of proposals the target agrees with plus one
target token — the committed stream is IDENTICAL to target-only greedy
decoding, for any weights (tested: tests/test_speculative.py).

TPU-first mechanics (everything under one jit, static shapes):
  * one ``lax.while_loop`` over verify rounds; each round advances a
    DYNAMIC number of committed tokens (1..gamma+1) by moving a scalar
    write cursor — shapes never change.
  * both models share absolute cache positions; stale cache entries past
    the commit point are provably invisible (causal mask) and are
    overwritten by the next round's writes before they could be seen.
  * the draft's first step each round feeds TWO tokens (S=2) at cursor-2:
    an idempotent re-write that also fills the one-position cache gap a
    fully-accepted round leaves behind.
  * batches run in lockstep: the committed count per round is the MINIMUM
    acceptance across streams (+1). Every stream still commits its own
    greedy-consistent tokens `[p_0..p_{m-2}, g_{m-1}]`; lockstep only
    costs re-proposing tokens a faster stream already agreed to.

Speedup = (mean committed per round) x; with a well-matched draft
(e.g. whisper-tiny drafting for whisper-small/large) speech transcripts
accept 70-90%, i.e. ~3-4 tokens per cache sweep at gamma=4.

Equivalence precision note (measured on v5e,
experiments/speculative_bf16_parity_probe.py): with f32 activations the
output is BITWISE identical to greedy end-to-end on hardware. With bf16
activations, the S=1 and S=gamma+1 matmuls tile differently, so logits
can differ in the last bits — argmax flips only when the top-2 margin is
inside that noise (observed flip margin 5e-6 on random weights, where
ties abound; trained-model decisions sit orders of magnitude above it).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from yoho_tpu.infer.decode import as_f32_logits


def make_verify_step_fn(model, variables, cross_kvs):
    """Like ``make_whisper_step_fn`` but returns logits for ALL S input
    positions (needed to verify a whole proposal block in one step).
    Works for both Whisper and YOHO decode_step signatures."""

    def step(tokens, caches, pos):
        out = model.apply(
            variables, tokens, caches, cross_kvs, pos,
            method=type(model).decode_step,
        )
        if len(out) == 3:  # YOHO decode_step returns (logits, vp, caches)
            logits, _vp, new_caches = out
        else:
            logits, new_caches = out
        return logits, new_caches

    return step


def speculative_greedy_decode(
    target_step: Callable,  # (tokens (B,S), caches, pos) -> ((B,S,V), caches)
    draft_step: Callable,
    target_caches,
    draft_caches,
    prompt: jnp.ndarray,  # (B, P) int32, P >= 1
    max_len: int,
    eot_id: int,
    gamma: int = 4,
    suppress_ids: Sequence[int] = (),
    return_aux: bool = False,
    no_speech_id=None,
    sot_index=None,
    logits_fn: Optional[Callable] = None,
):
    """Returns ``(tokens (B, max_len) int32, lengths (B,) int32)`` with
    exactly the semantics of ``greedy_decode`` on the target model.

    Both cache sets must be long enough for ``max_len + gamma`` positions
    (stale-overwrite workspace past the horizon). ``return_aux`` adds a
    dict with ``no_speech_prob`` (target prefill logits, like
    ``greedy_decode``) and ``sum_logprob`` — the REAL cumulative logprob
    of the committed tokens under the (processed) target logits, same
    convention as greedy (EOT included, nothing after, horizon-clipped),
    so the no-speech rule and quality-fallback signals keep working with
    a draft model attached. A committed token is always the target
    argmax of its row, so its logprob is max(logits) - logsumexp(logits)
    of the processed verify logits — no extra softmax materialization.

    ``logits_fn(logits (B, V), tokens, pos)`` is the same post-processor
    contract as ``greedy_decode`` (timestamp rules etc.). During drafting
    and verification it sees a WORK buffer with the proposals written in:
    on the accepted prefix those equal the committed tokens, so the
    greedy-equivalence guarantee is preserved; rejected rows only ever
    influence discarded picks.
    """
    b, p = prompt.shape
    assert p >= 1 and p < max_len
    # gamma=0 would only surface as an obscure (B,1) vs (B,0) broadcast
    # error deep inside jit tracing of the agree comparison.
    assert gamma >= 1, f"gamma must be >= 1, got {gamma}"
    ext = max_len + gamma + 2  # slack so block writes never clamp

    sup = jnp.asarray(list(suppress_ids), jnp.int32) if len(suppress_ids) else None

    def _processed(logits, work, pos):
        logits = as_f32_logits(logits)
        if sup is not None:
            neg = jnp.full(sup.shape, jnp.finfo(jnp.float32).min, jnp.float32)
            logits = logits.at[:, sup].set(neg[None, :])
        if logits_fn is not None:
            logits = logits_fn(logits, work, pos)
        return logits

    def pick_one(logits, work, pos):  # (B, V) -> (B,) int32
        return jnp.argmax(_processed(logits, work, pos), axis=-1).astype(jnp.int32)

    def pick_lp(logits, work, pos):  # -> ((B,) int32, (B,) f32 logprob)
        pl = _processed(logits, work, pos)
        choice = jnp.argmax(pl, axis=-1).astype(jnp.int32)
        lp = jnp.max(pl, axis=-1) - jax.nn.logsumexp(pl, axis=-1)
        return choice, lp

    tokens = jnp.full((b, ext), eot_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))

    # Prefill both models on the prompt; commit the first target token.
    t_logits, target_caches = target_step(prompt.astype(jnp.int32),
                                          target_caches, 0)
    _d_logits, draft_caches = draft_step(prompt.astype(jnp.int32),
                                         draft_caches, 0)
    no_speech_prob = None
    if no_speech_id is not None:
        # <|nospeech|> mass at the SOT position's output distribution
        # (OpenAI probs_at_sot), not the last prompt token.
        src = t_logits[:, sot_index] if sot_index is not None \
            else t_logits[:, -1]
        probs0 = jax.nn.softmax(as_f32_logits(src), axis=-1)
        no_speech_prob = probs0[:, no_speech_id]
    first, lp0 = pick_lp(t_logits[:, -1], tokens, jnp.int32(p))
    tokens = tokens.at[:, p].set(first)
    finished0 = first == eot_id
    c0 = jnp.int32(p + 1)  # committed token count

    def cond(state):
        c, _tokens, _tc, _dc, finished, _lp = state
        return jnp.logical_and(c < max_len, ~jnp.all(finished))

    def body(state):
        c, tokens, t_caches, d_caches, finished, sum_lp = state

        # --- draft phase: propose gamma tokens --------------------------
        # First step S=2 at c-2: idempotent re-write of position c-2 plus
        # the (possible) gap at c-1 left by a fully-accepted round.
        # Proposals are also written into a WORK buffer so logits_fn
        # (timestamp rules) sees the same token context target greedy
        # would see on the accepted prefix.
        work = tokens
        first_in = jax.lax.dynamic_slice(tokens, (0, c - 2), (b, 2))
        d_logits, d_caches = draft_step(first_in, d_caches, c - 2)
        props = [pick_one(d_logits[:, -1], work, c)]
        work = jax.lax.dynamic_update_slice(work, props[0][:, None], (0, c))
        for j in range(1, gamma):
            d_logits, d_caches = draft_step(props[-1][:, None], d_caches,
                                            c - 1 + j)
            props.append(pick_one(d_logits[:, -1], work, c + j))
            work = jax.lax.dynamic_update_slice(work, props[-1][:, None],
                                                (0, c + j))
        proposals = jnp.stack(props, axis=1)  # (B, gamma)

        # --- verify phase: one target step over [last, p_0..p_{g-1}] ----
        last = jax.lax.dynamic_slice(tokens, (0, c - 1), (b, 1))
        verify_in = jnp.concatenate([last, proposals], axis=1)  # (B, g+1)
        t_logits, t_caches = target_step(verify_in, t_caches, c - 1)
        # Row i predicts position c+i; its rules context (positions < c+i
        # in `work`) is exactly the proposal prefix p_0..p_{i-1}.
        picks = [pick_lp(t_logits[:, i], work, c + i)
                 for i in range(gamma + 1)]
        greedy = jnp.stack([ch for ch, _ in picks], axis=1)  # (B, g+1)
        lp_rows = jnp.stack([lp for _, lp in picks], axis=1)  # (B, g+1)

        # --- lockstep acceptance -----------------------------------------
        agree = greedy[:, :-1] == proposals  # (B, gamma)
        n_i = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
        # Streams already finished should not constrain the others.
        m = jnp.min(jnp.where(finished, gamma, n_i)) + 1  # commit count

        # Per-stream committed block: [p_0..p_{m-2}, g_{m-1}] then EOT fill.
        idx = jnp.arange(gamma + 1)
        g_pick = jnp.take_along_axis(greedy, jnp.full((b, 1), m - 1), axis=1)
        block = jnp.where(
            idx[None, :] < m - 1,
            jnp.pad(proposals, ((0, 0), (0, 1))),  # p_i (pad col unused)
            jnp.where(idx[None, :] == m - 1, g_pick, eot_id),
        ).astype(jnp.int32)
        block = jnp.where(finished[:, None], eot_id, block)

        tokens = jax.lax.dynamic_update_slice(tokens, block, (0, c))

        # Quality signal: committed tokens are target argmaxes, so their
        # logprobs are lp_rows. Greedy's convention: count tokens up to
        # and INCLUDING a stream's first EOT, nothing after, and nothing
        # past the max_len horizon (the final round may commit into the
        # workspace slack that the caller truncates away).
        blk_eot = (block == eot_id).astype(jnp.int32) * (idx[None, :] < m)
        prior_eot = jnp.cumsum(blk_eot, axis=1) - blk_eot
        alive = ((idx[None, :] < m) & (prior_eot == 0)
                 & ~finished[:, None] & ((c + idx)[None, :] < max_len))
        sum_lp = sum_lp + jnp.sum(jnp.where(alive, lp_rows, 0.0), axis=1)

        # EOT tracking over the committed region only (first m entries).
        committed_eot = jnp.any(
            jnp.logical_and(idx[None, :] < m, block == eot_id), axis=1
        )
        finished = jnp.logical_or(finished, committed_eot)
        return c + m, tokens, t_caches, d_caches, finished, sum_lp

    _c, tokens, _tc, _dc, _fin, sum_lp = jax.lax.while_loop(
        cond, body,
        (c0, tokens, target_caches, draft_caches, finished0, lp0),
    )

    tokens = tokens[:, :max_len]
    is_eot = tokens[:, p:] == eot_id
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(any_eot, p + first_eot + 1, max_len).astype(jnp.int32)
    # Normalize: everything at/after the first EOT becomes EOT (greedy
    # semantics — uncommitted draft writes past EOT must not leak out).
    pos_idx = jnp.arange(max_len)[None, :]
    tokens = jnp.where(pos_idx >= lengths[:, None], eot_id, tokens)
    if return_aux:
        aux = {"sum_logprob": sum_lp}
        if no_speech_prob is not None:
            aux["no_speech_prob"] = no_speech_prob
        return tokens, lengths, aux
    return tokens, lengths
