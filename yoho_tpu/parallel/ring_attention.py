"""Ring attention: sequence-parallel exact attention over a mesh axis.

The sequence/context-parallel capability the reference has no trace of
(SURVEY.md §2.3 — its max context is 1500 encoder frames on one device).
This unlocks single-pass encoding of audio LONGER than one device's
memory allows for RoPE models (the YOHO encoder has no learned positional
table to outgrow — unlike Whisper, whose 1500-position embedding caps its
context by construction): shard the time axis over a mesh axis and
compute EXACT bidirectional attention with a ring of ``ppermute`` steps.

Mechanics (Liu et al., "Ring Attention with Blockwise Transformers",
re-derived for the bidirectional encoder case — no causal masking, no
skew): every shard holds (B, H, S_local, D) of q/k/v. For ``n`` ring
steps each shard attends its resident q against the k/v block currently
held, folds the scores into an online-softmax accumulator (running max
``m``, normalizer ``l``, weighted sum ``acc`` — the flash-attention
recurrence in f32), then passes its k/v block to the next shard over the
ring. After ``n`` steps every q has seen every k/v exactly once; compute
and ICI transfer overlap is XLA's job (the ppermute is issued per step,
so the next block streams while the current one is contracted).

Use inside ``shard_map`` with the time axis sharded::

    @partial(shard_map, mesh=mesh, in_specs=P(None, None, "seq", None),
             out_specs=P(None, None, "seq", None))
    def attn(q, k, v):
        return ring_attention(q, k, v, axis_name="seq")

Exactness is tested against single-device softmax attention on the faked
8-device CPU mesh (tests/test_distributed.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,  # (B, Hq, S_local, D) — this shard's queries
    k: jnp.ndarray,  # (B, Hkv, S_local, D) — this shard's resident keys
    v: jnp.ndarray,  # (B, Hkv, S_local, D)
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact bidirectional attention over the full (sharded) sequence.

    Must run inside ``shard_map``/``pmap`` with ``axis_name`` bound.
    Returns this shard's (B, Hq, S_local, D) attention output. GQA-aware:
    ``Hq`` may be a multiple of ``Hkv`` — the UNEXPANDED k/v blocks ride
    the ring (group expansion would multiply ICI traffic by the group
    count for identical results); query groups broadcast against their
    shared KV head inside the contraction. Softmax statistics accumulate
    in f32 regardless of input dtype (the same numerics discipline as
    ops/flash_attention.py).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, hq, s, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0, f"q heads {hq} not a multiple of kv heads {hkv}"
    g = hq // hkv
    qf = (q.astype(jnp.float32) * scale).reshape(b, hkv, g, s, d)
    # Derive the accumulators from qf so they carry the same
    # varying-over-axis type as the loop body's outputs (fresh constants
    # are "invariant" under shard_map and fail the fori_loop carry check).
    acc0 = qf * 0.0
    m0 = qf[..., :1] * 0.0 + NEG_INF
    l0 = qf[..., :1] * 0.0

    def fold(acc, m, l, kb, vb):
        """Flash-attention recurrence over one resident k/v block."""
        scores = jnp.einsum("bhgsd,bhtd->bhgst", qf, kb.astype(jnp.float32))
        m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhgst,bhtd->bhgsd", p,
                                       vb.astype(jnp.float32))
        return acc, m_new, l

    def body(_i, carry):
        acc, m, l, kb, vb = carry
        acc, m, l = fold(acc, m, l, kb, vb)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return acc, m, l, kb, vb

    # n-1 fold+permute steps, then fold the last resident block WITHOUT
    # permuting — the final transfer would be dead ICI traffic (1/n of
    # the ring's total), and collectives inside fori_loop cannot be DCEd.
    acc, m, l, kb, vb = jax.lax.fori_loop(0, n - 1, body,
                                          (acc0, m0, l0, k, v))
    acc, _m, l = fold(acc, m, l, kb, vb)
    return (acc / l).reshape(b, hq, s, d).astype(q.dtype)
