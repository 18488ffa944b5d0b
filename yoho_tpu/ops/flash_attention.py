"""Pallas TPU flash attention (forward) with XLA recompute backward.

Owns the encoder-attention hot op (SURVEY.md §7 hard part #6): tiled
online-softmax attention that never materializes the (T x T) score matrix
in HBM. Q/K/V stream through VMEM in (block_q x block_k) tiles; softmax
statistics (running max / normalizer) live in registers; accumulation is
f32 on the MXU.

Layout contract: (batch*heads, seq, head_dim) — the wrapper folds/unfolds
and pads seq to tile multiples, masking padded keys. Causal masking is
applied inside the tile loop (k-blocks entirely above the diagonal are
skipped). The backward pass recomputes attention with plain XLA einsums
(cheap at these sizes, always correct); training uses it through
``jax.custom_vjp``.

On non-TPU backends the kernel runs in interpreter mode so the full test
suite exercises identical code paths on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attention_reference(q, k, v, causal: bool, scale: float):
    scores = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if causal:
        tq, tk = scores.shape[-2:]
        mask = jnp.arange(tk)[None, :] <= jnp.arange(tq)[:, None]
        scores = jnp.where(mask[None], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", w.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_k: int,
                  kv_len: int, causal: bool, scale: float, block_q: int):
    iq = pl.program_id(1)
    # Keep operands in their storage dtype (bf16 in serving): the MXU runs
    # bf16 x bf16 -> f32 at full rate, while f32 x f32 decomposes into
    # multiple passes. An earlier revision upcast q/k/v to f32 before the
    # dots and measured 0.67x XLA on the 1500-frame encoder — dtype alone.
    # Scale is applied to the f32 scores AFTER the dot (exact in f32).
    q = q_ref[0]  # (block_q, d)

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    num_k_blocks = seq_k // block_k

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(jk * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(jk * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k) f32

        kpos = jk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kpos < kv_len
        if causal:
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, kpos <= qpos)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # Probabilities go back to the storage dtype for the AV dot (the
        # standard flash trade: bf16 P at full MXU rate; the f32 softmax
        # statistics m/l keep normalization exact).
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    if causal:
        # Skip k-blocks entirely above the diagonal of this q-block.
        max_jk = jnp.minimum(
            num_k_blocks, ((iq + 1) * block_q + block_k - 1) // block_k
        )
    else:
        max_jk = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, max_jk, body, (m, l, acc))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, scale, block_q, block_k):
    return _flash_forward_impl(q, k, v, causal, scale, block_q, block_k)


def _flash_forward_impl(q, k, v, causal, scale, block_q, block_k):
    bh, tq, d = q.shape
    kv_len = k.shape[1]

    qp = _pad_to(q, block_q, 1)
    kp = _pad_to(k, block_k, 1)
    vp = _pad_to(v, block_k, 1)
    tq_pad, tk_pad = qp.shape[1], kp.shape[1]

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, seq_k=tk_pad, kv_len=kv_len,
        causal=causal, scale=scale, block_q=block_q,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq_pad * tk_pad * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad,
        ),
    )(qp, kp, vp)
    return out[:, :tq]


def _flash_fwd(q, k, v, causal, scale, block_q, block_k):
    out = _flash_forward_impl(q, k, v, causal, scale, block_q, block_k)
    return out, (q, k, v)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        return _attention_reference(q, k, v, causal, scale)

    _out, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, T, H, D)
    v: jnp.ndarray,  # (B, T, H, D)
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """Drop-in for the XLA attention path (same (B, S, H, D) layout as
    ``yoho_tpu.nn.layers._attend`` but unscaled inputs — pass ``scale``)."""
    b, s, h, d = q.shape
    t = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(128, 1 << (s - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (t - 1).bit_length()))

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    out = _flash(qf, kf, vf, causal, float(scale), block_q, block_k)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
