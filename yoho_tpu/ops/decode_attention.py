"""Pallas TPU fused decode attention over time-minor (B, H, D, T) KV.

The serving decode step is HBM-bandwidth-bound on cross-KV reads
(PERFORMANCE.md): per token it streams the whole int8 cross-KV
(whisper-small B=128: ~3.5 GB). This kernel is a flash-decode: K/V stream
through VMEM in (H, D, T_block) tiles, softmax statistics (running max /
normalizer / accumulator) live in VMEM scratch across T-blocks, and
dequantize -> scores -> mask -> online softmax -> value accumulation all
happen in one pass — no (B, H, S, T) score intermediates, no second sweep
over the cache.

Block size matters: a whole (H, D, T) cross-KV slab per program (~4.7 MB
for whisper-small) exceeds what Mosaic can double-buffer in 16 MB VMEM, so
the pipeline stalls on DMA (measured 563 GB/s vs 651 GB/s for the XLA
lowering). Streaming ~0.8 MB T-blocks keeps the prefetch pipeline full.

Contract (matches ``yoho_tpu.nn.layers._attend_quantized`` semantics):

  q        (B, Hq, S, D)   bf16/f32, already scaled (head_dim ** -0.25 etc.)
  k, v     (B, Hkv, D, T)  int8 (with scales) or bf16 (scales=None)
  k_scale  (B, Hkv, 1, T)  per-position dequant scales (optional)
  v_scale  (B, Hkv, 1, T)  folded into attention weights (optional)
  pos      scalar int32    causal mask: query row i sees keys <= pos + i
  kv_len   static int      only keys < kv_len are valid (padded caches)
  groups   static int      Hq = groups * Hkv (GQA); head h reads kv head h//groups

Returns (B, S, Hq, D) in q.dtype. T must be a multiple of 128 (cache
layouts are lane-padded already — see KVCache docstring). S is small and
static (1 for decode, a few for prefill/speculative verify).

Runs in interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _unpack4(x):
    """(D/2, Tb) uint8 nibble-packed -> (D, Tb) bf16 in [-8, 7] (sublane
    concat, no interleave — packing order from layers.quantize_kv4).
    Nibble arithmetic runs in i32 — Mosaic has no 8-bit vector ALU ops."""
    xi = x.astype(jnp.int32)
    lo = (xi & 0xF) - 8
    hi = (xi >> 4) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                        m_scr, l_scr, acc_scr, *,
                        kv_len: int, groups: int, causal: bool,
                        quantized: bool, packing: int):
    """Grid (B, T_blocks): online softmax across T-blocks per batch elem."""
    jt = pl.program_id(1)
    nt = pl.num_programs(1)
    n_q_heads = q_ref.shape[1]
    s = q_ref.shape[2]
    tb = k_ref.shape[3]
    base = jt * tb

    @pl.when(jt == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    col = base + jax.lax.broadcasted_iota(jnp.int32, (s, tb), 1)
    valid = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, tb), 0)
        valid = jnp.logical_and(valid, col <= pos_ref[0, 0] + row)

    for h in range(n_q_heads):
        hk = h // groups
        qh = q_ref[0, h]              # (S, D)
        # int8/int4 -> bf16 is exact for the code range; the MXU then
        # multiplies bf16 x bf16 with f32 accumulation like the XLA path.
        if packing == 2:
            kh = _unpack4(k_ref[0, hk])            # (D, Tb)
        else:
            kh = k_ref[0, hk].astype(jnp.bfloat16)  # (D, Tb)
        scores = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, Tb)
        if quantized:
            scores = scores * ks_ref[0, hk].astype(jnp.float32)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_scr[h]             # (S, 1)... stored as (S, 128) padded
        m_blk = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)            # (S, 1)
        p = jnp.exp(scores - m_new)                # (S, Tb)
        l_new = l_scr[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_ref[0, hk].astype(jnp.float32)
        if packing == 2:
            vh = _unpack4(v_ref[0, hk])            # (D, Tb)
        else:
            vh = v_ref[0, hk].astype(jnp.bfloat16)  # (D, Tb)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, D)
        acc_new = acc_scr[h] * alpha + pv

        m_scr[h] = m_new
        l_scr[h] = l_new
        acc_scr[h] = acc_new

    @pl.when(jt == nt - 1)
    def _emit():
        for h in range(n_q_heads):
            o_ref[0, h] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)
            ).astype(o_ref.dtype)


def _pick_block(t: int, target: int = 512) -> int:
    for cand in (target, 256, 128):
        if t % cand == 0:
            return cand
    return t


@functools.partial(
    jax.jit,
    static_argnames=("kv_len", "groups", "causal", "packing", "interpret"),
)
def _decode_attention_call(q, k, v, k_scale, v_scale, pos, *, kv_len: int,
                           groups: int, causal: bool, packing: int,
                           interpret: bool):
    b, hq, s, d = q.shape
    hkv, dk, t = k.shape[1], k.shape[2], k.shape[3]  # dk = d // packing
    quantized = k_scale is not None
    tb = _pick_block(t)

    if quantized:
        scale_spec = pl.BlockSpec((1, hkv, 1, tb), lambda i, j: (i, 0, 0, j),
                                  memory_space=pltpu.VMEM)
    else:
        # Placeholder refs keep the kernel arity fixed, but must not
        # stream with the T grid: a (B, Hkv, 1, T) dummy added ~2/D
        # (~3% at D=64) dead HBM traffic to a bandwidth-bound kernel.
        # One 128-lane block with a constant index map stays resident.
        k_scale = jnp.zeros((b, hkv, 1, 128), jnp.bfloat16)
        v_scale = k_scale
        scale_spec = pl.BlockSpec((1, hkv, 1, 128), lambda i, j: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    pos_arr = jnp.reshape((pos if pos is not None else jnp.int32(0)),
                          (1, 1)).astype(jnp.int32)

    kernel = functools.partial(
        _decode_attn_kernel, kv_len=kv_len, groups=groups, causal=causal,
        quantized=quantized, packing=packing,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, t // tb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hq, s, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, dk, tb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, dk, tb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((1, hq, s, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hq, s, 1), jnp.float32),   # running max
            pltpu.VMEM((hq, s, 1), jnp.float32),   # running normalizer
            pltpu.VMEM((hq, s, d), jnp.float32),   # running accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * t * d,
            bytes_accessed=(k.size * k.dtype.itemsize) * 2
            + (k_scale.size * 2) * 2 + q.size * 2,
            transcendentals=b * hq * s * t,
        ),
    )(pos_arr, q, k, v, k_scale, v_scale)
    return out.transpose(0, 2, 1, 3)  # (B, S, Hq, D)


def fused_decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    pos=None,
    kv_len: Optional[int] = None,
    groups: int = 1,
    packing: int = 1,
) -> jnp.ndarray:
    """Fused attention for the decode hot loop; see module docstring.

    ``pos=None`` means bidirectional over the valid prefix (cross-attention);
    otherwise causal at offset ``pos``. ``packing=2`` marks nibble-packed
    int4 K/V (see ``layers.quantize_kv4``). Returns (B, S, Hq, D) in q.dtype.
    """
    t = k.shape[3]
    if kv_len is None:
        kv_len = t
    if t % 128 != 0:
        raise ValueError(f"T={t} must be a lane multiple (128); pad the cache")
    interpret = jax.default_backend() != "tpu"
    return _decode_attention_call(
        q, k, v, k_scale, v_scale, pos, kv_len=kv_len, groups=groups,
        causal=pos is not None, packing=packing, interpret=interpret,
    )
