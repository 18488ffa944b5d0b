"""Layer library: attention (with static-shape KV cache), RoPE, SwiGLU, GQA.

Design notes vs the reference (cited per SURVEY.md §2.1):

* Whisper attention reproduces OpenAI's exact semantics — biases on q/v/out
  but NOT k, scale ``head_dim**-0.25`` applied to both q and k
  (``yoho/src/nn/whisper.py:32-35,54-57``) — so pretrained weights produce
  identical activations.
* The KV cache the reference never built (``whisper.py:27`` TODO) is
  first-class here: static-shape cache tensors threaded functionally through
  ``__call__`` so the whole decode loop stays under one ``jit``
  (no flax mutable-variable machinery, which doesn't compose with
  ``lax.while_loop``).
* ``GroupedQueryAttention`` implements the GQA paper correctly: each group
  of query heads attends with its own KV head. The reference's einsum sums
  over the group axis before softmax (``yoho/src/nn/layers.py:82``) — a
  deviation from its cited paper that collapses query groups; we implement
  the intended semantics (divergence documented per SURVEY.md §7).
* ``RoPE`` defaults to the standard 10000^(-2i/d) frequency spectrum; the
  reference uses decade spacing ``10**-i`` starting at position 1
  (``layers.py:31-33``), available as ``rope_variant="decade"`` for
  compatibility experiments.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


def maybe_remat(block_cls, flag: bool):
    """Per-block gradient checkpointing (lifted ``nn.remat``) when ``flag``.

    Exact: same function, same grads; the backward pass recomputes each
    block's activations from its input instead of keeping them live, so
    training activation memory drops from O(depth) to O(1) blocks at the
    cost of one extra forward. Lifted remat preserves parameter names, so
    checkpoints are interchangeable with the flag on or off.

    Keeps JAX's default ``prevent_cse=True``: every consumer runs the
    blocks in a plain Python loop under ``jit``, which is exactly the
    case the default protects — without the CSE barriers XLA may dedupe
    the backward recomputation against the kept forward values and
    silently reinstate O(depth) live activations (``prevent_cse=False``
    is for bodies already inside ``lax.scan``/``pmap``).
    """
    return nn.remat(block_cls) if flag else block_cls


@struct.dataclass
class KVCache:
    """Static-shape decode cache for one attention layer.

    k/v: (batch, kv_heads, head_dim, max_len) — time-MINOR layout, chosen
    for TPU memory tiling: HBM arrays are tiled in their last two dims with
    128 lanes, so a time-major (…, T, 64) cache is physically padded to
    (…, T, 128) — 2x HBM traffic on the decode hot loop — and the batched
    GEMV then needs a full-cache transpose on top (measured: ~3x total
    step cost at whisper-small B=64). With D=64 sublanes x T lanes both
    K·q and V·w contract MXU-natively with zero padding and zero
    transposes. ``index`` is implicit — the caller passes the write
    position so caches stay pure data.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, batch: int, kv_heads: int, max_len: int, head_dim: int,
              dtype=jnp.bfloat16):
        shape = (batch, kv_heads, head_dim, max_len)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    def update(self, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "KVCache":
        """Write (B, H, D, S) new entries at time offset ``pos``.

        ``pos`` may be a per-row vector (B,) with S == 1 — the
        continuous-batching layout where every slot decodes at its own
        position (scatter instead of slice-update)."""
        if getattr(pos, "ndim", 0) == 1:
            assert k_new.shape[3] == 1, "vector pos supports S == 1 only"
            rows = jnp.arange(self.k.shape[0])
            k = self.k.at[rows, :, :, pos].set(
                k_new[..., 0].astype(self.k.dtype))
            v = self.v.at[rows, :, :, pos].set(
                v_new[..., 0].astype(self.v.dtype))
            return KVCache(k=k, v=v)
        k = jax.lax.dynamic_update_slice(
            self.k, k_new.astype(self.k.dtype), (0, 0, 0, pos)
        )
        v = jax.lax.dynamic_update_slice(
            self.v, v_new.astype(self.v.dtype), (0, 0, 0, pos)
        )
        return KVCache(k=k, v=v)


@struct.dataclass
class QuantizedKV:
    """Int8 cross-attention KV with per-(batch, head, position) scales.

    Decode is HBM-bound on cross-KV reads (whisper-small B=64: ~60% of the
    step); int8 halves that traffic. Scales factor out of both attention
    contractions exactly: scores = (q @ k_q) * k_scale, and the value
    product folds v_scale into the (tiny) attention weights — so the only
    approximation is the 8-bit rounding of K/V themselves.
    Layout matches KVCache: values (B, H, D, T), scales (B, H, 1, T).
    """

    k_q: jnp.ndarray
    v_q: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray
    # Valid prefix when T is lane-padded (static metadata, not a leaf).
    kv_len: Optional[int] = struct.field(pytree_node=False, default=None)
    # Elements per stored byte: 1 = int8, 2 = two int4 nibbles along D
    # (k_q/v_q are then (B, H, D//2, T) uint8; see quantize_kv4).
    packing: int = struct.field(pytree_node=False, default=1)


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray,
                pad_to: Optional[int] = None,
                time_major: bool = False) -> QuantizedKV:
    """Quantize K/V to int8, absmax per (batch, head, position).

    Inputs are time-minor (B, H, D, T), or time-MAJOR (B, T, H, D) with
    ``time_major=True`` — the layout projections produce before the
    decode-layout transpose. Quantizing first and transposing the int8
    codes moves 4x less data through the layout copy than transposing
    f32/bf16 and quantizing after (the f32 (B, 1500, 768) copies were
    ~3 GB of HLO temps at B=352 whisper-small — the difference between
    OOM and fitting). Both layouts produce bit-identical codes: absmax is
    a selection, so the reduce picks the same elements either way, and
    the f32 upcast for the rounding fuses into the quantize loop.

    ``pad_to`` zero-pads T up to a multiple (TPU lane alignment for the
    fused decode kernel); the original length is recorded as ``kv_len``
    and padded positions are masked by every consumer. Output is always
    time-minor: q (B, H, D, T) int8, scale (B, H, 1, T) bf16.
    """
    d_axis = 3 if time_major else 2

    def _q(x):
        # Reduce BEFORE converting: max is a selection, so a bf16-input
        # reduce picks the identical element as an f32 one, and keeping
        # the big tensor in its source dtype lets XLA fuse the f32
        # upcast into the quantize loop instead of materializing an f32
        # copy of the whole K/V.
        scale = jnp.max(jnp.abs(x), axis=d_axis,
                        keepdims=True).astype(jnp.float32) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        q, scale = q.astype(jnp.int8), scale.astype(jnp.bfloat16)
        if time_major:  # (B, T, H, D|1) -> (B, H, D|1, T) on int8/bf16
            q = jnp.transpose(q, (0, 2, 3, 1))
            scale = jnp.transpose(scale, (0, 2, 3, 1))
        return q, scale

    kv_len = None
    t = k.shape[1] if time_major else k.shape[3]
    k_q, k_scale = _q(k)
    v_q, v_scale = _q(v)
    if pad_to is not None and t % pad_to:
        pad = pad_to - t % pad_to
        widths = [(0, 0), (0, 0), (0, 0), (0, pad)]
        k_q, v_q = jnp.pad(k_q, widths), jnp.pad(v_q, widths)
        k_scale, v_scale = jnp.pad(k_scale, widths), jnp.pad(v_scale, widths)
        kv_len = t
    return QuantizedKV(k_q=k_q, v_q=v_q, k_scale=k_scale, v_scale=v_scale,
                       kv_len=kv_len)


def quantize_kv4(k: jnp.ndarray, v: jnp.ndarray,
                 pad_to: Optional[int] = None,
                 time_major: bool = False) -> QuantizedKV:
    """Int4 variant of :func:`quantize_kv`: absmax per position over D,
    4-bit codes in [-8, 7] stored two-per-byte along D — k_q/v_q become
    (B, H, D//2, T) uint8 with D[0:D/2] in the low nibbles and D[D/2:D]
    in the high nibbles (a sublane concat at unpack time, no interleave).
    ``time_major=True`` takes (B, T, H, D) inputs and transposes the
    packed codes instead of the floats (see quantize_kv).

    Quarters the dominant decode HBM term vs bf16 (half of int8). Unlike
    int8 (argmax-identical in tests) int4 is a real approximation —
    serving exposes it as an opt-in quality/throughput trade.
    """
    d_axis = 3 if time_major else 2

    def _q(x):
        # Selection-reduce in the source dtype, upcast after (see
        # quantize_kv: identical result, no f32 copy of the full K/V).
        scale = jnp.max(jnp.abs(x), axis=d_axis,
                        keepdims=True).astype(jnp.float32) / 7.0
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7) + 8.0
        q = q.astype(jnp.uint8)
        d = q.shape[d_axis]
        if time_major:
            lo, hi = q[..., : d // 2], q[..., d // 2:]
            packed = jnp.transpose(lo | (hi << 4), (0, 2, 3, 1))
            return packed, jnp.transpose(scale.astype(jnp.bfloat16),
                                         (0, 2, 3, 1))
        lo, hi = q[:, :, : d // 2], q[:, :, d // 2:]
        return lo | (hi << 4), scale.astype(jnp.bfloat16)

    kv_len = None
    t = k.shape[1] if time_major else k.shape[3]
    k_q, k_scale = _q(k)
    v_q, v_scale = _q(v)
    if pad_to is not None and t % pad_to:
        pad = pad_to - t % pad_to
        widths = [(0, 0), (0, 0), (0, 0), (0, pad)]
        k_q, v_q = jnp.pad(k_q, widths), jnp.pad(v_q, widths)
        k_scale, v_scale = jnp.pad(k_scale, widths), jnp.pad(v_scale, widths)
        kv_len = t
    return QuantizedKV(k_q=k_q, v_q=v_q, k_scale=k_scale, v_scale=v_scale,
                       kv_len=kv_len, packing=2)


def unpack_int4(x: jnp.ndarray, axis: int = 2) -> jnp.ndarray:
    """(…, D/2, …) uint8 nibble-packed -> (…, D, …) int8 in [-8, 7]."""
    lo = (x & 0xF).astype(jnp.int8) - 8
    hi = (x >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=axis)


def _fused_decode_mode() -> str:
    """How to route decode attention to the fused Pallas kernel.

    Env ``YOHO_FUSED_DECODE``:
      "auto" (default) — XLA everywhere: every measured configuration
          (int8/bf16 at ~90% of HBM peak; int4 via the materializing
          unpack at 9.9 ms vs the kernel's 15.6 ms for the whisper-small
          B=128 cross stack) has XLA ahead. See
          experiments/decode_kernel_bench.py, decode_ablation.py and the
          PERFORMANCE.md speed-of-light audit.
      "on" — kernel for every eligible cross read (A/B experiments).
      "off" — always XLA.
      "force" — kernel even off-TPU (interpreted; tests).
    """
    mode = os.environ.get("YOHO_FUSED_DECODE", "auto")
    if mode in ("0", "off"):
        return "off"
    if mode == "force":
        return "force"
    if jax.default_backend() != "tpu":
        return "off"
    return "on" if mode in ("1", "on") else "auto"


def _fused_decode_enabled() -> bool:
    return _fused_decode_mode() in ("on", "force")


def attend_quantized(q: jnp.ndarray, qkv: QuantizedKV, mask, dtype,
                     pos=None) -> jnp.ndarray:
    """Dispatch: fused Pallas decode kernel when it wins, else XLA.

    Only the big *cross*-attention reads ever route to the kernel (the
    XLA lowering of the short self-attention cache read runs at ~90% of
    HBM peak — nothing to win). ``pos`` marks causal decode (self) — XLA.
    Arbitrary masks always take the XLA path.
    """
    mode = _fused_decode_mode()
    t = qkv.k_q.shape[3]
    s = q.shape[2]
    eligible = (t % 128 == 0 and s <= 32 and mask is None and pos is None)
    use_kernel = eligible and mode in ("on", "force")
    if use_kernel:
        from yoho_tpu.ops.decode_attention import fused_decode_attention

        return fused_decode_attention(
            q, qkv.k_q, qkv.v_q, qkv.k_scale, qkv.v_scale,
            kv_len=qkv.kv_len or t, packing=qkv.packing,
        )
    return _attend_quantized(q, qkv, mask, dtype)


def _attend_quantized(q: jnp.ndarray, qkv: QuantizedKV, mask, dtype) -> jnp.ndarray:
    """Attention against int8/int4 time-minor KV; q is (B, H, S, D) pre-scaled."""
    if qkv.kv_len is not None and qkv.kv_len < qkv.k_q.shape[3]:
        valid = (jnp.arange(qkv.k_q.shape[3]) < qkv.kv_len)[None, None, None, :]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if qkv.packing == 2:
        qkv = QuantizedKV(k_q=unpack_int4(qkv.k_q), v_q=unpack_int4(qkv.v_q),
                          k_scale=qkv.k_scale, v_scale=qkv.v_scale)
    kf = qkv.k_q.astype(dtype)
    qkf = _f32_accum_operands(q, kf)
    scores = jnp.einsum("bhsd,bhdt->bhst", *qkf, preferred_element_type=jnp.float32)
    scores = scores * qkv.k_scale.astype(jnp.float32)  # (B,H,1,T) broadcast
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(scores, axis=-1)
    w = (w * qkv.v_scale.astype(jnp.float32)).astype(dtype)
    out_t = jnp.einsum("bhdt,bhst->bhds", qkv.v_q.astype(dtype), w)
    return out_t.transpose(0, 3, 1, 2)


@struct.dataclass
class QuantizedKVCache:
    """Int8 self-attention decode cache: values (B, H, D, T) int8 + scales
    (B, H, 1, T) bf16. Each position is quantized once at write time (its
    scale never changes afterwards), so cached reads cost half the HBM
    traffic of the bf16 cache with the same per-position absmax scheme as
    :class:`QuantizedKV`.
    """

    k_q: jnp.ndarray
    v_q: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray

    @classmethod
    def zeros(cls, batch: int, kv_heads: int, max_len: int, head_dim: int,
              dtype=jnp.bfloat16):
        vals = (batch, kv_heads, head_dim, max_len)
        scales = (batch, kv_heads, 1, max_len)
        return cls(
            k_q=jnp.zeros(vals, jnp.int8), v_q=jnp.zeros(vals, jnp.int8),
            k_scale=jnp.zeros(scales, jnp.bfloat16),
            v_scale=jnp.zeros(scales, jnp.bfloat16),
        )

    @property
    def max_len(self) -> int:
        return self.k_q.shape[3]

    def update(self, pos, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "QuantizedKVCache":
        """Quantize + write (B, H, D, S) new entries at offset ``pos``.

        ``pos`` may be a per-row vector (B,) with S == 1 (continuous
        batching), mirroring :meth:`KVCache.update`."""

        def _q(x):
            scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2,
                            keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
            return q.astype(jnp.int8), scale.astype(jnp.bfloat16)

        kq, ks = _q(k_new)
        vq, vs = _q(v_new)
        if getattr(pos, "ndim", 0) == 1:
            assert k_new.shape[3] == 1, "vector pos supports S == 1 only"
            rows = jnp.arange(self.k_q.shape[0])
            return QuantizedKVCache(
                k_q=self.k_q.at[rows, :, :, pos].set(kq[..., 0]),
                v_q=self.v_q.at[rows, :, :, pos].set(vq[..., 0]),
                k_scale=self.k_scale.at[rows, :, :, pos].set(ks[..., 0]),
                v_scale=self.v_scale.at[rows, :, :, pos].set(vs[..., 0]),
            )
        return QuantizedKVCache(
            k_q=jax.lax.dynamic_update_slice(self.k_q, kq, (0, 0, 0, pos)),
            v_q=jax.lax.dynamic_update_slice(self.v_q, vq, (0, 0, 0, pos)),
            k_scale=jax.lax.dynamic_update_slice(self.k_scale, ks, (0, 0, 0, pos)),
            v_scale=jax.lax.dynamic_update_slice(self.v_scale, vs, (0, 0, 0, pos)),
        )

    def as_quantized_kv(self) -> "QuantizedKV":
        return QuantizedKV(k_q=self.k_q, v_q=self.v_q,
                           k_scale=self.k_scale, v_scale=self.v_scale)


def _bhsd(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, H, S, D)."""
    return x.transpose(0, 2, 1, 3)


def _bhdt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, H, D, S) — the KV storage layout."""
    return x.transpose(0, 2, 3, 1)


def _f32_accum_operands(*xs):
    """Upcast bf16 dot operands to f32 on the CPU backend ONLY.

    XLA:CPU's thunk runtime cannot execute a BF16 x BF16 = F32 dot for
    batched shapes (UNIMPLEMENTED DotThunk, observed at B >= 2) — the
    exact dot the MXU wants (bf16 inputs, f32 accumulation). bf16 -> f32
    conversion is exact and the products/accumulation are f32 either
    way, so results are bit-identical; on TPU this is a no-op and the
    bf16 MXU path is untouched."""
    if jax.default_backend() != "cpu":
        return xs
    return tuple(x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
                 for x in xs)


def _attend(
    q: jnp.ndarray,  # (B, H, S, D) — pre-scaled
    k: jnp.ndarray,  # (B, H, D, T) — pre-scaled, time-minor
    v: jnp.ndarray,  # (B, H, D, T) — time-minor
    mask: Optional[jnp.ndarray],  # broadcastable to (B, H, S, T), bool
    dtype,
) -> jnp.ndarray:
    """Attention against time-minor K/V; returns (B, S, H, D).

    Both contractions are MXU-native in this layout: scores contract D
    (q lanes x k sublanes), and the value product is computed transposed —
    out^T = V (D, T) @ w^T (T, S) — so the only transposes touch the tiny
    (S, T) weight matrix and the (D, S) output block, never the caches.
    """
    qk = _f32_accum_operands(q, k)
    scores = jnp.einsum("bhsd,bhdt->bhst", *qk, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out_t = jnp.einsum("bhdt,bhst->bhds", v, w)  # (B, H, D, S)
    return out_t.transpose(0, 3, 1, 2)  # -> (B, S, H, D)


def causal_mask(s: int, t: int, offset: int = 0) -> jnp.ndarray:
    """Boolean (1, 1, s, t) mask: query i attends keys j <= i + offset."""
    qi = jnp.arange(s)[:, None] + offset
    kj = jnp.arange(t)[None, :]
    return (kj <= qi)[None, None]


def decode_mask(t_max: int, pos, s: int = 1) -> jnp.ndarray:
    """(1, 1, s, t_max) causal mask for ``s`` new queries written at cache
    offset ``pos``: query i sees keys <= pos + i (covers both single-token
    decode and multi-token prefill). A per-row ``pos`` vector (B,) gives
    (B, 1, s, t_max) — the continuous-batching layout."""
    if getattr(pos, "ndim", 0) == 1:
        qi = pos[:, None, None] + jnp.arange(s)[None, :, None]  # (B, s, 1)
        kj = jnp.arange(t_max)[None, None, :]
        return (kj <= qi)[:, None]  # (B, 1, s, t)
    qi = pos + jnp.arange(s)[:, None]
    kj = jnp.arange(t_max)[None, :]
    return (kj <= qi)[None, None]


class MultiHeadAttention(nn.Module):
    """Whisper-semantics MHA with optional static-shape KV cache.

    Modes (all shapes static):
      * full self-attention:   ``__call__(x, mask=...)``
      * full cross-attention:  ``__call__(x, xa=encoder_out)``
      * cached self decode:    ``__call__(x, cache=KVCache, pos=i)`` ->
        (out, new_cache)
      * cached cross decode:   ``__call__(x, cross_kv=(k, v))`` where k/v
        were precomputed once via :meth:`kv`.

    ``use_flash=True`` routes full (un-cached, un-masked or causal)
    attention through the Pallas flash kernel (``yoho_tpu.ops``) — for long
    encoder sequences where the materialized (T x T) score matrix hurts.
    """

    n_state: int
    n_head: int
    k_bias: bool = False  # OpenAI Whisper: key projection has no bias
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    weights_int8: bool = False  # serve with int8 kernels (QuantizedDense)

    def setup(self):
        d = self.dtype
        dense = QuantizedDense if self.weights_int8 else nn.Dense
        self.q_proj = dense(self.n_state, dtype=d, name="q_proj")
        self.k_proj = dense(self.n_state, use_bias=self.k_bias, dtype=d, name="k_proj")
        self.v_proj = dense(self.n_state, dtype=d, name="v_proj")
        self.out_proj = dense(self.n_state, dtype=d, name="out_proj")

    def _split(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.n_head, self.n_state // self.n_head)

    def attention_map(self, x: jnp.ndarray, xa: jnp.ndarray) -> jnp.ndarray:
        """Head-averaged cross-attention weights (B, S, T) in f32 —
        the alignment signal for word-level timestamps (DTW)."""
        scale = (self.n_state // self.n_head) ** -0.25
        q = _bhsd(self._split(self.q_proj(x)) * scale)
        k = _bhdt(self._split(self.k_proj(xa)) * scale)
        scores = jnp.einsum("bhsd,bhdt->bhst", *_f32_accum_operands(q, k),
                            preferred_element_type=jnp.float32)
        return jax.nn.softmax(scores, axis=-1).mean(axis=1)

    def kv(self, xa: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute cross-attention K/V from encoder output (once per
        utterance; the decode loop then never touches the encoder).
        Returned time-minor (B, H, D, T)."""
        scale = (self.n_state // self.n_head) ** -0.25
        k = _bhdt(self._split(self.k_proj(xa)) * scale)
        v = _bhdt(self._split(self.v_proj(xa)))
        return k, v

    def kv_tm(self, xa: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cross K/V still in projection (time-major) layout (B, T, H, D)
        — for consumers that quantize before the decode-layout transpose
        so the layout copy moves int8 codes, not floats (quantize_kv
        time_major=True)."""
        scale = (self.n_state // self.n_head) ** -0.25
        k = self._split(self.k_proj(xa)) * scale
        v = self._split(self.v_proj(xa))
        return k, v

    def __call__(
        self,
        x: jnp.ndarray,
        xa: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        pos=None,
        cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        scale = (self.n_state // self.n_head) ** -0.25

        if self.use_flash and cache is None and cross_kv is None:
            # Full-sequence path through the Pallas flash kernel. ``mask``
            # None == bidirectional (encoder); a causal mask from
            # causal_mask() maps to causal=True.
            from yoho_tpu.ops.flash_attention import flash_attention

            src = x if xa is None else xa
            q4 = self._split(self.q_proj(x))
            k4 = self._split(self.k_proj(src))
            v4 = self._split(self.v_proj(src))
            out = flash_attention(q4, k4, v4, causal=mask is not None,
                                  scale=scale * scale)
            b, s = x.shape[:2]
            return self.out_proj(out.reshape(b, s, self.n_state))

        q = _bhsd(self._split(self.q_proj(x)) * scale)

        b, s = x.shape[:2]
        new_cache = None
        if isinstance(cross_kv, QuantizedKV):
            out = attend_quantized(q, cross_kv, mask, self.dtype)
            return self.out_proj(out.reshape(b, s, self.n_state))
        if cross_kv is not None:
            k, v = cross_kv  # already scaled + time-minor from kv()
        else:
            src = x if xa is None else xa
            k = _bhdt(self._split(self.k_proj(src)) * scale)
            v = _bhdt(self._split(self.v_proj(src)))
            if cache is not None:
                new_cache = cache.update(pos, k, v)
                mask = decode_mask(new_cache.max_len, pos, s)
                if isinstance(new_cache, QuantizedKVCache):
                    # XLA path: the short cache read runs at ~90% of HBM
                    # peak already (experiments/decode_kernel_bench.py).
                    out = _attend_quantized(q, new_cache.as_quantized_kv(),
                                            mask, self.dtype)
                    out = self.out_proj(out.reshape(b, s, self.n_state))
                    return out, new_cache
                k, v = new_cache.k, new_cache.v

        out = _attend(q, k.astype(q.dtype), v.astype(q.dtype), mask, self.dtype)
        out = self.out_proj(out.reshape(b, s, self.n_state))
        if cache is not None:
            return out, new_cache
        return out


class QuantizedDense(nn.Module):
    """Weight-only int8 Dense: kernel stored int8 with per-output-channel
    scales, dequantized inline (XLA fuses the convert into the matmul —
    measured 1.58x on the B=1 decode weight chain,
    experiments/int8_weights_probe.py). Params come from
    ``yoho_tpu.nn.quantize.quantize_dense_params``, never from training.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_dim, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (1, self.features), jnp.float32)
        y = jnp.einsum("...d,dk->...k",
                       *_f32_accum_operands(x.astype(self.dtype),
                                            kernel_q.astype(self.dtype)),
                       preferred_element_type=jnp.float32)
        y = (y * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class QuantizedDenseGeneral(nn.Module):
    """Weight-only int8 DenseGeneral projecting to (heads, head_dim) —
    the GQA projection shape. Per-output-channel scales over (h, hd)."""

    features: Tuple[int, int]
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, hd = self.features
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_dim, h, hd), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (1, h, hd), jnp.float32)
        y = jnp.einsum("...d,dhk->...hk",
                       *_f32_accum_operands(x.astype(self.dtype),
                                            kernel_q.astype(self.dtype)),
                       preferred_element_type=jnp.float32)
        return (y * scale).astype(self.dtype)


class QuantizedEmbed(nn.Module):
    """Tied embedding stored int8 with per-row (per-token) scales; serves
    both the lookup and the tied-logits matmul with exact per-row
    semantics. Params come from ``yoho_tpu.nn.quantize``."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.embedding_q = self.param(
            "embedding_q", nn.initializers.zeros,
            (self.num_embeddings, self.features), jnp.int8)
        self.embedding_scale = self.param(
            "embedding_scale", nn.initializers.ones,
            (self.num_embeddings, 1), jnp.float32)

    def __call__(self, ids):
        vec = jnp.take(self.embedding_q, ids, axis=0).astype(self.dtype)
        scale = jnp.take(self.embedding_scale, ids, axis=0)
        return vec * scale.astype(self.dtype)

    def logits(self, x, dtype):
        y = jnp.einsum("bsd,vd->bsv",
                       *_f32_accum_operands(x, self.embedding_q.astype(dtype)),
                       preferred_element_type=jnp.float32)
        return y * self.embedding_scale[:, 0][None, None, :]


class MLP(nn.Module):
    """Whisper MLP: fc1 -> exact GELU -> fc2 (4x expansion)."""

    n_state: int
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False

    @nn.compact
    def __call__(self, x):
        dense = QuantizedDense if self.weights_int8 else nn.Dense
        x = dense(self.n_state * self.expansion, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return dense(self.n_state, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """Gated MLP (arXiv:2002.05202): down(silu(gate(x)) * up(x)), bias-free.

    Same contract as the reference SwiGLU (``yoho/src/nn/layers.py:7-20``).
    """

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        dense = QuantizedDense if self.weights_int8 else nn.Dense
        gate = dense(self.hidden_dim, use_bias=False, dtype=self.dtype, name="gate")(x)
        up = dense(self.hidden_dim, use_bias=False, dtype=self.dtype, name="up")(x)
        return dense(d_in, use_bias=False, dtype=self.dtype, name="down")(
            nn.silu(gate) * up
        )


def rope_angles(
    positions: jnp.ndarray, head_dim: int, variant: str = "standard", base: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables (..., head_dim//2) for the given positions.

    ``standard``: theta_i = base^(-2i/d) (RoFormer). ``decade``: the
    reference's ad-hoc spectrum theta_i = 10^-i with positions starting at 1
    (``yoho/src/nn/layers.py:31-33``) — kept only for A/B compatibility.
    """
    half = head_dim // 2
    if variant == "standard":
        freqs = base ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim)
        pos = positions.astype(jnp.float32)
    elif variant == "decade":
        freqs = 10.0 ** (-jnp.arange(0, half, dtype=jnp.float32))
        pos = positions.astype(jnp.float32) + 1.0
    else:
        raise ValueError(f"unknown rope variant {variant!r}")
    ang = pos[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs: x shape (..., S, H, D), cos/sin (S, D//2)
    — or (B, S, D//2) for per-row positions (continuous batching).

    Pairing convention matches the reference (even/odd interleave as
    complex re/im, ``layers.py:35-40``).
    """
    x1, x2 = x[..., 0::2], x[..., 1::2]
    if cos.ndim == 3:  # (B, S, D/2) -> broadcast over heads: (B, S, 1, D/2)
        c, s = cos[:, :, None, :], sin[:, :, None, :]
    else:
        c, s = cos[:, None, :], sin[:, None, :]  # (S, 1, D/2)
    r1 = x1 * c - x2 * s
    r2 = x1 * s + x2 * c
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


class GroupedQueryAttention(nn.Module):
    """Standard GQA (arXiv:2305.13245) with RoPE and optional KV cache.

    Bias-free projections like the reference (``layers.py:70-72``); unlike
    the reference, query groups are NOT summed before softmax — each group
    member attends independently against its shared KV head (see module
    docstring).

    RoPE is applied to q and k. For cross-attention the reference also
    rotates the keys by *key* position (``layers.py:78-80``); we follow
    that contract so audio positions carry into the decoder.
    """

    q_heads: int
    dims: int
    kv_heads: Optional[int] = None
    rope_variant: str = "standard"
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False
    # Optional replacement for the softmax contraction: f(q, k, v) with
    # (B, Hq, S, D) pre-scaled q and group-expanded k/v, returning
    # (B, Hq, S, D). Used by the sequence-parallel long encoder to swap
    # in ring attention (parallel/ring_attention.py) — parameters are
    # unaffected, so the same checkpoint serves both constructions.
    attention_fn: Optional[Callable] = None

    def setup(self):
        kvh = self.kv_heads or self.q_heads
        assert self.q_heads % kvh == 0, (
            f"q_heads ({self.q_heads}) must be divisible by kv_heads ({kvh})"
        )
        assert self.dims % self.q_heads == 0, (
            f"dims ({self.dims}) must be divisible by q_heads ({self.q_heads})"
        )
        head_dim = self.dims // self.q_heads
        d = self.dtype
        dg = QuantizedDenseGeneral if self.weights_int8 else nn.DenseGeneral
        dense = QuantizedDense if self.weights_int8 else nn.Dense
        self.q_proj = dg((self.q_heads, head_dim), use_bias=False, dtype=d,
                         name="q_proj")
        self.k_proj = dg((kvh, head_dim), use_bias=False, dtype=d, name="k_proj")
        self.v_proj = dg((kvh, head_dim), use_bias=False, dtype=d, name="v_proj")
        self.out_proj = dense(self.dims, use_bias=False, dtype=d, name="out_proj")

    def kv(self, xa: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute (rotated) cross-attention K/V from encoder output.
        Returned time-minor (B, H, D, T)."""
        k = self.k_proj(xa)
        v = self.v_proj(xa)
        cos, sin = rope_angles(jnp.arange(xa.shape[1]), k.shape[-1], self.rope_variant)
        k = apply_rope(k, cos, sin)
        return _bhdt(k), _bhdt(v)

    def attention_map(self, x: jnp.ndarray, xa: jnp.ndarray) -> jnp.ndarray:
        """Head-averaged cross-attention weights (B, S, T) in f32 — the
        alignment signal for word-level timestamps (DTW), mirroring the
        whisper MHA's method. RoPE is applied to q and k exactly as in
        ``__call__`` so the weights match the decode's attention."""
        kvh = self.kv_heads or self.q_heads
        groups = self.q_heads // kvh
        head_dim = self.dims // self.q_heads
        q = self.q_proj(x)
        cos_q, sin_q = rope_angles(jnp.arange(x.shape[1]), head_dim,
                                   self.rope_variant)
        q = apply_rope(q, cos_q, sin_q)
        k = self.k_proj(xa)
        cos_k, sin_k = rope_angles(jnp.arange(xa.shape[1]), head_dim,
                                   self.rope_variant)
        k = _bhdt(apply_rope(k, cos_k, sin_k))
        if groups > 1:
            k = jnp.repeat(k, groups, axis=1)
        q = _bhsd(q) * (head_dim**-0.5)
        scores = jnp.einsum("bhsd,bhdt->bhst", *_f32_accum_operands(q, k),
                            preferred_element_type=jnp.float32)
        return jax.nn.softmax(scores, axis=-1).mean(axis=1)

    def __call__(
        self,
        x: jnp.ndarray,
        xa: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        pos=None,
        cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        kvh = self.kv_heads or self.q_heads
        groups = self.q_heads // kvh
        head_dim = self.dims // self.q_heads
        b, s = x.shape[:2]

        def _positions(n):
            # pos may be a per-row vector (B,) — continuous batching —
            # giving (B, n) position grids (rope_angles broadcasts).
            if pos is None:
                return jnp.arange(n)
            if getattr(pos, "ndim", 0) == 1:
                return pos[:, None] + jnp.arange(n)[None, :]
            return pos + jnp.arange(n)

        q = self.q_proj(x)  # (B, S, Hq, D)
        cos_q, sin_q = rope_angles(_positions(s), head_dim, self.rope_variant)
        q = apply_rope(q, cos_q, sin_q)

        new_cache = None
        if cross_kv is not None:
            k, v = cross_kv  # time-minor from kv()
        else:
            src = x if xa is None else xa
            k = self.k_proj(src)
            v = self.v_proj(src)
            cos_k, sin_k = rope_angles(_positions(src.shape[1]), head_dim,
                                       self.rope_variant)
            k = apply_rope(k, cos_k, sin_k)
            k, v = _bhdt(k), _bhdt(v)
            if cache is not None:
                new_cache = cache.update(pos, k, v)
                k, v = new_cache.k, new_cache.v
                mask = decode_mask(k.shape[3], pos, s)

        if self.attention_fn is not None and cache is None and cross_kv is None:
            # Hook gets (B, Hq, S, D) pre-scaled q and the UNEXPANDED
            # (B, Hkv, T, D) time-MAJOR k/v (ring attention broadcasts
            # query groups itself — group-expanding first would multiply
            # the ring's ICI traffic by `groups` for identical results).
            assert mask is None, "attention_fn hook does not support masks"
            qh = _bhsd(q) * (head_dim**-0.5)
            out = self.attention_fn(qh,
                                    jnp.swapaxes(k, 2, 3).astype(qh.dtype),
                                    jnp.swapaxes(v, 2, 3).astype(qh.dtype))
            out = jnp.swapaxes(out, 1, 2)  # (B, S, Hq, D) like _attend
            return self.out_proj(out.reshape(b, s, self.q_heads * head_dim))

        # Expand KV heads across query groups: (B, Hkv, T, D) -> (B, Hq, T, D).
        if groups > 1:
            k = jnp.repeat(k, groups, axis=1)
            v = jnp.repeat(v, groups, axis=1)

        q = _bhsd(q) * (head_dim**-0.5)
        out = _attend(q, k.astype(q.dtype), v.astype(q.dtype), mask, self.dtype)
        out = self.out_proj(out.reshape(b, s, self.q_heads * head_dim))
        if cache is not None:
            return out, new_cache
        return out


def realized_token_probs(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """p(tokens[:, i] | tokens[:, :i]) from teacher-forced logits.

    ``logits`` (B, S, V) are the decoder's outputs at every position of a
    teacher-forced pass over ``tokens`` (B, S); position i predicts the
    token at i+1, so probs[:, i] = softmax(logits[:, i-1])[tokens[:, i]]
    and the forced first position gets probability 1. f32 throughout
    (word-confidence surface; see infer/word_timestamps.py).
    """
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits[:, :-1], axis=-1)
    picked = jnp.take_along_axis(
        logits[:, :-1], tokens[:, 1:, None].astype(jnp.int32),
        axis=-1)[..., 0]
    probs = jnp.exp(picked - lse)
    return jnp.concatenate(
        [jnp.ones((tokens.shape[0], 1), jnp.float32), probs], axis=1)


def realized_token_probs_streamed(h: jnp.ndarray, logits_fn,
                                  tokens: jnp.ndarray,
                                  chunk: int = 16) -> jnp.ndarray:
    """:func:`realized_token_probs` of ``logits_fn(h)`` without ever
    materializing the (B, S, V) logits.

    The alignment pass runs at SERVING batch sizes where full-sequence
    f32 teacher-forced logits are enormous (whisper-small B=320:
    320 x 448 x 51865 x 4 B ≈ 30 GB — 2x the chip). Positions stream
    through ``lax.map`` in S-chunks, so peak extra memory is
    B x chunk x V f32 (~1 GB at that batch) and the result matches the
    dense version (each position's logits are an independent dot row —
    only the materialization order changes; equivalence tested).
    """
    b, s, d = h.shape
    # lp[:, j] = log p(tokens[:, j+1] | ...) from position j's logits;
    # the trailing dummy column keeps shapes static (discarded below).
    nxt = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    pad = (-s) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        nxt = jnp.pad(nxt, ((0, 0), (0, pad)))
    n = h.shape[1] // chunk
    hs = h.reshape(b, n, chunk, d).transpose(1, 0, 2, 3)
    ts = nxt.reshape(b, n, chunk).transpose(1, 0, 2)

    def one_chunk(args):
        hc, tc = args  # (B, chunk, D), (B, chunk)
        logits = logits_fn(hc).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(
            logits, tc[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return picked - lse

    lp = jax.lax.map(one_chunk, (hs, ts))  # (n, B, chunk)
    lp = lp.transpose(1, 0, 2).reshape(b, -1)[:, :s]
    return jnp.concatenate(
        [jnp.ones((b, 1), jnp.float32), jnp.exp(lp[:, : s - 1])], axis=1)
