"""Static-shape decode caches: bf16/f32, int8, and int4 KV.

The KV cache the reference never built (``yoho/src/nn/whisper.py:27``
TODO), in the TPU-native layout: time-MINOR (B, H, D, T) so HBM tiling
pads nothing and both attention contractions are MXU-native with zero
cache transposes (see PERFORMANCE.md, "speed-of-light audit"). Quantized
variants halve (int8) / quarter (int4) the decode loop's dominant HBM
term; scales factor out of both contractions exactly, so int8 is
argmax-identical in practice and int4 is the documented opt-in trade.
Split out of ``nn/layers.py`` (VERDICT r2 item 4); the attention modules
there consume these caches.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


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

        ``pos`` may be a per-row vector (B,) — the continuous-batching
        layout where every slot decodes at its own position (scatter
        instead of slice-update). S > 1 with vector pos writes each row's
        S entries at ``pos[b]..pos[b]+S-1`` (the per-slot draft-verify
        layout); out-of-range positions are dropped (JAX scatter
        semantics), which is safe because callers size the cache with
        workspace past the decode horizon."""
        if getattr(pos, "ndim", 0) == 1:
            rows = jnp.arange(self.k.shape[0])
            s = k_new.shape[3]
            if s == 1:
                k = self.k.at[rows, :, :, pos].set(
                    k_new[..., 0].astype(self.k.dtype))
                v = self.v.at[rows, :, :, pos].set(
                    v_new[..., 0].astype(self.v.dtype))
                return KVCache(k=k, v=v)
            idx = pos[:, None] + jnp.arange(s)[None, :]  # (B, S)
            # Advanced indices at dims 0 and 3 -> result dims (B, S, H, D).
            k = self.k.at[rows[:, None], :, :, idx].set(
                k_new.transpose(0, 3, 1, 2).astype(self.k.dtype))
            v = self.v.at[rows[:, None], :, :, idx].set(
                v_new.transpose(0, 3, 1, 2).astype(self.v.dtype))
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
            rows = jnp.arange(self.k_q.shape[0])
            s = k_new.shape[3]
            if s == 1:
                return QuantizedKVCache(
                    k_q=self.k_q.at[rows, :, :, pos].set(kq[..., 0]),
                    v_q=self.v_q.at[rows, :, :, pos].set(vq[..., 0]),
                    k_scale=self.k_scale.at[rows, :, :, pos].set(ks[..., 0]),
                    v_scale=self.v_scale.at[rows, :, :, pos].set(vs[..., 0]),
                )
            # S > 1 at per-row offsets (see KVCache.update): result dims
            # of the mixed advanced index are (B, S, H, D|1).
            idx = pos[:, None] + jnp.arange(s)[None, :]
            r = rows[:, None]

            def put(big, new):
                return big.at[r, :, :, idx].set(new.transpose(0, 3, 1, 2))

            return QuantizedKVCache(k_q=put(self.k_q, kq),
                                    v_q=put(self.v_q, vq),
                                    k_scale=put(self.k_scale, ks),
                                    v_scale=put(self.v_scale, vs))
        return QuantizedKVCache(
            k_q=jax.lax.dynamic_update_slice(self.k_q, kq, (0, 0, 0, pos)),
            v_q=jax.lax.dynamic_update_slice(self.v_q, vq, (0, 0, 0, pos)),
            k_scale=jax.lax.dynamic_update_slice(self.k_scale, ks, (0, 0, 0, pos)),
            v_scale=jax.lax.dynamic_update_slice(self.v_scale, vs, (0, 0, 0, pos)),
        )

    def as_quantized_kv(self) -> "QuantizedKV":
        return QuantizedKV(k_q=self.k_q, v_q=self.v_q,
                           k_scale=self.k_scale, v_scale=self.v_scale)


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

