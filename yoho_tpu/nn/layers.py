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



from yoho_tpu.nn.kv_cache import (  # noqa: F401 — canonical home + re-export
    KVCache,
    QuantizedKV,
    QuantizedKVCache,
    _attend_quantized,
    _f32_accum_operands,
    _fused_decode_enabled,
    _fused_decode_mode,
    attend_quantized,
    quantize_kv,
    quantize_kv4,
    unpack_int4,
)


def _bhsd(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, H, S, D)."""
    return x.transpose(0, 2, 1, 3)


def _bhdt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, H, D, S) — the KV storage layout."""
    return x.transpose(0, 2, 3, 1)


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


def _beam_fold(q_batch: int, kv_batch: int) -> int:
    """Beam-shared cross-attention factor (VERDICT r2 item 7).

    Beam search folds beams into the batch axis (B*K streams), but every
    beam of a stream attends the SAME encoder output — tiling the cross-KV
    K ways (the old layout) reads K identical copies of the decode loop's
    dominant HBM term every step. Passing the UNtiled (B, ...) cross-KV
    instead folds the K beams into the query axis: the contraction shapes
    are identical, the traffic drops by K. Returns K (``q_batch //
    kv_batch``) when the caller passed a shared cross-KV, else 1."""
    if kv_batch == q_batch or q_batch % kv_batch:
        return 1
    return q_batch // kv_batch


def _fold_queries(q: jnp.ndarray, fold: int) -> jnp.ndarray:
    """(Bc*fold, H, S, D) -> (Bc, H, fold*S, D), beams major in the new
    query axis (row b*fold+j -> query j*S+s), so the attend output
    reshapes straight back to (Bc*fold, S, H, D)."""
    bc = q.shape[0] // fold
    h, s, d = q.shape[1:]
    return (q.reshape(bc, fold, h, s, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bc, h, fold * s, d))


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
            fold = _beam_fold(b, cross_kv.k_q.shape[0])
            if fold > 1:
                assert mask is None, \
                    "beam-shared cross-KV does not take a mask"
                out = attend_quantized(_fold_queries(q, fold), cross_kv,
                                       mask, self.dtype)
                out = out.reshape(b, s, self.n_head, -1)
            else:
                out = attend_quantized(q, cross_kv, mask, self.dtype)
            return self.out_proj(out.reshape(b, s, self.n_state))
        if cross_kv is not None:
            k, v = cross_kv  # already scaled + time-minor from kv()
            fold = _beam_fold(b, k.shape[0])
            if fold > 1:
                # Beam-shared cross-KV: beams fold into the query axis so
                # all K beams read ONE cross-KV (see _beam_fold).
                assert mask is None, \
                    "beam-shared cross-KV does not take a mask"
                out = _attend(_fold_queries(q, fold), k.astype(q.dtype),
                              v.astype(q.dtype), mask, self.dtype)
                out = out.reshape(b, s, self.n_head, -1)
                return self.out_proj(out.reshape(b, s, self.n_state))
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


def quantize_act_rows(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric absmax int8 quantization of
    activations: returns (codes int8, scale f32 keepdims). The dynamic
    half of the W8A8 scheme (:class:`Int8Dense`)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _w8a8_kernel_enabled() -> bool:
    """YOHO_W8A8_KERNEL = auto/off (default: XLA composition everywhere)
    | on (force the fused Pallas kernel, incl. interpret mode — tests).

    Default is the XLA composition because it MEASURES FASTER in-model:
    whisper-small B=128 encoder, W8A8 MLPs — XLA 356 ms (1.21x bf16) vs
    fused kernel 400 ms (1.08x). Isolated microbenches favored the
    kernel, but inside the encoder XLA fuses the quantize into the
    preceding layernorm and the dequant epilogue into the next op,
    while a pallas_call is an opaque boundary. Same conclusion as the
    decode kernels (PERFORMANCE.md speed-of-light audit): XLA keeps the
    job; the kernel stays as the documented negative result and A/B
    vehicle."""
    return os.environ.get("YOHO_W8A8_KERNEL", "auto").lower() == "on"


class Int8Dense(nn.Module):
    """W8A8 Dense for the ENCODER: int8 kernel (per-output-channel absmax
    scales, from ``yoho_tpu.nn.quantize``) x dynamically int8-quantized
    activations (per-token absmax) -> int32 MXU accumulation.

    Why this exists next to :class:`QuantizedDense` (weight-only): the
    v5e MXU runs int8 x int8 matmuls at 2x its bf16 peak (394 vs 197
    T(FL)OP/s; measured 375 TOP/s = 1.96x the measured bf16 rate,
    experiments/int8_mxu_probe.py). The encoder is COMPUTE-bound (its
    weight traffic amortizes over 1500 positions), so weight-only
    dequant-into-bf16-matmul buys nothing there (measured 1.01x) — only
    feeding the MXU int8 on BOTH operands does. A real approximation
    (8-bit activations, per-token scales) — serving opt-in, never the
    default; quality is measured on the trained fixtures in
    tests/test_quantize.py and experiments/quantization_quality.py.

    The production path is the XLA composition below — it measured
    FASTER in-model than the fused Pallas kernel
    (``yoho_tpu.ops.w8a8_dense``; 356 vs 400 ms on the whisper-small
    B=128 encoder): XLA fuses the quantize into the preceding layernorm
    and the epilogue into the consumer, while a pallas_call is an
    opaque fusion boundary (see _w8a8_kernel_enabled; the kernel stays
    as the A/B vehicle, YOHO_W8A8_KERNEL=on).
    ``activation="gelu_tanh"`` applies the tanh-GELU after the rescale
    (used by the w8a8 MLP; the exact-erf GELU is VPU-bound — see
    experiments/gelu_probe.py). Kernel and fallback agree to rounding
    ties (a 1-ulp scale difference between compilations can flip an
    int8 round — tested with tolerance, not bit-identity).

    Param layout is identical to QuantizedDense (kernel_q int8,
    kernel_scale (1, out) f32, bias f32) so ``quantize_dense_params``
    serves both.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    activation: Optional[str] = None  # None | "gelu_tanh" (fused epilogue)

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_dim, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (1, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        # Kernel path needs a lane-aligned output width; tiny dims (test
        # fixtures, micro models) take the XLA composition below.
        if _w8a8_kernel_enabled() and self.features % 128 == 0:
            from yoho_tpu.ops.w8a8_dense import w8a8_dense

            return w8a8_dense(x, kernel_q, scale, bias,
                              activation=self.activation,
                              out_dtype=self.dtype)
        xq, xs = quantize_act_rows(x)
        y = jax.lax.dot_general(
            xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # Scales factor out of the int32 accumulation exactly: per-token
        # activation scale broadcasts over rows, per-channel kernel scale
        # over columns.
        y = y.astype(jnp.float32) * xs * scale
        if bias is not None:
            y = y + bias
        if self.activation == "gelu_tanh":
            from yoho_tpu.ops.w8a8_dense import _gelu_tanh

            y = _gelu_tanh(y)
        elif self.activation is not None:
            raise ValueError(f"unknown activation {self.activation!r}")
        return y.astype(self.dtype)


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
    w8a8: bool = False  # encoder serving: int8 weights AND activations
    # tanh-GELU instead of exact erf: the erf costs ~60 ms of the
    # whisper-small B=128 encoder MLP stack on the VPU while tanh is
    # measured free (experiments/gelu_probe.py). A real approximation
    # (~43% of bf16 outputs change in the last ulp band) — serving
    # opt-in via Whisper(fast_gelu=True); training/parity keep erf.
    gelu_tanh: bool = False

    @nn.compact
    def __call__(self, x):
        if self.w8a8:
            # W8A8 serving MLP: the GELU fuses into fc1's kernel epilogue
            # as the tanh approximation (always — part of the documented
            # encoder_int8 approximation; the default path keeps erf).
            x = Int8Dense(self.n_state * self.expansion, dtype=self.dtype,
                          activation="gelu_tanh", name="fc1")(x)
            return Int8Dense(self.n_state, dtype=self.dtype, name="fc2")(x)
        dense = QuantizedDense if self.weights_int8 else nn.Dense
        x = dense(self.n_state * self.expansion, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_tanh)
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
            fold = _beam_fold(b, k.shape[0])
            if fold > 1:
                # Beam-shared cross-KV (see _beam_fold): beams fold into
                # the query axis; RoPE was already applied above, and the
                # group-expanded KV is shared by all beams.
                assert mask is None, \
                    "beam-shared cross-KV does not take a mask"
                kk, vv = k, v
                if groups > 1:
                    kk = jnp.repeat(kk, groups, axis=1)
                    vv = jnp.repeat(vv, groups, axis=1)
                qf = _fold_queries(_bhsd(q) * (head_dim**-0.5), fold)
                out = _attend(qf, kk.astype(qf.dtype), vv.astype(qf.dtype),
                              mask, self.dtype)
                out = out.reshape(b, s, self.q_heads, head_dim)
                return self.out_proj(out.reshape(b, s,
                                                 self.q_heads * head_dim))
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
