"""Whisper encoder-decoder in Flax, loading pretrained OpenAI/HF weights.

Architecture parity targets (cf. reference ``yoho/src/nn/whisper.py``, which
reimplements OpenAI Whisper in Flax without a KV cache):
  * conv stem k=3 pad=1, second conv stride 2, exact (erf) GELU;
  * fixed sinusoidal encoder positions (log-timescale 10000, half sin/cos);
  * pre-LN blocks, MHA with q/v/out biases but no k bias, 0.25-power scaling;
  * learned decoder positional embedding, tied embedding logits, causal mask.

TPU-first differences: every attention layer threads a static-shape
:class:`KVCache`; the decoder exposes a ``decode_step`` that runs one token
against the caches so the whole autoregressive loop compiles into a single
``lax.while_loop`` (see ``yoho_tpu.infer.decode``). Dtype is a module knob so
serving runs bf16 while parity tests run f32.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn.layers import (
    KVCache,
    MLP,
    MultiHeadAttention,
    QuantizedEmbed,
    causal_mask,
    maybe_remat,
)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """OpenAI Whisper's fixed positional encoding (host-side, baked const)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


class EncoderBlock(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # W8A8 int8 serving: quantizes the MLP ONLY. Attention projections
    # are square (n_state x n_state) — too little MXU work per byte for
    # dynamic-quant int8 to beat bf16 (measured 3x SLOWER,
    # experiments/w8a8_kernel_bench.py at 768x768) — so they stay exact.
    w8a8: bool = False
    # tanh-GELU in the MLP (see nn.layers.MLP.gelu_tanh) — the cheap
    # half of the approximate encoder modes, usable without int8.
    gelu_tanh: bool = False

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")
        self.attn = MultiHeadAttention(self.n_state, self.n_head, dtype=self.dtype,
                                       use_flash=self.use_flash, name="attn")
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")
        self.mlp = MLP(self.n_state, dtype=self.dtype, w8a8=self.w8a8,
                       gelu_tanh=self.gelu_tanh, name="mlp")

    def __call__(self, x):
        x = x + self.attn(self.ln1(x))
        x = x + self.mlp(self.ln2(x))
        return x


class DecoderBlock(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False

    def setup(self):
        d = self.dtype
        w8 = self.weights_int8
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=d, name="ln1")
        self.attn = MultiHeadAttention(self.n_state, self.n_head, dtype=d,
                                       weights_int8=w8, name="attn")
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=d, name="ln2")
        self.cross_attn = MultiHeadAttention(self.n_state, self.n_head, dtype=d,
                                             weights_int8=w8, name="cross_attn")
        self.ln3 = nn.LayerNorm(epsilon=1e-5, dtype=d, name="ln3")
        self.mlp = MLP(self.n_state, dtype=d, weights_int8=w8, name="mlp")

    def __call__(self, x, xa, mask):
        x = x + self.attn(self.ln1(x), mask=mask)
        x = x + self.cross_attn(self.ln2(x), xa=xa)
        x = x + self.mlp(self.ln3(x))
        return x

    def step(self, x, cache: KVCache, cross_kv, pos):
        """One cached decode step: x is (B, S_new, D) (usually S_new=1)."""
        a, new_cache = self.attn(self.ln1(x), cache=cache, pos=pos)
        x = x + a
        x = x + self.cross_attn(self.ln2(x), cross_kv=cross_kv)
        x = x + self.mlp(self.ln3(x))
        return x, new_cache

    def cross_kv(self, xa):
        return self.cross_attn.kv(xa)

    def cross_kv_tm(self, xa):
        return self.cross_attn.kv_tm(xa)


class AudioEncoder(nn.Module):
    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # Per-block gradient checkpointing for fine-tuning: exact, trades one
    # recompute forward for O(depth) activation memory (see
    # yoho_tpu.nn.yoho.YOHOAudioEncoder.remat).
    remat: bool = False
    # W8A8 serving: block MLPs run int8 x int8 via Int8Dense (XLA
    # composition by default — it beat the fused Pallas kernel in-model;
    # attention/conv/layernorms stay bf16 — see EncoderBlock.w8a8).
    w8a8: bool = False
    # tanh-GELU in block MLPs (conv-stem GELUs stay erf: 2 activations
    # over the stem vs 12+ MLP stacks — not worth approximating).
    gelu_tanh: bool = False

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, n_frames, n_mels) -> (B, n_audio_ctx, n_state)."""
        c = self.cfg
        d = self.dtype
        x = nn.Conv(c.n_audio_state, (3,), padding=1, dtype=d, name="conv1")(mel.astype(d))
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c.n_audio_state, (3,), strides=2, padding=1, dtype=d, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        x = x + jnp.asarray(sinusoids(c.n_audio_ctx, c.n_audio_state), d)
        block_cls = maybe_remat(EncoderBlock, self.remat)
        for i in range(c.n_audio_layer):
            x = block_cls(c.n_audio_state, c.n_audio_head, dtype=d,
                          use_flash=self.use_flash, w8a8=self.w8a8,
                          gelu_tanh=self.gelu_tanh,
                          name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=d, name="ln_post")(x)


class TextDecoder(nn.Module):
    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False
    remat: bool = False  # see AudioEncoder.remat

    def setup(self):
        c = self.cfg
        if self.weights_int8:
            self.token_embedding = QuantizedEmbed(
                c.n_vocab, c.n_text_state, dtype=self.dtype,
                name="token_embedding")
        else:
            self.token_embedding = nn.Embed(c.n_vocab, c.n_text_state,
                                            dtype=self.dtype,
                                            name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.n_text_ctx, c.n_text_state),
        )
        # Only __call__ is lifted; the KV-cached decode path (step /
        # cross_kv) never differentiates.
        block_cls = maybe_remat(DecoderBlock, self.remat)
        self.blocks = [
            block_cls(c.n_text_state, c.n_text_head, dtype=self.dtype,
                      weights_int8=self.weights_int8, name=f"blocks_{i}")
            for i in range(c.n_text_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")

    def _logits(self, x):
        if self.weights_int8:
            return self.token_embedding.logits(x, self.dtype)
        from yoho_tpu.nn.layers import _f32_accum_operands

        emb = self.token_embedding.embedding.astype(self.dtype)
        # Tied-embedding logits in f32 for a stable softmax/argmax.
        # (_f32_accum_operands: XLA:CPU cannot run BF16xBF16=F32 dots at
        # B >= 2; exact upcast there, no-op on TPU.)
        x, emb = _f32_accum_operands(x, emb)
        return jnp.einsum("bsd,vd->bsv", x, emb, preferred_element_type=jnp.float32)

    def __call__(self, tokens: jnp.ndarray, xa: jnp.ndarray) -> jnp.ndarray:
        """Full-sequence (training/teacher-forcing) forward."""
        t = tokens.shape[1]
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding[:t].astype(self.dtype)
        mask = causal_mask(t, t)
        for blk in self.blocks:
            x = blk(x, xa, mask)
        return self._logits(self.ln(x))

    def init_caches(self, batch: int, dtype=None, max_len=None,
                    quantized: bool = False):
        from yoho_tpu.nn.layers import QuantizedKVCache

        c = self.cfg
        dtype = dtype or self.dtype
        # Lane-align the horizon: HBM stores T in 128-lane tiles anyway, and
        # an aligned cache lets the fused decode kernel engage.
        max_len = -(-(max_len or c.n_text_ctx) // 128) * 128
        cls = QuantizedKVCache if quantized else KVCache
        return [
            cls.zeros(batch, c.n_text_head, max_len,
                      c.n_text_state // c.n_text_head, dtype)
            for _ in range(c.n_text_layer)
        ]

    def cross_kvs(self, xa: jnp.ndarray, quantize=False):
        """Precompute per-layer cross-attention K/V once per utterance.

        ``quantize``: False (bf16), True/"int8" (halves decode HBM traffic,
        argmax-identical in tests), or "int4" (quarters it — a real
        approximation, opt-in quality/throughput trade; see quantize_kv4).
        """
        from yoho_tpu.nn.layers import (
            _fused_decode_enabled,
            quantize_kv,
            quantize_kv4,
        )

        mode = {False: None, True: "int8"}.get(quantize, quantize)
        if mode == "int8":
            # Quantize in projection layout, transpose the int8 codes
            # (layers.quantize_kv time_major) — the decode-layout copy
            # then moves 1/4 the bytes. T lane-padded to 128 so the fused
            # decode kernel engages (the valid length rides along as
            # static metadata). Only when the kernel will actually run:
            # the XLA fallback pays ~12% for the pad+mask
            # (experiments/decode_kernel_bench.py).
            pad_to = 128 if _fused_decode_enabled() else None
            return [quantize_kv(*blk.cross_kv_tm(xa), pad_to=pad_to,
                                time_major=True) for blk in self.blocks]
        if mode == "int4":
            # Same pad gating as int8: the XLA fallback pays ~12% for the
            # pad+mask, so only lane-pad when the fused kernel will run.
            pad_to = 128 if _fused_decode_enabled() else None
            return [quantize_kv4(*blk.cross_kv_tm(xa), pad_to=pad_to,
                                 time_major=True) for blk in self.blocks]
        if mode is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        return [blk.cross_kv(xa) for blk in self.blocks]

    def cross_attention_map(self, tokens: jnp.ndarray, xa: jnp.ndarray,
                            with_probs: bool = False):
        """Teacher-forced forward collecting the alignment signal: mean
        cross-attention over the upper half of the decoder layers (the
        standard heuristic when a checkpoint ships no alignment-head mask).
        Returns (B, S_text, T_audio) f32; with ``with_probs`` also the
        per-position realized-token probabilities (B, S_text) f32 —
        probs[:, i] = p(tokens[:, i] | tokens[:, :i]), probs[:, 0] = 1 —
        from the same forward (the logits head is one extra matmul on
        activations the alignment pass already computed)."""
        t = tokens.shape[1]
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding[:t].astype(self.dtype)
        mask = causal_mask(t, t)
        align_from = len(self.blocks) // 2
        acc = None
        for i, blk in enumerate(self.blocks):
            # One self-attention per block, shared by the residual AND
            # the alignment tap (the block's own forward recomputes the
            # sub-graph, so it is inlined here).
            x = x + blk.attn(blk.ln1(x), mask=mask)
            x_attn_in = blk.ln2(x)
            if i >= align_from:
                w = blk.cross_attn.attention_map(x_attn_in, xa)
                acc = w if acc is None else acc + w
            x = x + blk.cross_attn(x_attn_in, xa=xa)
            x = x + blk.mlp(blk.ln3(x))
        amap = acc / max(len(self.blocks) - align_from, 1)
        if not with_probs:
            return amap
        from yoho_tpu.nn.layers import realized_token_probs_streamed

        return amap, realized_token_probs_streamed(
            self.ln(x), self._logits, tokens)

    def decode_step(self, tokens, caches: List[KVCache], cross_kvs, pos):
        """Cached step: tokens (B, S_new) at absolute position ``pos``.

        ``pos`` may be a per-row vector (B,) with S_new == 1: every slot
        decodes at its own position (the continuous-batching layout —
        position embedding, causal mask, and cache writes all follow).
        Returns (logits (B, S_new, vocab), new_caches).
        """
        s = tokens.shape[1]
        x = self.token_embedding(tokens)
        pos_emb = jnp.asarray(self.positional_embedding, self.dtype)
        # mode="clip": speculative verification writes a few stale-workspace
        # rows past n_text_ctx whose outputs are discarded — but jnp.take's
        # default OOB fill is NaN, and a NaN K/V poisons every row through
        # masked attention (0 * NaN). Clipped rows stay finite and unused.
        if getattr(pos, "ndim", 0) == 1:
            idx = pos[:, None] + jnp.arange(s)[None, :]  # (B, S)
        else:
            idx = pos + jnp.arange(s)
        x = x + jnp.take(pos_emb, idx, axis=0, mode="clip")
        new_caches = []
        for blk, cache, ckv in zip(self.blocks, caches, cross_kvs):
            x, nc = blk.step(x, cache, ckv, pos)
            new_caches.append(nc)
        return self._logits(self.ln(x)), new_caches


class Whisper(nn.Module):
    """Full model. ``__call__`` = training forward (mel, tokens) -> logits."""

    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas flash attention in the encoder
    # Serve the DECODER with int8 kernels + int8 tied embedding (encoder
    # runs once per window — its weight traffic amortizes; the decoder's
    # repeats per token). ~1.6x on the B=1 weight-bound step; weights come
    # from yoho_tpu.nn.quantize.quantize_whisper_decoder, not training.
    weights_int8: bool = False
    # Serve the ENCODER's MLPs W8A8: int8 weights x dynamically-
    # quantized int8 activations on the MXU int8 path
    # (nn.layers.Int8Dense; XLA composition by default). Measured
    # HONESTLY: ~1.08x encoder throughput at whisper-small/turbo — the
    # quant overheads eat most of the 2x MXU rate — but it HALVES the
    # encoder weight footprint (0.63 GB freed on large-v3: a capacity
    # lever) and includes the tanh-GELU below. Weights from
    # quantize_whisper_encoder; composes with weights_int8 (disjoint
    # subtrees). Implies the fast_gelu approximation in the MLPs.
    encoder_int8: bool = False
    # tanh-GELU in encoder MLPs (exact-erf GELU is VPU-bound: ~60 ms of
    # the whisper-small B=128 encoder, experiments/gelu_probe.py).
    # Plain bf16 otherwise — no param changes, composes with anything.
    # A real approximation; the default stays exact erf.
    fast_gelu: bool = False
    # Gradient-checkpoint every transformer block (fine-tuning memory
    # lever, exact; `yoho finetune --remat`). See AudioEncoder.remat.
    remat: bool = False

    def setup(self):
        self.encoder = AudioEncoder(self.cfg, dtype=self.dtype,
                                    use_flash=self.use_flash,
                                    w8a8=self.encoder_int8,
                                    gelu_tanh=self.fast_gelu,
                                    remat=self.remat, name="encoder")
        self.decoder = TextDecoder(self.cfg, dtype=self.dtype,
                                   weights_int8=self.weights_int8,
                                   remat=self.remat,
                                   name="decoder")

    def __call__(self, mel: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(tokens, self.encoder(mel))

    def encode_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(mel)

    def decode_text(self, tokens: jnp.ndarray, xa: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(tokens, xa)

    def cross_kvs(self, xa: jnp.ndarray, quantize=False):
        """``quantize``: False | True/"int8" | "int4" (see TextDecoder)."""
        return self.decoder.cross_kvs(xa, quantize)

    def init_caches(self, batch: int, dtype=None, max_len=None,
                    quantized: bool = False):
        return self.decoder.init_caches(batch, dtype, max_len, quantized)

    def decode_step(self, tokens, caches, cross_kvs, pos):
        return self.decoder.decode_step(tokens, caches, cross_kvs, pos)

    def cross_attention_map(self, tokens, xa, with_probs: bool = False):
        return self.decoder.cross_attention_map(tokens, xa, with_probs)
