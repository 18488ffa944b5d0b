"""The custom YOHO model: GQA + RoPE + RMSNorm + SwiGLU encoder-decoder,
plus the voiceprint (speaker-embedding) head.

Capability parity with the reference ``yoho/src/nn/model.py`` (conv stem with
(1,2) max-pool halving time 1024->512, kv_heads = q_heads // 2, tied-embedding
logits, no absolute positions — RoPE only), with the reference's GQA
group-summing quirk fixed (see ``yoho_tpu.nn.layers`` docstring) and two
capabilities the reference only reserved slots for:

  * static-shape KV-cached decoding (same scheme as the Whisper decoder);
  * a voiceprint head projecting decoder hidden states at ``<|voiceprint|>``
    positions into L2-normalized speaker embeddings — the contract implied
    by the dataloader's masked voiceprint slots
    (``train/utils/dataloaders.py:211-217``) and stages 3/4.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.nn.layers import (
    GroupedQueryAttention,
    KVCache,
    SwiGLU,
    causal_mask,
    maybe_remat,
)


def encoder_block_kwargs(cfg: YOHOConfig, index: int) -> dict:
    """Constructor kwargs of encoder block ``index`` — the single source
    shared by :class:`YOHOAudioEncoder` and the pipeline-parallel stage
    runner (``parallel/pipeline.py``), so the two can never diverge."""
    moe = (cfg.n_experts > 0
           and index % cfg.moe_every_n == cfg.moe_every_n - 1)
    return dict(
        q_heads=cfg.n_audio_heads,
        kv_heads=max(1, cfg.n_audio_heads // 2),
        dims=cfg.dims,
        n_experts=cfg.n_experts if moe else 0,
        moe_top_k=cfg.moe_top_k,
        expert_capacity_factor=cfg.expert_capacity_factor,
    )


class YOHOEncoderBlock(nn.Module):
    q_heads: int
    kv_heads: int
    dims: int
    dtype: jnp.dtype = jnp.float32
    attention_fn: object = None  # see GroupedQueryAttention.attention_fn
    # Mixture-of-Experts MLP (0 = dense SwiGLU, the reference shape).
    n_experts: int = 0
    moe_top_k: int = 2
    expert_capacity_factor: float = 2.0

    def setup(self):
        self.ln1 = nn.RMSNorm(dtype=self.dtype, name="ln1")
        self.attn = GroupedQueryAttention(self.q_heads, self.dims, self.kv_heads,
                                          dtype=self.dtype,
                                          attention_fn=self.attention_fn,
                                          name="attn")
        self.ln2 = nn.RMSNorm(dtype=self.dtype, name="ln2")
        if self.n_experts > 0:
            from yoho_tpu.nn.moe import MoESwiGLU

            self.mlp = MoESwiGLU(self.n_experts, int(self.dims * 3),
                                 top_k=self.moe_top_k,
                                 capacity_factor=self.expert_capacity_factor,
                                 dtype=self.dtype, name="mlp")
        else:
            self.mlp = SwiGLU(int(self.dims * 3), dtype=self.dtype, name="mlp")

    def __call__(self, x, pos=None):
        # ``pos``: global RoPE offset of this (possibly time-sharded)
        # chunk — the sequence-parallel encoder passes the shard start.
        x = x + self.attn(self.ln1(x), pos=pos)
        x = x + self.mlp(self.ln2(x))
        return x


def decoder_block_kwargs(cfg: YOHOConfig, index: int) -> dict:
    """Constructor kwargs of decoder block ``index`` (single source, like
    :func:`encoder_block_kwargs`). Decoder MLPs route through MoE only
    when BOTH ``n_experts > 0`` and ``moe_in_decoder`` are set."""
    moe = (cfg.n_experts > 0 and cfg.moe_in_decoder
           and index % cfg.moe_every_n == cfg.moe_every_n - 1)
    return dict(
        q_heads=cfg.n_text_heads,
        kv_heads=max(1, cfg.n_text_heads // 2),
        dims=cfg.dims,
        n_experts=cfg.n_experts if moe else 0,
        moe_top_k=cfg.moe_top_k,
        expert_capacity_factor=cfg.expert_capacity_factor,
    )


class YOHODecoderBlock(nn.Module):
    q_heads: int
    kv_heads: int
    dims: int
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False
    # Mixture-of-Experts MLP (0 = dense SwiGLU). Works in both the
    # teacher-forced forward and the cached decode_step (per-sample
    # routing is shape-agnostic: S=1 steps route each token to top-k
    # experts with capacity 1).
    n_experts: int = 0
    moe_top_k: int = 2
    expert_capacity_factor: float = 2.0

    def setup(self):
        d = self.dtype
        w8 = self.weights_int8
        self.ln1 = nn.RMSNorm(dtype=d, name="ln1")
        self.attn = GroupedQueryAttention(self.q_heads, self.dims, self.kv_heads,
                                          dtype=d, weights_int8=w8, name="attn")
        self.ln2 = nn.RMSNorm(dtype=d, name="ln2")
        # The reference RMSNorms the encoder output inside every decoder
        # block before cross-attention (``layers.py:131-132``); we keep that.
        self.ln_kv = nn.RMSNorm(dtype=d, name="ln_kv")
        self.cross_attn = GroupedQueryAttention(self.q_heads, self.dims, self.kv_heads,
                                                dtype=d, weights_int8=w8,
                                                name="cross_attn")
        self.ln3 = nn.RMSNorm(dtype=d, name="ln3")
        if self.n_experts > 0:
            if w8:
                raise ValueError(
                    "weights_int8 decoder serving does not support MoE "
                    "decoder blocks (moe_in_decoder) — serve the MoE "
                    "decoder in bf16/f32 or keep the decoder dense")
            from yoho_tpu.nn.moe import MoESwiGLU

            self.mlp = MoESwiGLU(self.n_experts, int(self.dims * 1.5),
                                 top_k=self.moe_top_k,
                                 capacity_factor=self.expert_capacity_factor,
                                 dtype=d, name="mlp")
        else:
            self.mlp = SwiGLU(int(self.dims * 1.5), dtype=d, weights_int8=w8,
                              name="mlp")

    def __call__(self, x, xa, mask):
        x = x + self.attn(self.ln1(x), mask=mask)
        x = x + self.cross_attn(self.ln2(x), xa=self.ln_kv(xa))
        x = x + self.mlp(self.ln3(x))
        return x

    def step(self, x, cache: KVCache, cross_kv, pos):
        a, new_cache = self.attn(self.ln1(x), cache=cache, pos=pos)
        x = x + a
        x = x + self.cross_attn(self.ln2(x), cross_kv=cross_kv, pos=pos)
        x = x + self.mlp(self.ln3(x))
        return x, new_cache

    def cross_kv(self, xa):
        return self.cross_attn.kv(self.ln_kv(xa))


class YOHOAudioEncoder(nn.Module):
    cfg: YOHOConfig
    dtype: jnp.dtype = jnp.float32
    attention_fn: object = None  # swap in ring attention (long encoder)
    # Per-block gradient checkpointing: the backward pass recomputes each
    # block's activations from its input instead of keeping them live, so
    # training activation memory drops from O(depth) to O(1) blocks at the
    # cost of one extra forward. Exact (same function, same grads); only
    # the training path cares — under jit without grads it is a no-op.
    remat: bool = False

    def setup(self):
        c = self.cfg
        d = self.dtype
        self.conv1 = nn.Conv(c.dims, (3,), dtype=d, name="conv1")
        self.norm1 = nn.RMSNorm(dtype=d, name="norm1")
        self.conv2 = nn.Conv(c.dims, (3,), dtype=d, name="conv2")
        self.norm2 = nn.RMSNorm(dtype=d, name="norm2")
        block_cls = maybe_remat(YOHOEncoderBlock, self.remat)
        # Every moe_every_n-th block (e.g. every other, GShard-style)
        # carries the MoE MLP; the rest stay dense (encoder_block_kwargs).
        self.blocks = [
            block_cls(
                dtype=d, attention_fn=self.attention_fn, name=f"blocks_{i}",
                **encoder_block_kwargs(c, i),
            )
            for i in range(c.n_audio_blocks)
        ]

    def stem(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Conv front: (B, S_frames, n_mels) -> (B, S_frames // 2, dims).

        Linear in sequence length — the long encoder runs it unsharded and
        shards only the quadratic transformer stack (run_blocks)."""
        x = self.conv1(mel.astype(self.dtype))
        x = nn.silu(self.norm1(x))
        # Halve time: (1,2) max-pool, parity with model.py:21.
        x = nn.max_pool(x, (2,), strides=(2,))
        x = self.conv2(x)
        return nn.silu(self.norm2(x))

    def run_blocks(self, x: jnp.ndarray, pos=None) -> jnp.ndarray:
        """Transformer stack; ``pos`` = global RoPE offset of this chunk
        (sequence-parallel shards pass their start position)."""
        for blk in self.blocks:
            x = blk(x, pos=pos)
        return x

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, max_audio_len, n_mels) -> (B, max_audio_len // 2, dims)."""
        return self.run_blocks(self.stem(mel))


class YOHOTextDecoder(nn.Module):
    cfg: YOHOConfig
    vocab_size: int
    voiceprint_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    weights_int8: bool = False
    remat: bool = False  # see YOHOAudioEncoder.remat

    def setup(self):
        c = self.cfg
        if self.weights_int8:
            from yoho_tpu.nn.layers import QuantizedDense, QuantizedEmbed

            self.token_embedding = QuantizedEmbed(self.vocab_size, c.dims,
                                                  dtype=self.dtype,
                                                  name="token_embedding")
            vp_dense = QuantizedDense
        else:
            self.token_embedding = nn.Embed(self.vocab_size, c.dims,
                                            dtype=self.dtype,
                                            name="token_embedding")
            vp_dense = nn.Dense
        # Only __call__ is lifted: the decode path (step / cross_kv) never
        # differentiates, and cross_attention_map reaches into sublayers.
        block_cls = maybe_remat(YOHODecoderBlock, self.remat)
        self.blocks = [
            block_cls(dtype=self.dtype, weights_int8=self.weights_int8,
                      name=f"blocks_{i}", **decoder_block_kwargs(c, i))
            for i in range(c.n_text_blocks)
        ]
        self.ln = nn.RMSNorm(dtype=self.dtype, name="ln")
        # Voiceprint head: hidden -> speaker embedding (L2-normalized).
        self.voiceprint_head = vp_dense(self.voiceprint_dim, use_bias=False,
                                        dtype=self.dtype, name="voiceprint_head")

    def _hidden(self, tokens, xa):
        t = tokens.shape[1]
        x = self.token_embedding(tokens)
        mask = causal_mask(t, t)
        for blk in self.blocks:
            x = blk(x, xa, mask)
        return self.ln(x)

    def _logits(self, h):
        if self.weights_int8:
            return self.token_embedding.logits(h, self.dtype)
        emb = self.token_embedding.embedding.astype(self.dtype)
        from yoho_tpu.nn.layers import _f32_accum_operands

        return jnp.einsum("bsd,vd->bsv", *_f32_accum_operands(h, emb),
                          preferred_element_type=jnp.float32)

    def __call__(self, tokens, xa):
        return self._logits(self._hidden(tokens, xa))

    def cross_attention_map(self, tokens, xa, with_probs: bool = False):
        """Teacher-forced forward collecting the word-alignment signal:
        mean cross-attention over the upper half of the decoder blocks
        (the same heuristic as ``whisper.py:cross_attention_map`` — no
        checkpoint ships an alignment-head mask). Returns
        (B, S_text, T_audio) f32; with ``with_probs`` also the realized-
        token probabilities (B, S_text) from the same forward (see
        ``layers.realized_token_probs``). Each block RMSNorms the encoder
        output (``ln_kv``) before its cross-attention, exactly like the
        main forward."""
        t = tokens.shape[1]
        x = self.token_embedding(tokens)
        mask = causal_mask(t, t)
        align_from = len(self.blocks) // 2
        acc = None
        for i, blk in enumerate(self.blocks):
            x = x + blk.attn(blk.ln1(x), mask=mask)
            x_attn_in = blk.ln2(x)
            xa_in = blk.ln_kv(xa)
            if i >= align_from:
                w = blk.cross_attn.attention_map(x_attn_in, xa_in)
                acc = w if acc is None else acc + w
            x = x + blk.cross_attn(x_attn_in, xa=xa_in)
            x = x + blk.mlp(blk.ln3(x))
        amap = acc / max(len(self.blocks) - align_from, 1)
        if not with_probs:
            return amap
        from yoho_tpu.nn.layers import realized_token_probs_streamed

        return amap, realized_token_probs_streamed(
            self.ln(x), self._logits, tokens)

    def with_voiceprints(self, tokens, xa):
        """Returns (logits, voiceprint embeddings per position).

        Embeddings are L2-normalized; callers gather the positions that
        carry ``<|voiceprint|>`` tokens (the same forward pass serves ASR
        and speaker recognition — the joint-head design from the north
        star).
        """
        h = self._hidden(tokens, xa)
        vp = self.voiceprint_head(h)
        vp = vp / jnp.maximum(jnp.linalg.norm(vp, axis=-1, keepdims=True), 1e-6)
        return self._logits(h), vp

    def init_caches(self, batch: int, dtype=None, max_len=None) -> List[KVCache]:
        c = self.cfg
        kvh = max(1, c.n_text_heads // 2)
        # Lane-aligned horizon (see whisper.py init_caches).
        aligned = -(-(max_len or c.max_text_len) // 128) * 128
        return [
            KVCache.zeros(batch, kvh, aligned,
                          c.dims // c.n_text_heads, dtype or self.dtype)
            for _ in range(c.n_text_blocks)
        ]

    def cross_kvs(self, xa):
        return [blk.cross_kv(xa) for blk in self.blocks]

    def decode_step(self, tokens, caches, cross_kvs, pos):
        x = self.token_embedding(tokens)
        new_caches = []
        for blk, cache, ckv in zip(self.blocks, caches, cross_kvs):
            x, nc = blk.step(x, cache, ckv, pos)
            new_caches.append(nc)
        h = self.ln(x)
        vp = self.voiceprint_head(h)
        vp = vp / jnp.maximum(jnp.linalg.norm(vp, axis=-1, keepdims=True), 1e-6)
        return self._logits(h), vp, new_caches


class YOHOModel(nn.Module):
    """Joint ASR + diarization + speaker-recognition model."""

    cfg: YOHOConfig
    vocab_size: int
    voiceprint_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    # Serve the decoder with int8 kernels (see Whisper.weights_int8 and
    # yoho_tpu.nn.quantize.quantize_yoho_decoder).
    weights_int8: bool = False
    # Gradient-checkpoint every transformer block (training memory lever,
    # exact — see YOHOAudioEncoder.remat). Set from the session TOML via
    # [hyperparameters.<stage>] remat = true.
    remat: bool = False

    def setup(self):
        self.encoder = YOHOAudioEncoder(self.cfg, dtype=self.dtype,
                                        remat=self.remat, name="encoder")
        self.decoder = YOHOTextDecoder(self.cfg, self.vocab_size, self.voiceprint_dim,
                                       dtype=self.dtype,
                                       weights_int8=self.weights_int8,
                                       remat=self.remat,
                                       name="decoder")

    def __call__(self, tokens: jnp.ndarray, mel: jnp.ndarray) -> jnp.ndarray:
        # Argument order (text, audio) matches the reference Model.__call__
        # (``model.py:77-80``).
        return self.decoder(tokens, self.encoder(mel))

    def encode_audio(self, mel):
        return self.encoder(mel)

    def decode_text(self, tokens, xa):
        return self.decoder(tokens, xa)

    def cross_attention_map(self, tokens, xa, with_probs: bool = False):
        return self.decoder.cross_attention_map(tokens, xa, with_probs)

    def forward_with_voiceprints(self, tokens, mel):
        return self.decoder.with_voiceprints(tokens, self.encoder(mel))

    def cross_kvs(self, xa):
        return self.decoder.cross_kvs(xa)

    def init_caches(self, batch: int, dtype=None, max_len=None):
        return self.decoder.init_caches(batch, dtype, max_len)

    def decode_step(self, tokens, caches, cross_kvs, pos):
        return self.decoder.decode_step(tokens, caches, cross_kvs, pos)
