"""HBM capacity model: pick a safe serving batch size (``batch_size="auto"``).

The reference leaves batch choice entirely to the operator (its demo decodes
one stream: ``yoho/src/nn/whisper.py:274-285``). On TPU the decode batch is
the single biggest serving knob — throughput rises with batch until HBM
bandwidth saturates, then the binding constraint becomes HBM *capacity*
(PERFORMANCE.md "Choosing batch size") — and a wrong guess costs either a
startup OOM (minutes into a cold compile) or idle bandwidth.

This module estimates how many concurrent decode streams fit in device HBM
from the model config alone. Per-stream terms (all byte-exact where the
artifact is a real buffer we allocate):

* cross-attention KV   — ``2 * n_text_layer * n_state * n_audio_ctx`` cells
  (time-minor storage; the dominant term: PERFORMANCE.md "cache layout is
  everything"), plus f32 per-position scales when quantized;
* self-attention cache — ``2 * n_text_layer * n_state * cache_len`` cells,
  ``cache_len`` = decode horizon rounded up to the 128-lane tile;
* mel window           — ``n_frames * n_mels`` f32;
* XLA staging temps    — encoder activations and cross-KV staging copies
  XLA keeps live while a batch encodes. These are NOT buffers we
  allocate, so they are CALIBRATED against the measured v5e fit
  boundaries (PERFORMANCE.md "Choosing batch size": small fits B=320 /
  OOMs at 352, large-v3 40/48, large-v3-turbo 160 fits):
  ``0.331 * n_audio_ctx * n_audio_state * n_audio_layer**1.5`` bytes.
  The superlinear depth term is empirical — a linear layers*ctx*state
  model cannot satisfy all three windows at once (small and large-v3
  scale proportionally in every linear per-stream term, but their
  measured staging overheads do not: ~16 MB vs ~110-158 MB per stream);
  deeper encoders demonstrably keep MORE than proportionally many
  activation temps live. The boundaries AND the one-quantum tightness
  targets (small >= 256, large-v3 >= 40, turbo >= 96 — VERDICT r4
  item 6) are pinned in ``tests/test_capacity.py``.

A suggestion is a safe starting point landing within ~one batch quantum
of the measured fit on every calibrated config: past bandwidth
saturation throughput creeps +2-3% per +25% batch (PERFORMANCE.md), so
the residual gap costs ~1-3%, while landing over the boundary costs the
process a startup OOM minutes into a cold compile.
"""

from __future__ import annotations

from typing import Optional

# Usable HBM per v5e chip as measured in this project's fit experiments
# (16 GB nominal; ~15.75 GB allocatable under XLA).
DEFAULT_HBM_BYTES = int(15.75e9)
# Held back for XLA workspace, fragmentation, and host-transfer staging.
RESERVE_BYTES = 512 << 20
_LANE = 128  # TPU minor-dim tile; cache lengths round up to it
# Staging calibration (module docstring): bytes per encoder cell and the
# empirical depth exponent, jointly fitted so every measured v5e fit
# boundary is approached within one batch quantum and no OOM point is
# crossed (tests/test_capacity.py pins both sides).
_STAGING_BYTES = 0.331
_STAGING_DEPTH_EXP = 1.5


# ---------------------------------------------------------------------------
# Parameter counts (analytic; validated against real checkpoints in tests:
# whisper-small 244M, large-v3 1.54B, large-v3-turbo 809M).
# ---------------------------------------------------------------------------

def whisper_param_count(cfg) -> int:
    """Parameters of a Whisper checkpoint (``nn/whisper.py``) from dims."""
    s_a, s_t = cfg.n_audio_state, cfg.n_text_state
    # Conv stem: (n_mels -> s, k=3) then (s -> s, k=3), both biased.
    conv = cfg.n_mels * s_a * 3 + s_a + s_a * s_a * 3 + s_a
    # Encoder block: attn 4*s^2 (+q/v/out biases), MLP 8*s^2, 2 LNs.
    enc = cfg.n_audio_layer * (12 * s_a * s_a + 12 * s_a) + 2 * s_a
    # Decoder block: self 4*s^2 + cross 4*s^2 + MLP 8*s^2, 3 LNs.
    dec = cfg.n_text_layer * (16 * s_t * s_t + 18 * s_t) + 2 * s_t
    embed = cfg.n_vocab * s_t + cfg.n_text_ctx * s_t  # tied logits
    return conv + enc + dec + embed


def whisper_encoder_param_count(cfg) -> int:
    """Encoder-side parameters (conv stem + encoder blocks + final LN).

    ``nn/quantize.quantize_whisper_decoder`` leaves the encoder in bf16, so
    int8-weights capacity accounting needs the split.
    """
    s_a = cfg.n_audio_state
    conv = cfg.n_mels * s_a * 3 + s_a + s_a * s_a * 3 + s_a
    enc = cfg.n_audio_layer * (12 * s_a * s_a + 12 * s_a) + 2 * s_a
    return conv + enc


def whisper_encoder_mlp_param_count(cfg) -> int:
    """Encoder MLP (fc1+fc2) parameters — the slice
    ``quantize_whisper_encoder`` actually quantizes (MLP-only; attention
    projections/conv/LNs stay bf16)."""
    s_a = cfg.n_audio_state
    return cfg.n_audio_layer * (8 * s_a * s_a + 5 * s_a)


def yoho_param_count(cfg, vocab_size: int) -> int:
    """Parameters of the custom YOHO model (``nn/yoho.py``) from dims."""
    s = cfg.dims
    conv = cfg.n_mel_bands * s * 3 + s * s * 3 + 2 * s
    # Standard GQA with kv_heads = q_heads // 2: q + out = 2*s^2,
    # k + v = s^2; SwiGLU(3x) = 9*s^2 (encoder), SwiGLU(1.5x) = 4.5*s^2.
    enc = cfg.n_audio_blocks * int(12 * s * s)
    dec = cfg.n_text_blocks * int(10.5 * s * s)
    return conv + enc + dec + vocab_size * s


# ---------------------------------------------------------------------------
# Per-stream and fixed budgets
# ---------------------------------------------------------------------------

def _round_up(n: int, quantum: int) -> int:
    return ((n + quantum - 1) // quantum) * quantum


def _cross_kv_bytes(n_layer: int, n_state: int, n_ctx: int,
                    kv_bytes: float) -> int:
    cells = 2 * n_layer * n_state * n_ctx
    scales = 2 * n_layer * n_ctx * 4 if kv_bytes < 2 else 0
    return int(cells * kv_bytes) + scales


def _self_cache_bytes(n_layer: int, n_state: int, horizon: int,
                      cache_bytes: float) -> int:
    cache_len = _round_up(max(1, horizon), _LANE)
    cells = 2 * n_layer * n_state * cache_len
    scales = 2 * n_layer * cache_len * 4 if cache_bytes < 2 else 0
    return int(cells * cache_bytes) + scales


def stream_bytes(cfg, family: str = "whisper", *,
                 horizon: Optional[int] = None,
                 kv_bytes: float = 4.0, cache_bytes: float = 4.0) -> int:
    """Estimated HBM bytes one decode stream holds live.

    ``kv_bytes``/``cache_bytes`` are bytes per KV cell: 4 (f32 caches,
    the ``Transcriber`` default), 2 (bf16), 1 (int8), 0.5 (int4 cross-KV).
    """
    if family == "whisper":
        n_layer, n_state = cfg.n_text_layer, cfg.n_text_state
        n_ctx, enc_layer = cfg.n_audio_ctx, cfg.n_audio_layer
        enc_state = cfg.n_audio_state
        mel = cfg.n_frames * cfg.n_mels * 4
        horizon = cfg.n_text_ctx if horizon is None else horizon
    elif family == "yoho":
        # GQA caches: kv_heads = n_text_heads // 2 (nn/yoho.py init_caches:
        # ``kvh = max(1, c.n_text_heads // 2)``), so each cached position
        # holds kv_heads * head_dim = ~dims/2 cells — NOT the full dims.
        kvh = max(1, cfg.n_text_heads // 2)
        head_dim = cfg.dims // cfg.n_text_heads
        n_layer, n_state = cfg.n_text_blocks, kvh * head_dim
        n_ctx, enc_layer = cfg.encoder_positions, cfg.n_audio_blocks
        enc_state = cfg.dims
        mel = cfg.max_audio_len * cfg.n_mel_bands * 4
        horizon = cfg.max_text_len if horizon is None else horizon
    else:
        raise ValueError(f"unknown family {family!r}")

    cross = _cross_kv_bytes(n_layer, n_state, n_ctx, kv_bytes)
    cache = _self_cache_bytes(n_layer, n_state, horizon, cache_bytes)
    # Calibrated staging term (see module docstring): encoder activation
    # temps + cross-KV staging XLA keeps live while a batch encodes,
    # fitted to the measured v5e boundaries with a superlinear depth
    # exponent (small ~16 MB/stream, large-v3 & turbo ~115 MB/stream).
    staging = int(_STAGING_BYTES * n_ctx * enc_state
                  * enc_layer ** _STAGING_DEPTH_EXP)
    return cross + cache + mel + staging


def detect_hbm_bytes(default: int = DEFAULT_HBM_BYTES) -> int:
    """Per-device HBM from the live backend when it reports one.

    Never *initializes* a backend (cold TPU init can block on a wedged
    relay — CLAUDE.md); only reads an already-live one.
    """
    try:
        from jax._src import xla_bridge

        if not getattr(xla_bridge, "_backends", None):
            return default
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        return limit if limit > 0 else default
    except Exception:
        return default


def suggest_batch_size(cfg, family: str = "whisper", *,
                       hbm_bytes: Optional[int] = None,
                       horizon: Optional[int] = None,
                       kv_bytes: float = 4.0,
                       cache_bytes: float = 4.0,
                       beams: int = 0,
                       weights_dtype_bytes: float = 2.0,
                       vocab_size: Optional[int] = None,
                       data_shards: int = 1,
                       model_shards: int = 1,
                       quantum: int = 8,
                       max_batch: int = 512,
                       extra_fixed_bytes: int = 0,
                       extra_stream_bytes: int = 0) -> int:
    """Suggest a serving batch size that fits in HBM.

    ``beams``: beam search keeps ``batch * beams`` cache streams live
    (PERFORMANCE.md: large-v3 beam=5 ran B=8 -> 40 streams).
    ``data_shards``/``model_shards``: mesh axes — tensor parallelism
    splits each stream's caches/weights across ``model_shards`` chips and
    data parallelism multiplies the global batch by ``data_shards``.
    ``extra_fixed_bytes``/``extra_stream_bytes``: additional per-device /
    per-stream costs the config alone can't see (a speculative draft
    model, the bf16 encoder of an int8-weights checkpoint). The extra
    stream term is deliberately NOT divided by ``model_shards`` —
    conservative for auxiliary buffers whose sharding we don't control.
    Returns at least 1; rounds down to ``quantum`` above it.
    """
    if hbm_bytes is None:
        hbm_bytes = detect_hbm_bytes()
    if family == "whisper":
        params = whisper_param_count(cfg)
    else:
        params = yoho_param_count(cfg, vocab_size or 16000)
    weights = int(params * weights_dtype_bytes) // max(1, model_shards)
    budget = hbm_bytes - weights - RESERVE_BYTES - max(0, extra_fixed_bytes)
    per_stream = stream_bytes(cfg, family, horizon=horizon,
                              kv_bytes=kv_bytes, cache_bytes=cache_bytes)
    per_stream = -(-per_stream // max(1, model_shards))  # ceil div
    per_stream += max(0, extra_stream_bytes)
    streams = max(0, budget) // max(1, per_stream)
    batch = int(streams // max(1, beams or 1))
    batch = min(batch, max_batch)
    if batch >= quantum:
        batch = (batch // quantum) * quantum
    return max(1, batch) * max(1, data_shards)


def resolve_auto_batch(t) -> int:
    """Resolve ``Transcriber(batch_size="auto")`` from the live settings."""
    import numpy as np

    cfg = t.model.cfg
    cache_elem = float(np.dtype(t.cache_dtype).itemsize)
    q = t.quantized_cross_kv
    kv_bytes = (0.5 if q == "int4" else 1.0 if q else cache_elem)
    cache_bytes = 1.0 if t.quantized_cache else cache_elem
    weights_bytes = (1.0 if getattr(t.model, "weights_int8", False) else 2.0)
    extra_fixed = extra_stream = 0
    horizon = t.max_len
    if weights_bytes == 1.0 and t.family == "whisper":
        # quantize_whisper_decoder leaves the ENCODER in bf16: those params
        # cost 1 byte more than the flat int8 accounting above. With
        # encoder_int8 only the encoder MLPs are int8 (MLP-only scheme) —
        # attention projections/conv/LNs (~215 MB on large-v3) still pay
        # the bf16 surcharge. (Without weights_int8, encoder_int8 alone
        # just makes the flat 2-byte model conservative.)
        bf16_extra = whisper_encoder_param_count(cfg)
        if getattr(t.model, "encoder_int8", False):
            bf16_extra -= whisper_encoder_mlp_param_count(cfg)
        extra_fixed += bf16_extra
    if t.draft_model is not None:
        # Speculative decoding keeps a full second model + per-stream
        # caches live (pipeline._decode_fn: draft caches share the target's
        # dtypes and the horizon grows by gamma+2 stale-write slots).
        d_cfg = t.draft_model.cfg
        horizon = t.max_len + int(getattr(t, "speculative_gamma", 4)) + 2
        if t.family == "whisper":
            extra_fixed += whisper_param_count(d_cfg) * 2  # bf16 draft
        else:
            extra_fixed += yoho_param_count(
                d_cfg, vocab_size=getattr(d_cfg, "n_vocab", 16000)) * 2
        extra_stream += stream_bytes(d_cfg, t.family, horizon=horizon,
                                     kv_bytes=kv_bytes,
                                     cache_bytes=cache_bytes)
    data_shards = model_shards = 1
    if t.mesh is not None:
        ax = dict(zip(t.mesh.axis_names, t.mesh.devices.shape))
        data_shards = int(ax.get("data", 1))
        model_shards = int(ax.get("model", 1))
    vocab = None
    if t.family == "yoho" and t.tokenizer is not None:
        vocab = int(t.tokenizer.vocab_size)
    return suggest_batch_size(
        cfg, t.family, horizon=horizon, kv_bytes=kv_bytes,
        cache_bytes=cache_bytes, beams=t.beams,
        weights_dtype_bytes=weights_bytes, vocab_size=vocab,
        data_shards=data_shards, model_shards=model_shards,
        extra_fixed_bytes=extra_fixed, extra_stream_bytes=extra_stream)
