"""Post-training int8 quantization for serving.

Two schemes, matched to where each half of the model spends its time:

* **Decoder, weight-only** (``quantize_whisper_decoder`` /
  ``quantize_yoho_decoder`` -> ``weights_int8=True``): Dense kernels
  become int8 with per-output-channel absmax scales, the tied token
  embedding int8 with per-row scales; activations stay bf16 and XLA
  fuses the dequant into the matmul. The decode step is WEIGHT-bound
  (its weights re-read every token) — measured 1.58x on the B=1 weight
  chain (experiments/int8_weights_probe.py).
* **Encoder, W8A8** (``quantize_whisper_encoder`` ->
  ``encoder_int8=True``): the encoder is COMPUTE-bound (weights
  amortize over 1500 positions), so weight-only buys nothing there —
  instead activations are dynamically quantized per token and the
  matmuls run int8 x int8 -> int32 on the MXU's 2x-rate int8 path
  (experiments/int8_mxu_probe.py). Conv stem/layernorms stay bf16.

Both are classic symmetric absmax schemes — near-lossless for
transformer serving; the logits are NOT bit-identical to bf16 (unlike
the int8 KV cache, which is argmax-identical in tests). Validate on
your eval set.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_dense_params(p: dict) -> dict:
    """{kernel (in, out), bias?} -> {kernel_q, kernel_scale, bias?}.

    Pure jnp so it runs on-device (and under jit) — big param trees never
    round-trip through the host.
    """
    kernel = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def quantize_embed_params(p: dict) -> dict:
    """{embedding (V, D)} -> {embedding_q, embedding_scale} (per-row)."""
    emb = jnp.asarray(p["embedding"], jnp.float32)
    scale = jnp.max(jnp.abs(emb), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(emb / scale), -127, 127).astype(jnp.int8)
    return {"embedding_q": q, "embedding_scale": scale}


# DenseGeneral kernels (in, h, hd) quantize identically to Dense ones —
# axis-0 absmax with keepdims covers any kernel rank, and DenseGeneral
# projections carry no bias. One function so the scheme can't diverge.
quantize_dense_general_params = quantize_dense_params


_DENSE_NAMES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def quantize_whisper_decoder(variables: dict) -> dict:
    """Param tree for ``Whisper(...)`` -> tree for
    ``Whisper(..., weights_int8=True)`` (same model config)."""
    params = variables["params"] if "params" in variables else variables
    out = dict(params)
    dec = dict(params["decoder"])

    dec["token_embedding"] = quantize_embed_params(dec["token_embedding"])
    for name, block in list(dec.items()):
        if not name.startswith("blocks_"):
            continue
        new_block = dict(block)
        for sub_name, sub in block.items():
            if sub_name in ("attn", "cross_attn", "mlp"):
                new_sub = dict(sub)
                for leaf_name, leaf in sub.items():
                    if leaf_name in _DENSE_NAMES:
                        new_sub[leaf_name] = quantize_dense_params(leaf)
                new_block[sub_name] = new_sub
        dec[name] = new_block

    out["decoder"] = dec
    return {"params": out} if "params" in variables else out


def quantize_whisper_encoder(variables: dict) -> dict:
    """Param tree for ``Whisper(...)`` -> tree for
    ``Whisper(..., encoder_int8=True)`` (same model config).

    Encoder block MLP kernels (fc1/fc2) become int8 with per-output-
    channel scales (the same layout as the decoder scheme — ``Int8Dense``
    and ``QuantizedDense`` share it); attention projections, the conv
    stem, layernorms, and ``ln_post`` stay untouched. MLP-ONLY on
    purpose: the rectangular fc matmuls have enough MXU work per byte
    for the int8 path to win, while the square n_state x n_state
    attention projections measured 3x SLOWER than bf16 under dynamic
    activation quantization (experiments/w8a8_kernel_bench.py) — so
    they stay exact. Unlike the weight-only decoder scheme this feeds
    the MXU int8 on BOTH operands (activations are quantized
    dynamically at run time); the GELU between fc1/fc2 becomes the tanh
    approximation, fused into fc1's kernel epilogue (the exact-erf GELU
    is VPU-bound — experiments/gelu_probe.py). Composes with
    ``quantize_whisper_decoder`` (disjoint subtrees).
    """
    params = variables["params"] if "params" in variables else variables
    out = dict(params)
    enc = dict(params["encoder"])

    for name, block in list(enc.items()):
        if not name.startswith("blocks_"):
            continue
        new_block = dict(block)
        new_block["mlp"] = {
            leaf_name: (quantize_dense_params(leaf)
                        if leaf_name in _DENSE_NAMES else leaf)
            for leaf_name, leaf in block["mlp"].items()
        }
        enc[name] = new_block

    out["encoder"] = enc
    return {"params": out} if "params" in variables else out


def quantize_yoho_decoder(variables: dict) -> dict:
    """Param tree for ``YOHOModel(...)`` -> tree for
    ``YOHOModel(..., weights_int8=True)``. GQA q/k/v are DenseGeneral
    ((in, h, hd) kernels); out_proj / SwiGLU / voiceprint_head are plain
    bias-free Dense; the tied embedding gets per-row scales."""
    params = variables["params"] if "params" in variables else variables
    out = dict(params)
    dec = dict(params["decoder"])

    dec["token_embedding"] = quantize_embed_params(dec["token_embedding"])
    dec["voiceprint_head"] = quantize_dense_params(dec["voiceprint_head"])
    for name, block in list(dec.items()):
        if not name.startswith("blocks_"):
            continue
        new_block = dict(block)
        for sub_name, sub in block.items():
            if sub_name in ("attn", "cross_attn"):
                new_sub = dict(sub)
                for leaf in ("q_proj", "k_proj", "v_proj"):
                    new_sub[leaf] = quantize_dense_general_params(sub[leaf])
                new_sub["out_proj"] = quantize_dense_params(sub["out_proj"])
                new_block[sub_name] = new_sub
            elif sub_name == "mlp":
                if "experts" in sub:
                    raise ValueError(
                        "quantize_yoho_decoder: decoder block "
                        f"{name!r} carries MoE expert params "
                        "(moe_in_decoder) — int8 decoder serving "
                        "supports dense decoders only")
                new_block[sub_name] = {
                    leaf: quantize_dense_params(p) for leaf, p in sub.items()
                }
        dec[name] = new_block

    out["decoder"] = dec
    return {"params": out} if "params" in variables else out
