"""HF Whisper checkpoint -> yoho_tpu param pytree.

The reference implies a converter existed ("loads HF pretrained weights",
``README.md:16``) but never shipped it (SURVEY.md §5 checkpoint notes); this
one is written from scratch against the transformers WhisperModel layout.

Layout mapping (torch -> flax):
  * Linear weight (out, in)            -> kernel (in, out)       [transpose]
  * Conv1d weight (out, in, k)         -> kernel (k, in, out)    [permute]
  * Embedding weight                   -> embedding              [copy]
  * encoder.embed_positions            -> dropped (fixed sinusoids, recomputed)
  * decoder.embed_positions            -> positional_embedding
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from yoho_tpu.core.config import WhisperConfig


def _lin(sd, prefix, bias=True):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])  # (out, in, k)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),  # (k, in, out)
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _attn(sd, prefix, k_bias=False):
    return {
        "q_proj": _lin(sd, prefix + ".q_proj"),
        "k_proj": _lin(sd, prefix + ".k_proj", bias=k_bias),
        "v_proj": _lin(sd, prefix + ".v_proj"),
        "out_proj": _lin(sd, prefix + ".out_proj"),
    }


def convert_hf_whisper(state_dict: Dict[str, "np.ndarray"], cfg: WhisperConfig) -> dict:
    """Convert a transformers WhisperModel/WhisperForConditionalGeneration
    state_dict (torch tensors or numpy arrays) into our param pytree."""
    sd = {}
    for key, val in state_dict.items():
        # Accept both WhisperModel ("encoder...") and
        # WhisperForConditionalGeneration ("model.encoder...") keys.
        if key.startswith("model."):
            key = key[len("model."):]
        if key == "proj_out.weight":
            continue  # tied to embed_tokens
        if hasattr(val, "detach"):
            val = val.detach().cpu()
            # torch bfloat16 has no numpy dtype (.numpy() raises
            # TypeError) — common for checkpoints saved with
            # torch_dtype=bfloat16; upcast first, params are converted
            # to the model dtype downstream anyway.
            if str(val.dtype) == "torch.bfloat16":
                val = val.float()
            arr = val.numpy()
        else:
            arr = np.asarray(val)
        sd[key] = arr

    enc: dict = {
        "conv1": _conv(sd, "encoder.conv1"),
        "conv2": _conv(sd, "encoder.conv2"),
        "ln_post": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.n_audio_layer):
        p = f"encoder.layers.{i}"
        enc[f"blocks_{i}"] = {
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": {"fc1": _lin(sd, f"{p}.fc1"), "fc2": _lin(sd, f"{p}.fc2")},
        }

    dec: dict = {
        "token_embedding": {"embedding": sd["decoder.embed_tokens.weight"]},
        "positional_embedding": sd["decoder.embed_positions.weight"],
        "ln": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(cfg.n_text_layer):
        p = f"decoder.layers.{i}"
        dec[f"blocks_{i}"] = {
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "ln2": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "cross_attn": _attn(sd, f"{p}.encoder_attn"),
            "ln3": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": {"fc1": _lin(sd, f"{p}.fc1"), "fc2": _lin(sd, f"{p}.fc2")},
        }

    return {"encoder": enc, "decoder": dec}


def hf_config_to_whisper(hf_config) -> WhisperConfig:
    """Map a transformers.WhisperConfig to our WhisperConfig.

    ``chunk_seconds`` is not an HF field — it is DERIVED from the
    encoder geometry (stride-2 conv stem: ``n_frames = 2*n_audio_ctx``),
    so non-30s checkpoints (e.g. exported tiny test geometries) load
    with a consistent window instead of the default 30 s.
    """
    sr, hop = 16000, 160
    return WhisperConfig(
        n_mels=hf_config.num_mel_bins,
        n_audio_ctx=hf_config.max_source_positions,
        chunk_seconds=2 * hf_config.max_source_positions * hop / sr,
        n_audio_state=hf_config.d_model,
        n_audio_head=hf_config.encoder_attention_heads,
        n_audio_layer=hf_config.encoder_layers,
        n_vocab=hf_config.vocab_size,
        n_text_ctx=hf_config.max_target_positions,
        n_text_state=hf_config.d_model,
        n_text_head=hf_config.decoder_attention_heads,
        n_text_layer=hf_config.decoder_layers,
    )


def load_hf_whisper(model_name_or_path, dtype=None):
    """Load an HF Whisper checkpoint from disk/hub -> (cfg, params).

    Requires the transformers + torch stack (host-side, one-time).
    """
    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(model_name_or_path)
    cfg = hf_config_to_whisper(model.config)
    params = convert_hf_whisper(model.state_dict(), cfg)
    if dtype is not None:
        import jax

        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return cfg, params
