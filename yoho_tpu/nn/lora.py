"""Low-rank adaptation (LoRA) — parameter-efficient fine-tuning.

The reference cannot adapt a pretrained checkpoint at all (its Whisper
is a frozen inference demo, ``yoho/src/nn/whisper.py:206-285``); this
framework's full fine-tune is ``train/whisper_finetune.py``. LoRA
(Hu et al., 2021) trains only rank-``r`` factors per targeted kernel —
``W' = W + (alpha/r) * A @ B`` with ``A: (d_in, r)`` gaussian and
``B: (r, d_out)`` zero-initialized — so the optimizer state and the
trained artifact are a fraction of a percent of the model, while the
frozen base stays bit-identical.

TPU-first design: instead of threading extra low-rank matmuls through
every Flax module (a model rewrite, and a decode-path divergence), the
adapter is **merged on the fly inside the jitted train step**:
``merge_lora(base, lora)`` adds ``scale * A@B`` to each targeted kernel
and the unmodified model consumes the merged tree. The merge costs
``O(d_in*d_out*r)`` FLOPs — negligible next to the ``O(d_in*d_out*B*T)``
matmul it feeds — XLA fuses the add into the consumer's operand, and
``jax.grad`` w.r.t. the LoRA tree alone flows through the add for free.
Merged kernels inherit the base kernel's GSPMD sharding (the add of a
replicated rank-r delta to a ``model``-sharded kernel stays sharded), so
the same step runs 1-chip to pod.

Adapter trees are flat ``{"<module/path>": {"a": A, "b": B}}`` dicts —
a valid pytree for optax/TrainState/msgpack, and self-describing enough
to re-apply at serving time (``--lora adapter_dir`` merges in one pass
at load, zero runtime cost).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Standard LoRA recipe: query/value projections of every attention
# (self + cross). Matched with re.search against the '/'-joined module
# path (the dict path WITHOUT the trailing 'kernel' leaf name).
DEFAULT_TARGETS = r"(attn|cross_attn)/(q_proj|v_proj)$"

ADAPTER_FILE = "lora_adapter.msgpack"
ADAPTER_META_FILE = "lora_adapter.meta.json"


def select_lora_targets(params, targets: str = DEFAULT_TARGETS) -> List[str]:
    """'/'-joined paths of modules whose ``kernel`` gets an adapter.

    A module qualifies when its path matches ``targets`` and it carries a
    ``kernel`` leaf with ndim >= 2 (Dense / DenseGeneral; conv kernels
    qualify too if explicitly targeted — axis 0 is treated as d_in and
    the rest as d_out, mirroring ``merge_lora``'s reshape).
    """
    found: List[str] = []

    def walk(node, path: Tuple[str, ...]):
        if not isinstance(node, dict):
            return
        kernel = node.get("kernel")
        if (kernel is not None and getattr(kernel, "ndim", 0) >= 2
                and re.search(targets, "/".join(path))):
            found.append("/".join(path))
        for key in sorted(node):
            child = node[key]
            if isinstance(child, dict):
                walk(child, path + (key,))

    walk(params, ())
    if not found:
        raise ValueError(
            f"lora targets regex {targets!r} matched no kernel-bearing "
            "module in the param tree — check the pattern against "
            "jax.tree_util.tree_flatten_with_path(params)")
    return found


def _node(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def init_lora(rng, params, rank: int,
              targets: str = DEFAULT_TARGETS) -> Dict[str, Dict[str, jax.Array]]:
    """Fresh adapter tree: A ~ N(0, 1/d_in), B = 0 (Hu et al. §4.1).

    B = 0 makes the merged model BIT-IDENTICAL to the base at step 0 —
    fine-tuning starts exactly from the pretrained behavior.
    """
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    lora: Dict[str, Dict[str, jax.Array]] = {}
    for path in select_lora_targets(params, targets):
        kernel = _node(params, path)["kernel"]
        d_in, d_out = kernel.shape[0], int(np.prod(kernel.shape[1:]))
        if rank > min(d_in, d_out):
            raise ValueError(
                f"lora rank {rank} exceeds min dim {min(d_in, d_out)} of "
                f"{path} kernel {tuple(kernel.shape)} — a full-rank "
                "adapter defeats the point; lower the rank")
        rng, sub = jax.random.split(rng)
        lora[path] = {
            "a": (jax.random.normal(sub, (d_in, rank), jnp.float32)
                  / np.sqrt(d_in)),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def lora_scale(rank: int, alpha: Optional[float] = None) -> float:
    """``alpha/rank``; default alpha = 2*rank (scale 2.0, the common
    peft recipe) — pass ``alpha=rank`` for a 1.0 scale."""
    return float(alpha if alpha is not None else 2 * rank) / float(rank)


def merge_lora(params, lora, scale: float):
    """Base tree + scaled low-rank deltas on the targeted kernels.

    Pure function of arrays — safe inside jit (gradients w.r.t. ``lora``
    flow through the add) and equally valid on host numpy trees (adapter
    application at checkpoint-load time). Non-targeted leaves are passed
    through by reference, untouched.
    """
    # tree_map rebuilds every container, so in-place edits below never
    # alias the caller's tree.
    merged = jax.tree_util.tree_map(lambda x: x, params)
    for path, ab in lora.items():
        node = _node(merged, path)
        kernel = node["kernel"]
        a, b = ab["a"], ab["b"]
        delta = (a @ b).reshape(kernel.shape)
        node["kernel"] = kernel + jnp.asarray(scale, kernel.dtype) * \
            delta.astype(kernel.dtype)
    return merged


def count_lora_params(lora) -> int:
    return int(sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(lora)))


# ---------------------------------------------------------------------------
# Adapter artifact: msgpack weights + json meta, loadable without the
# training stack (serving merges it at load via --lora).
# ---------------------------------------------------------------------------

def save_adapter(out_dir, lora, *, rank: int, alpha: Optional[float],
                 targets: str, extra_meta: Optional[dict] = None) -> Path:
    from flax import serialization

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    host = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x), np.float32), lora)
    (out_dir / ADAPTER_FILE).write_bytes(
        serialization.msgpack_serialize(host))
    meta = {"rank": int(rank),
            "alpha": float(alpha if alpha is not None else 2 * rank),
            "scale": lora_scale(rank, alpha),
            "targets": targets,
            "n_params": count_lora_params(host)}
    meta.update(extra_meta or {})
    (out_dir / ADAPTER_META_FILE).write_text(json.dumps(meta, indent=1))
    return out_dir / ADAPTER_FILE


def load_adapter(path) -> Tuple[dict, dict]:
    """-> (lora tree of numpy f32, meta dict). ``path`` may be the
    adapter file or a directory containing it."""
    from flax import serialization

    path = Path(path)
    if path.is_dir():
        path = path / ADAPTER_FILE
    if not path.exists():
        raise FileNotFoundError(
            f"no LoRA adapter at {path} (expected {ADAPTER_FILE} written "
            "by `yoho finetune --lora R`)")
    lora = serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_name(ADAPTER_META_FILE)
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return lora, meta


def apply_adapter(params, path, *, scale: Optional[float] = None):
    """Merge a saved adapter into a (host) param tree at load time.

    Raises if any adapter path is absent from the tree — a silent skip
    would serve the UNADAPTED base while claiming otherwise. Likewise
    raises when the merge scale is unknown (``lora_adapter.meta.json``
    lost and no explicit ``scale=``): guessing 1.0 would silently serve
    half the trained delta under the default alpha=2*rank recipe.
    """
    lora, meta = load_adapter(path)
    if scale is None:
        if "scale" not in meta:
            raise ValueError(
                f"adapter at {path} has no {ADAPTER_META_FILE} (or it "
                "lacks 'scale') — the merge scale alpha/rank is unknown "
                "and a guessed value would quietly mis-scale the trained "
                "delta; restore the meta file written next to the "
                "adapter, or pass scale= explicitly")
        scale = float(meta["scale"])
    missing = []
    for mod_path in lora:
        try:
            node = _node(params, mod_path)
        except KeyError:
            missing.append(mod_path)
            continue
        kernel = node.get("kernel")
        want = lora[mod_path]["a"].shape[0], lora[mod_path]["b"].shape[1]
        have = (None if kernel is None else
                (kernel.shape[0], int(np.prod(kernel.shape[1:]))))
        if have != want:
            raise ValueError(
                f"adapter {mod_path} was trained for a kernel of "
                f"(d_in, d_out)={want}, checkpoint has {have} — the "
                "adapter belongs to a different architecture")
    if missing:
        raise ValueError(
            f"adapter modules absent from this checkpoint: {missing[:4]}"
            f"{'...' if len(missing) > 4 else ''} — the adapter belongs "
            "to a different architecture")
    return merge_lora(params, lora, scale)
