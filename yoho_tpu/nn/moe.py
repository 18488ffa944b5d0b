"""Mixture-of-Experts SwiGLU with expert parallelism (static shapes).

The reference has no MoE (its MLP is a dense SwiGLU,
``yoho/src/nn/layers.py:7-20``); this is the TPU-native capability
extension that completes the dp/tp/sp/pp/ep parallelism set. Design
follows the classic TPU formulation (Mesh-TensorFlow / GShard / Switch):
routing is expressed as dense one-hot dispatch/combine einsums with a
STATIC per-expert capacity, so the whole layer is fixed-shape and XLA
partitions the expert axis like any other tensor dimension — expert
parallelism is just a sharding rule on the stacked expert params
(``parallel/sharding.py``: ``experts/*`` leaves lead with the expert
axis, sharded over ``model``), with GSPMD inserting the all-to-alls.

Routing: top-k (default 2, Mixtral-style renormalized gates; k=1 =
Switch). Tokens beyond an expert's capacity are DROPPED (contribute zero
from that expert) — the standard static-shape trade; the dropped
fraction is sown as a metric. The Switch load-balancing auxiliary loss
is sown as ``moe_aux_loss`` (collect with ``mutable=["intermediates"]``;
the trainer adds it when ``YOHOConfig.n_experts > 0``).

Routing is PER SAMPLE (each batch row competes only against its own
tokens for capacity, ``capacity = ceil(S / E * capacity_factor)`` per
row): a sample's output never depends on what it is co-batched with,
preserving this framework's batch-invariance guarantees (continuous
batching, microbatched pipelines) for MoE checkpoints.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from yoho_tpu.nn.layers import SwiGLU


def moe_dispatch(
    gates: jnp.ndarray,  # (T, E) f32 router probabilities (rows sum to 1)
    top_k: int,
    capacity: int,
    normalize_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape top-k dispatch/combine tensors.

    Returns ``(dispatch, combine, aux_loss, kept)``:
      * ``dispatch``: (T, E, C) 0/1 — token t occupies slot c of expert e;
      * ``combine``:  (T, E, C) f32 — dispatch weighted by (renormalized)
        gate values; ``einsum('tec,ecd->td', combine, expert_out)`` is the
        layer output;
      * ``aux_loss``: scalar Switch load-balancing loss
        ``E * sum_e(fraction_first_choice_e * mean_gate_e)`` (=1 when
        perfectly balanced);
      * ``kept``: (T,) number of experts that actually kept each token.

    Slot assignment is by token order (cumsum), with later choices (k>0)
    filling after earlier ones — every (expert, slot) pair is used at most
    once. Tokens past capacity are dropped from that expert only.
    """
    t, e = gates.shape
    f32 = jnp.float32
    gates = gates.astype(f32)

    remaining = gates
    total_kept = jnp.zeros((t, e), jnp.int32)
    dispatch = jnp.zeros((t, e, capacity), f32)
    combine = jnp.zeros((t, e, capacity), f32)
    denom = jnp.zeros((t,), f32)
    first_mask = None

    for k in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)
        mask = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # (T, E)
        if first_mask is None:
            first_mask = mask
        # Slot = rank among this round's tokens for that expert, offset by
        # the expert's occupancy from earlier rounds.
        prior = total_kept.sum(axis=0)  # (E,)
        pos = jnp.cumsum(mask, axis=0) - mask + prior[None, :]
        keep = mask * (pos < capacity)
        gate_k = (gates * mask).sum(axis=-1)  # (T,)
        disp_k = jax.nn.one_hot(pos, capacity, dtype=f32) * keep[..., None]
        dispatch = dispatch + disp_k
        combine = combine + disp_k * gate_k[:, None, None]
        # Renormalize over all k CHOSEN gates (kept or dropped) — the
        # Mixtral convention; a dropped expert's share is simply lost.
        denom = denom + gate_k
        total_kept = total_kept + keep
        remaining = remaining * (1 - mask).astype(f32)

    if normalize_topk and top_k > 1:
        combine = combine / jnp.maximum(denom, 1e-9)[:, None, None]

    frac = first_mask.astype(f32).mean(axis=0)  # (E,) first-choice share
    mean_gate = gates.mean(axis=0)  # (E,)
    aux_loss = e * jnp.sum(frac * mean_gate)
    return dispatch, combine, aux_loss, total_kept.sum(axis=-1)


def collect_aux_losses(intermediates: dict) -> jnp.ndarray:
    """Mean of every ``moe_aux_loss`` sown anywhere in an intermediates
    collection (one per MoE layer). Returns 0.0 when no MoE layer ran —
    safe to add unconditionally."""
    found = []

    def _walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "moe_aux_loss":
                    found.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    _walk(v)

    _walk(intermediates)
    if not found:
        return jnp.asarray(0.0, jnp.float32)
    return jnp.mean(jnp.stack([jnp.asarray(x, jnp.float32) for x in found]))


class MoESwiGLU(nn.Module):
    """Drop-in MoE replacement for :class:`yoho_tpu.nn.layers.SwiGLU`.

    ``n_experts`` SwiGLU experts with stacked params (leading expert
    axis — shard it over ``model`` for expert parallelism). The router is
    a bias-free dense in f32. Fixed capacity
    ``ceil(T / E * capacity_factor) * top_k`` per expert.
    """

    n_experts: int
    hidden_dim: int
    top_k: int = 2
    capacity_factor: float = 2.0
    normalize_topk: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, S, D)
        b, s, d = x.shape

        logits = nn.Dense(self.n_experts, use_bias=False,
                          dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)  # (B, S, E)

        # Per-SAMPLE capacity: each row routes independently, so results
        # are identical at any batch size / microbatch split.
        capacity = max(
            1, int(math.ceil(s / self.n_experts * self.capacity_factor)))
        capacity = min(capacity * max(1, self.top_k), s)
        dispatch, combine, aux_loss, kept = jax.vmap(
            lambda g: moe_dispatch(g, self.top_k, capacity,
                                   self.normalize_topk))(gates)
        # dispatch/combine: (B, S, E, C); aux_loss: (B,); kept: (B, S)

        expert_in = jnp.einsum("bsec,bsd->becd",
                               dispatch.astype(self.dtype),
                               x.astype(self.dtype))
        expert_in = expert_in.transpose(1, 0, 2, 3).reshape(
            self.n_experts, b * capacity, d)
        experts = nn.vmap(
            SwiGLU,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0, out_axes=0,
        )(self.hidden_dim, dtype=self.dtype, name="experts")
        expert_out = experts(expert_in)  # (E, B*C, D)
        expert_out = expert_out.reshape(
            self.n_experts, b, capacity, d).transpose(1, 0, 2, 3)

        out = jnp.einsum("bsec,becd->bsd", combine.astype(self.dtype),
                         expert_out)
        self.sow("intermediates", "moe_aux_loss", aux_loss.mean())
        self.sow("intermediates", "moe_dropped_fraction",
                 1.0 - kept.astype(jnp.float32).mean() / max(1, self.top_k))
        return out
