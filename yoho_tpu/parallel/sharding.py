"""Parameter partitioning: regex path rules -> PartitionSpec pytrees.

Tensor parallelism is expressed as named-axis shardings on the parameter
tree; XLA inserts the collectives (all-gather / reduce-scatter over ICI).
The reference has no TP at all (SURVEY.md §2.3), so this module is designed
fresh: attention head projections and MLP hidden dims shard over ``model``,
embeddings over vocab, everything else replicated.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yoho_tpu.parallel.mesh import AXIS_MODEL

# A rule: (path regex, PartitionSpec). First match wins. Paths are
# "/"-joined flax param paths, e.g. "encoder/blocks_0/attn/q_proj/kernel".
PartitionRules = Sequence[Tuple[str, P]]

# Whisper / YOHO share layer naming (yoho_tpu.nn.layers); one rule set
# covers both model families.
_COMMON_RULES: PartitionRules = (
    # Attention projections: kernel (in, heads*head_dim) -> shard heads.
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, AXIS_MODEL)),
    (r".*(q_proj|k_proj|v_proj)/bias$", P(AXIS_MODEL)),
    (r".*out_proj/kernel$", P(AXIS_MODEL, None)),
    (r".*out_proj/bias$", P()),
    # MoE experts: stacked params lead with the expert axis — shard it
    # over ``model`` (expert parallelism; GSPMD inserts the all-to-alls
    # around the dense dispatch einsums, see yoho_tpu.nn.moe). The router
    # stays replicated (it is tiny and every token needs it).
    (r".*mlp/experts/.*$", P(AXIS_MODEL)),
    (r".*mlp/router/.*$", P()),
    # MLP: up projections shard hidden, down projection shards input.
    (r".*mlp/(fc1|gate|up)/kernel$", P(None, AXIS_MODEL)),
    (r".*mlp/(fc1|gate|up)/bias$", P(AXIS_MODEL)),
    (r".*mlp/(fc2|down)/kernel$", P(AXIS_MODEL, None)),
    (r".*mlp/(fc2|down)/bias$", P()),
    # Token embedding: shard vocab (row) axis.
    (r".*token_embedding/embedding$", P(AXIS_MODEL, None)),
    # Voiceprint head.
    (r".*voiceprint_head/.*/kernel$", P(None, AXIS_MODEL)),
    # Conv stems, norms, positional embeddings: replicate.
    (r".*", P()),
)

WHISPER_RULES: PartitionRules = _COMMON_RULES
YOHO_RULES: PartitionRules = _COMMON_RULES


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def partition_specs(params, rules: PartitionRules = _COMMON_RULES,
                    mesh: Optional[Mesh] = None):
    """Map a param pytree to a pytree of PartitionSpecs via path rules.

    Specs are rank-fitted to each leaf (extra sharded axes dropped).
    Pass ``mesh`` to ALSO apply the mesh fallback — replication whenever
    a spec names an axis the mesh lacks or one that does not divide the
    leaf's shape (e.g. tiny test models on a big model axis); without a
    mesh that check cannot run here, and ``shard_params`` /
    ``named_shardings`` apply it themselves.
    """

    def _spec(path, leaf) -> P:
        s = _path_str(path)
        for pat, spec in rules:
            if re.match(pat, s):
                fitted = _fit(spec, leaf)
                return (_mesh_fit(fitted, getattr(leaf, "shape", ()), mesh)
                        if mesh is not None else fitted)
        return P()

    def _fit(spec: P, leaf) -> P:
        # Rank fit: drop sharded axes beyond the leaf's ndim.
        dims = getattr(leaf, "shape", ())
        out = []
        for i, ax in enumerate(spec):
            if ax is None or i >= len(dims):
                out.append(None)
                continue
            out.append(ax)
        out = out[: len(dims)]
        return P(*out) if out else P()

    return jax.tree_util.tree_map_with_path(_spec, params)


def _mesh_fit(spec: P, shape, mesh: Mesh) -> P:
    """The ONE mesh-fallback rule (shared by every placement path):
    replicate whenever the spec names an axis the mesh lacks (e.g. the
    ("data", "seq") long-context training mesh has no "model" axis) or
    one that does not divide the array's shape (tiny test models on a
    big model axis)."""
    for i, ax in enumerate(spec):
        if ax is not None and (ax not in mesh.shape
                               or shape[i] % mesh.shape[ax] != 0):
            return P()
    return spec


def shard_params(params, mesh: Mesh, rules: PartitionRules = _COMMON_RULES):
    """Place a parameter pytree onto the mesh according to the rules."""
    specs = partition_specs(params, rules)

    def _put(x, spec):
        spec = _mesh_fit(spec, x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, params, specs)


def named_shardings(params, mesh: Mesh, rules: PartitionRules = _COMMON_RULES):
    """Like :func:`shard_params` but returns the NamedSharding pytree (for
    use as jit in_shardings/out_shardings)."""
    specs = partition_specs(params, rules)

    def _ns(x, spec):
        return NamedSharding(mesh, _mesh_fit(spec, x.shape, mesh))

    return jax.tree_util.tree_map(_ns, params, specs)
