"""Device mesh + collective helpers: the framework's single comm module.

The reference distributes with single-host ``jax.pmap`` + ``lax.pmean`` over
NCCL (``train/stages/transcription_pretrain_no_voiceprints.py:194,215``).
The TPU-native replacement is a named ``jax.sharding.Mesh`` whose collectives
ride ICI (and DCN across slices) — every layer above this module only speaks
axis names, never transports.

Axis convention:
  * ``data``  — batch (data parallel); gradient psum rides this axis.
  * ``model`` — tensor parallel (attention heads / MLP hidden).

Multi-host: call :func:`init_distributed` first (no-op on one host); the same
mesh code then spans the full pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"


def init_distributed() -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Safe to call unconditionally: a no-op for single-process runs.

    Two launch shapes are recognized:

    * TPU pods / megascale: ``MEGASCALE_COORDINATOR_ADDRESS`` is set by
      the launcher and ``jax.distributed.initialize()`` auto-detects the
      rest from the TPU metadata service.
    * Explicit clusters: ``JAX_COORDINATOR_ADDRESS`` (+
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` where the platform
      cannot infer them, e.g. CPU/Gloo) — this is how
      ``tests/test_multihost.py`` forms a REAL 2-process cluster on CPU
      and runs the framework's mesh collectives across process
      boundaries, so the multi-host path is exercised without a pod.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ:
        return
    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # ONLY double-initialization is benign. Swallowing a failed init
        # (unreachable coordinator, dead process 0) would silently run
        # every host as its own single-process "cluster": is_coordinator
        # true everywhere (artifact writers corrupt each other), each
        # process training the FULL corpus — wrong results, no error.
        if "already initialized" not in str(e).lower():
            raise


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    ``data=-1`` absorbs whatever ``model`` does not use. Device order is
    taken from ``jax.devices()`` which already reflects physical ICI
    topology ordering on TPU.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model != 0:
        raise ValueError(f"model axis size {model} does not divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (AXIS_DATA, AXIS_MODEL))


def parse_mesh(spec: str) -> Mesh:
    """CLI mesh spec -> (data, model) Mesh.

    ``"2x4"`` = 2-way data x 4-way tensor parallel; the data factor may
    be ``-1`` (absorb remaining devices), so ``"-1x4"`` works on any
    device count divisible by 4. Used by ``yoho serve --mesh`` /
    ``yoho transcribe --mesh`` to enable multi-chip serving
    (``Transcriber(mesh=...)``).
    """
    parts = spec.lower().split("x")
    try:
        if len(parts) != 2:
            raise ValueError
        data, model = int(parts[0]), int(parts[1])
    except ValueError:
        raise ValueError(
            f"mesh spec {spec!r} is not DATAxMODEL (e.g. '2x4', '-1x8')"
        ) from None
    return make_mesh(data, model)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch tensors: leading axis split over ``data``, rest replicated."""
    return NamedSharding(mesh, P(AXIS_DATA, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-sharded on data.

    TPU-native replacement for ``flax.training.common_utils.shard``
    (reference trainer :231-236) — no leading device axis is introduced;
    the arrays stay logically global.

    Multi-process (``jax.process_count() > 1``): the input is this
    process's LOCAL rows; the global batch is their concatenation in
    process order along the ``data`` axis (each process loads a disjoint
    corpus shard — see the dataloaders' ``shard=`` argument — so the
    global batch size is ``local_rows x process_count``). Every process
    must call this with the same tree structure; it assembles a global
    ``jax.Array`` without any host gather.
    """
    multiprocess = jax.process_count() > 1

    def _put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def process_shard() -> tuple:
    """This process's ``(index, count)`` in the cluster — the dataloader
    sharding contract (disjoint corpus shards) and the writer-gating
    predicate. ``(0, 1)`` for single-process runs."""
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns artifact writes (metrics,
    checkpoints, exports) — process 0, or any single-process run."""
    return jax.process_index() == 0


def fetch_to_host(mesh: Mesh, tree):
    """Host (numpy) copies of a possibly cross-process sharded pytree.

    Single-process: plain ``device_get``. Multi-process: model-sharded
    leaves span devices this process cannot address, so the tree is
    first replicated through a collective identity jit (an all-gather
    over ICI/DCN) — EVERY process must call this, in the same program
    order, even though only the coordinator typically uses the result.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    return jax.device_get(_replicate_jit(mesh)(tree))


# jax's jit cache is keyed on function identity: building a fresh
# ``jax.jit(lambda t: t)`` per call would re-trace AND XLA-recompile the
# full-model all-gather at every checkpoint save / validation fetch /
# export on every process. One jitted identity per mesh (meshes are few
# and live for the whole run).
_REPLICATE_JIT: dict = {}


def _replicate_jit(mesh: Mesh):
    fn = _REPLICATE_JIT.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=replicated_sharding(mesh))
        _REPLICATE_JIT[mesh] = fn
    return fn


def local_batch_size(global_batch: int) -> int:
    """This process's share of a GLOBAL batch.

    Multi-host contract (all trainers): ``hp.batch_size`` is the global
    batch; each process loads ``global/process_count`` disjoint rows and
    ``shard_batch`` assembles the global array. Raises a config error —
    naming the real constraint — when it doesn't divide.
    """
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"batch_size {global_batch} must divide by the process "
            f"count {count} (each process loads batch_size/process_count "
            "local rows)")
    return global_batch // count


def barrier(name: str) -> None:
    """Cross-process sync point; a no-op for single-process runs.

    Orders shared-filesystem reads/writes between processes (e.g. every
    process reads a provenance file BEFORE the coordinator rewrites it).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
