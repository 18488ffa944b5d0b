"""Sharded (orbax/tensorstore) checkpointing for pod-scale models.

The msgpack path (``yoho_tpu.train.checkpoint``) gathers everything to one
host — fine through whisper-large on a single VM, wrong for multi-host pods
where each process should write only its addressable shards. This module
wraps orbax's PyTree checkpointing behind the same (step, params, opt_state)
contract; restored arrays keep the shardings of the provided templates.

Opt-in: call these directly from pod launch scripts (no trainer flag —
the single-host msgpack path stays the default; see
``checkpoint.save_train_state`` for the trainer-facing contract).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_sharded(path, step: int, params, opt_state) -> None:
    """Write an orbax checkpoint directory at ``path``.

    Write-then-swap: the new checkpoint lands in a sibling ``.new`` dir
    first, and only the coordinator swaps it into place AFTER the
    collective save finished — deleting the old checkpoint up front
    would leave a zero-checkpoint window (a crash there loses the whole
    run), and an unsynchronized per-process rmtree on a shared
    filesystem races its peers mid-walk.
    """
    from yoho_tpu.parallel.mesh import barrier, is_coordinator

    path = Path(path).absolute()
    staging = path.with_name(path.name + ".new")
    if staging.exists() and is_coordinator():
        import shutil

        shutil.rmtree(staging)  # leftover from a crashed save
    barrier("sharded-ckpt-staging")
    ckptr = _checkpointer()
    ckptr.save(staging, {"step": step, "params": params,
                         "opt_state": opt_state})
    ckptr.wait_until_finished()
    barrier("sharded-ckpt-written")
    if is_coordinator():
        import shutil

        old = path.with_name(path.name + ".old")
        if old.exists():
            shutil.rmtree(old)
        if path.exists():
            path.rename(old)
        staging.rename(path)
        if old.exists():
            shutil.rmtree(old)
    barrier("sharded-ckpt-swapped")


def load_checkpoint_sharded(path, params_template, opt_state_template
                            ) -> Optional[Tuple[int, Any, Any]]:
    """Restore against templates (shardings preserved); None when absent.

    Falls back to the ``.old`` sibling if a crash landed between the
    rename-away and the rename-in of :func:`save_checkpoint_sharded`'s
    swap (the only instant where ``path`` itself is missing)."""
    path = Path(path).absolute()
    if not path.exists():
        old = path.with_name(path.name + ".old")
        if not old.exists():
            return None
        path = old
    ckptr = _checkpointer()
    target = {"step": 0, "params": params_template, "opt_state": opt_state_template}
    restored = ckptr.restore(path, target)
    return int(restored["step"]), restored["params"], restored["opt_state"]
