"""Sharded (orbax/tensorstore) checkpointing for pod-scale models.

The msgpack path (``yoho_tpu.train.checkpoint``) gathers everything to one
host — fine through whisper-large on a single VM, wrong for multi-host pods
where each process should write only its addressable shards. This module
wraps orbax's PyTree checkpointing behind the same (step, params, opt_state)
contract; restored arrays keep the shardings of the provided templates.

Opt-in: pass ``sharded=True`` slots through the trainer, or call directly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_sharded(path, step: int, params, opt_state) -> None:
    """Write an orbax checkpoint directory at ``path`` (replaced
    atomically by orbax's finalize step)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr = _checkpointer()
    ckptr.save(path, {"step": step, "params": params, "opt_state": opt_state})
    ckptr.wait_until_finished()


def load_checkpoint_sharded(path, params_template, opt_state_template
                            ) -> Optional[Tuple[int, Any, Any]]:
    """Restore against templates (shardings preserved); None when absent."""
    path = Path(path).absolute()
    if not path.exists():
        return None
    ckptr = _checkpointer()
    target = {"step": 0, "params": params_template, "opt_state": opt_state_template}
    restored = ckptr.restore(path, target)
    return int(restored["step"]), restored["params"], restored["opt_state"]
