"""Runtime platform helpers.

Some environments pre-import jax from sitecustomize (e.g. a TPU plugin
registration), which snapshots ``JAX_PLATFORMS`` before user code runs —
setting the env var afterwards silently does nothing. CLI entry points call
:func:`apply_platform_env` so ``JAX_PLATFORMS=cpu python -m yoho_tpu...``
always means what it says.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass
