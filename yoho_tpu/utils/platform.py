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
    if plat:
        import jax

        try:
            if jax.config.jax_platforms != plat:
                jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    if os.environ.get("YOHO_COMPILE_CACHE"):
        enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across process restarts (OPT-IN).

    Big jits (the serving decode program, the training step) take minutes
    to compile on a cold TPU process; a disk cache makes restarts pay
    only a hash lookup. Enable with env ``YOHO_COMPILE_CACHE=1`` (default
    path ``~/.cache/yoho_tpu/xla``) or ``YOHO_COMPILE_CACHE=/dir``, or
    call this directly. Deliberately NOT on by default: setting the cache
    dir makes jax enumerate every registered platform at first compile
    (plugin backends initialize eagerly), which a pure-CPU run should
    never pay. Applies to standard local-compile platforms (tpu/gpu/cpu);
    remote-compile relays (e.g. the experimental ``axon`` tunnel, which
    compiles server-side) bypass the local cache — measured: zero cache
    entries written there.
    """
    env = os.environ.get("YOHO_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return
    # Case-insensitive truthy check (YOHO_COMPILE_CACHE=TRUE must not
    # become a literal cache directory named "TRUE").
    cache_dir = path or (env if env.lower() not in ("", "1", "true", "on")
                         else "") or os.path.join(
        os.path.expanduser("~"), ".cache", "yoho_tpu", "xla")
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes meaningful time, not only >1 min.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only home: run uncached
