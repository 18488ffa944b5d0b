"""Driver-contract tests for __graft_entry__.py.

The driver runs ``dryrun_multichip(n)`` in a process where the environment's
default JAX platform is active (here: the single-chip ``axon`` TPU plugin
registered from sitecustomize) — NOT under this test suite's faked 8-device
CPU env.  Round 1 shipped an entry that only worked under conftest's env
(VERDICT.md "Missing #1"), so these tests run the entry in a fresh
subprocess with the conftest overrides stripped.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Strip the device-count flag conftest injects; keep any other flags.
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_self_provisions():
    """dryrun_multichip(8) must succeed without conftest's env mutations,
    even when a backend was already initialized on the default platform."""
    code = (
        "import jax\n"
        # Force backend init under the default platform (tolerate a busy /
        # unreachable chip: the entry must then provision CPU from scratch).
        "try: jax.devices()\n"
        "except RuntimeError: pass\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "assert len(jax.devices()) >= 8, jax.devices()\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "DRYRUN_OK" in proc.stdout


def test_entry_returns_jittable():
    """entry() must yield (fn, args) that jax.jit compiles (CPU lowering
    suffices — the driver compile-checks on its own chip)."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None
