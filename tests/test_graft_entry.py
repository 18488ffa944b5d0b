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
    """dryrun_multichip(8) must succeed without conftest's env mutations —
    and must NOT cold-initialize the default remote-TPU platform: the axon
    relay blocks indefinitely in chip-claim when the chip is held or the
    tunnel is wedged, so probing it would hang the driver check (observed
    live: jax.devices() under a wedged relay never returns)."""
    code = (
        "import jax\n"
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


def test_dryrun_reprovisions_over_live_backend():
    """The round-1 regression, relay-independent: a backend already LIVE
    with too few devices (here: default 1-device CPU) must be cleared and
    re-provisioned to the requested virtual mesh."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()  # live, too small\n"
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
