"""Multi-host distribution: a REAL 2-process JAX cluster on CPU.

The reference never leaves one host (pmap over local GPUs,
``train/stages/transcription_pretrain_no_voiceprints.py:215``); the
framework's multi-host story is ``init_distributed()`` + the same named
mesh. Faked 8-device meshes (conftest) exercise the GSPMD *program* but
not process boundaries — this test spawns two actual processes with 4
CPU devices each, forms the cluster through ``init_distributed``'s
explicit-env contract, and runs a data-parallel grad step whose
collectives cross the process boundary over Gloo (the CPU stand-in for
ICI/DCN). Both processes must see 8 global devices and produce the
reference loss/grads.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(port: int, pid: int) -> dict:
    env = dict(os.environ)
    # The workers size their own device count (4 each); conftest's
    # 8-device force flag must not leak in.
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = str(pid)
    return env


def test_two_process_cluster_runs_dp_grad_step():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER)],
            env=_child_env(port, pid),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "MH_OK" in out, out[-3000:]

    # Replicated outputs must be bit-identical across the cluster.
    losses = {line.split("loss=")[1] for out in outs
              for line in out.splitlines() if "MH_OK" in line}
    assert len(losses) == 1, losses
