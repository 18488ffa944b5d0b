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

import datetime as dt
import os
import socket
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("_multihost_worker.py")
TRAIN_WORKER = Path(__file__).with_name("_multihost_train_worker.py")


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
    # The workers must import yoho_tpu even from a source checkout
    # without an editable install (pytest itself gets the repo root via
    # the invocation CWD; a bare subprocess does not).
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p)
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


def _write_wav(path, data, sr=16000):
    pcm = np.clip(data * 32768, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def mh_corpus(tmp_path_factory):
    """Synthetic SRT+WAV corpus on a path both worker processes share
    (a pod's shared filesystem in miniature)."""
    from yoho_tpu.text.srt import Subtitle, compose_srt

    sentences = [
        "hello there friend", "this is a test", "the quick brown fox",
        "we are training a model", "speech goes in text comes out",
        "one more utterance here",
    ]
    root = tmp_path_factory.mktemp("mh_corpus")
    g = np.random.default_rng(0)
    for d in ("noisy", "clean", "finetune", "ambient", "speakers"):
        (root / d / "transcripts").mkdir(parents=True)
        (root / d / "audio").mkdir(parents=True)
    for f in range(3):
        subs, t = [], 0.1
        audio = g.standard_normal(int(16000 * 2.5)).astype(np.float32) * 0.01
        for u in range(4):
            start, end = t, t + 0.2
            tone = 0.3 * np.sin(2 * np.pi * (300 + 100 * u) *
                                np.arange(int(0.2 * 16000)) / 16000)
            audio[int(start * 16000): int(start * 16000) + len(tone)] += tone
            subs.append(Subtitle(u + 1, dt.timedelta(seconds=start),
                                 dt.timedelta(seconds=end),
                                 sentences[(f + u) % len(sentences)]))
            t = end + 0.3
        (root / "noisy" / "transcripts" / f"track{f}.srt").write_text(
            compose_srt(subs))
        _write_wav(root / "noisy" / "audio" / f"track{f}.wav", audio)
    return root


def test_two_process_cluster_trains_a_session(mh_corpus, tmp_path):
    """Full ASRTrainer stage-1 run across a real 2-process cluster:
    disjoint data shards, global batches from local rows, collective
    validation + checkpointing, coordinator-only artifacts."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = _child_env(port, pid)
        env["YOHO_MH_CORPUS"] = str(mh_corpus)
        env["YOHO_MH_SESSIONS"] = str(tmp_path / "sessions")
        procs.append(subprocess.Popen(
            [sys.executable, str(TRAIN_WORKER)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "MH_TRAIN_OK" in out, out[-4000:]
        assert "MH_RESUME_OK" in out, out[-4000:]
        assert "MH_STAGE2_OK" in out, out[-4000:]

    # The two processes' epoch shards are disjoint and cover the corpus.
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MH_SHARD"):
                _tag, pid, rest = line.split(" ", 2)
                shards[int(pid)] = set(eval(rest))  # noqa: S307 — own output
    assert set(shards) == {0, 1}
    assert not (shards[0] & shards[1])
    assert len(shards[0] | shards[1]) == len(shards[0]) + len(shards[1])

    # Training advanced the (replicated) step count identically.
    steps = {line.split("step=")[1].split()[0] for out in outs
             for line in out.splitlines() if "MH_TRAIN_OK" in line}
    assert steps == {"2"}, steps
