"""Checkpoint/resume: atomic, async, preemption-safe.

The reference pickles ``(step, params, opt_state)`` from a fire-and-forget
thread with no atomicity (``transcription_pretrain_no_voiceprints.py:302-315``
— SURVEY.md §5 flags the race). Here: msgpack serialization (flax), write to
a temp file + atomic rename, single background writer that coalesces saves,
and an optional SIGTERM hook so preempted TPU VMs checkpoint on the way down.
Resume contract matches the reference: load ``(step, params, opt_state)``
if the checkpoint exists, else fresh init.
"""

from __future__ import annotations

import os
import signal
import threading
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(path, step: int, params, opt_state) -> None:
    """Blocking atomic save of (step, params, opt_state)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "step": int(step),
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": serialization.to_state_dict(jax.device_get(opt_state)),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)  # atomic on POSIX


def load_checkpoint(path, params_template, opt_state_template
                    ) -> Optional[Tuple[int, Any, Any]]:
    """Restore (step, params, opt_state) against templates; None if absent."""
    path = Path(path)
    if not path.exists():
        return None
    payload = serialization.msgpack_restore(path.read_bytes())
    params = serialization.from_state_dict(params_template, payload["params"])
    opt_state = serialization.from_state_dict(opt_state_template, payload["opt_state"])
    return int(payload["step"]), params, opt_state


class AsyncCheckpointer:
    """Single background writer; a save issued while one is in flight
    replaces the pending payload (coalescing), so the training loop never
    blocks and writes never interleave."""

    def __init__(self, path, install_sigterm: bool = False):
        self.path = Path(path)
        self._pending = None
        # RLock: the SIGTERM handler runs ON the main thread and may
        # interrupt save() while it holds this lock — a plain Lock would
        # deadlock the process exactly on the preemption path.
        self._cv = threading.Condition(threading.RLock())
        # Serializes the actual file write AND enforces snapshot ordering:
        # flush() (signal path) and the writer thread must never write the
        # same .tmp concurrently, and an older snapshot must never replace
        # a newer one after the fact.
        self._write_lock = threading.Lock()
        self._write_owner = None  # thread currently inside _write
        self._seq = 0
        self._written_seq = 0
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        if install_sigterm:
            try:
                prev = signal.getsignal(signal.SIGTERM)

                def _handler(signum, frame):
                    # Bounded-blocking: if the writer thread holds the
                    # write lock (writing an OLDER snapshot), wait for it
                    # and then write the newest one — unbounded grace is
                    # not guaranteed under preemption, hence the timeout.
                    # flush() itself detects the self-deadlock case (the
                    # handler interrupted a frame on THIS thread that
                    # holds the lock, e.g. close()'s flush) and re-stages
                    # instead of waiting.
                    self.flush(timeout=30.0)
                    if callable(prev):
                        prev(signum, frame)
                    elif prev is not signal.SIG_IGN:
                        # Default disposition: re-deliver so the process
                        # actually terminates (swallowing SIGTERM forces
                        # the supervisor to escalate to SIGKILL, which
                        # would land mid-write on a later checkpoint).
                        signal.signal(signum, signal.SIG_DFL)
                        os.kill(os.getpid(), signum)

                signal.signal(signal.SIGTERM, _handler)
            except ValueError:
                pass  # not the main thread

    def save(self, step: int, params, opt_state) -> None:
        # device_get NOW so the snapshot is consistent even if training
        # mutates (donates) the buffers next step.
        snapshot = (int(step), jax.device_get(params), jax.device_get(opt_state))
        with self._cv:
            self._seq += 1
            self._pending = (self._seq, snapshot)
            self._cv.notify()

    def _write(self, seq: int, payload, blocking: bool = True,
               timeout: float | None = None) -> bool:
        if timeout is not None:
            acquired = self._write_lock.acquire(timeout=timeout)
        else:
            acquired = self._write_lock.acquire(blocking=blocking)
        if not acquired:
            return False  # a write is already in flight (or timed out)
        self._write_owner = threading.current_thread()
        try:
            if seq <= self._written_seq:
                return True  # a newer snapshot already reached disk
            save_checkpoint(self.path, *payload)
            self._written_seq = seq
            return True
        finally:
            self._write_owner = None
            self._write_lock.release()

    def _run(self) -> None:
        while True:
            with self._cv:
                while self._pending is None and not self._stop:
                    self._cv.wait()
                if self._stop and self._pending is None:
                    return
            # Take the write lock BEFORE popping pending: flush() can
            # then rely on "pending is None and the lock is free" =>
            # the newest snapshot is durable (no window where a popped
            # snapshot exists outside both pending and the lock).
            self._write_lock.acquire()
            self._write_owner = threading.current_thread()
            try:
                with self._cv:
                    if self._pending is None:
                        continue  # flush() wrote it meanwhile
                    seq, payload = self._pending
                    self._pending = None
                if seq > self._written_seq:
                    try:
                        save_checkpoint(self.path, *payload)
                        self._written_seq = seq
                    except Exception as e:  # noqa: BLE001
                        # A transient write failure (ENOSPC, I/O) must
                        # not kill the writer thread — that would turn
                        # every later save() into a silent no-op. Warn
                        # and keep consuming; newer snapshots retry.
                        import warnings

                        warnings.warn(
                            f"async checkpoint write failed at seq {seq} "
                            f"({e}); the writer keeps running and newer "
                            "snapshots will retry")
            finally:
                self._write_owner = None
                self._write_lock.release()

    def _restage(self, item) -> None:
        """Put an un-written snapshot back as pending (unless a newer one
        was staged meanwhile) so it is never silently dropped."""
        with self._cv:
            if self._pending is None or self._pending[0] < item[0]:
                self._pending = item
                self._cv.notify()

    def flush(self, blocking: bool = True,
              timeout: float | None = None) -> None:
        """Write any pending snapshot synchronously (signal-safe: never
        interleaves with the writer thread, never regresses to an older
        snapshot). ``timeout`` bounds the wait on an in-flight write (the
        signal-handler path: wait for the writer thread to finish its
        older snapshot, then write the newest). If the lock holder is
        THIS thread — the handler interrupted a frame inside ``_write``
        — waiting would self-deadlock, so the snapshot is re-staged
        instead; likewise on a timeout or a ``blocking=False`` miss."""
        with self._cv:
            item, self._pending = self._pending, None
        if item is None:
            # Nothing staged — but the writer may be MID-WRITE of the
            # newest snapshot (it holds the write lock from before the
            # pop until durability). The SIGTERM path relies on flush()
            # returning only once that write is on disk, so wait
            # (bounded) for the lock instead of returning instantly and
            # letting the handler kill the process mid os.replace.
            if self._write_owner is threading.current_thread():
                return
            if timeout is not None:
                acquired = self._write_lock.acquire(timeout=timeout)
            else:
                acquired = self._write_lock.acquire(blocking=blocking)
            if acquired:
                self._write_lock.release()
            return
        if self._write_owner is threading.current_thread():
            self._restage(item)
            return
        if not self._write(*item, blocking=blocking, timeout=timeout):
            self._restage(item)

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=30)
        self.flush()


def save_train_state(mesh, state, ckpt: Optional["AsyncCheckpointer"]):
    """The multi-host checkpoint contract, in ONE place for all trainers.

    Collective on every process (model-sharded leaves are gathered to
    host through the mesh — see ``parallel.mesh.fetch_to_host``); only
    the coordinator's ``ckpt`` writes (non-coordinators pass None).

    Returns the host copy of ``state.params`` so completion paths
    (weight export in the trainers' ``finally``) can reuse it instead of
    paying a second full cross-host gather of the same tree.
    """
    from yoho_tpu.parallel.mesh import fetch_to_host

    params = fetch_to_host(mesh, state.params)
    opt_state = fetch_to_host(mesh, state.opt_state)
    if ckpt is not None:
        ckpt.save(int(state.step), params, opt_state)
    return params


def save_params(path, params) -> None:
    """Export a params-only artifact (the weights.* session slots)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(jax.device_get(params))
    )
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def load_params(path, template):
    """Restore a params artifact onto a template pytree; None if absent."""
    path = Path(path)
    if not path.exists():
        return None
    return serialization.from_state_dict(
        template, serialization.msgpack_restore(path.read_bytes())
    )
