"""Continuous batching for greedy serving (slot-based decode; both
model families).

The batched decode programs (``infer/decode.py``) run a whole window
batch to completion: streams that emit EOT after 40 tokens idle until the
batch's slowest stream finishes (up to ``n_text_ctx``), and a request
arriving mid-decode waits for the full batch. Continuous batching fixes
both the TPU-first way: ONE fixed-shape compiled step loop over S slots
where every slot decodes at its OWN position, plus a fixed admission
program that prefills a single slot — freed slots are refilled between
chunks of K tokens, so a new request waits at most K steps and finished
slots never idle.

What makes this possible is vector-position decode plumbing: per-row
``pos`` flows through the positional-embedding gather, the causal cache
mask, the cache scatter (``KVCache.update``), and the timestamp rules
(``whisper_rules``) — all static shapes, still exactly two compiled
programs (admit, chunk) regardless of traffic.

Greedy parity: a window decoded through slots produces the IDENTICAL
token sequence as ``greedy_decode`` (same suppression, timestamp rules,
quality signals) — pinned in tests/test_continuous.py.

Scope: whisper AND yoho families; slot decodes are greedy (no beams).
Speculative draft-verify decoding COMPOSES with the slot engine
(``infer/continuous_spec.py``): with a draft model attached each slot
advances by its own per-round accepted length — unlike the batched
speculative decoder there is no lockstep minimum across streams. The
whisper temperature-fallback ladder IS also supported —
slot decodes are rung 0, and failed windows re-decode at rungs > 0 in
the batcher's assemble step (same `_run_fallback_ladder` as the batched
path, on the submitting caller's thread). Yoho voiceprints and whisper
word timestamps are extracted by the batcher's post-pass, exactly like
the batched path. Admissions batch too (one fixed-shape admit program
encodes + prefills up to S windows per call), so the encoder amortizes
like the batched path; bulk offline throughput can still favor
``Transcriber.transcribe_many`` when every stream decodes the same
length, while continuous mode wins latency and slot utilization under
skewed decode lengths and staggered arrivals. No reference counterpart
(the reference has no serving layer at all — SURVEY.md §1).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(eq=False)
class _Window:
    """One 30 s window in flight."""

    window: np.ndarray  # (n_samples,) f32
    prompt: np.ndarray  # (P,) int32
    done: threading.Event = field(default_factory=threading.Event)
    tokens: Optional[np.ndarray] = None  # (max_len,) on completion
    length: int = 0
    sum_logprob: float = 0.0
    no_speech_prob: float = 0.0
    req: Any = None  # owning _Request (set by ContinuousBatcher)


def make_admit(engine, encode_one, encode_one_d=None):
    """Build the admit program: encode + prefill up to S windows in ONE
    call. Shared by the greedy engine and the speculative engine
    (``continuous_spec.build_spec_programs``) so the no-speech
    convention, slot-placement contract, and first-token/active/sum_lp
    bookkeeping have exactly one implementation.

    windows (S, n_samples) / prompts (S, P): admission batch rows
    (garbage past the valid count — their outputs are discarded).
    fill_row (S,) int32 / fill_valid (S,) bool are SLOT-indexed: slot s
    takes admission row fill_row[s] when fill_valid[s] — a gather +
    select per slot, so there are no scatter collisions and untouched
    slots keep their state. Constant latency for 1..S admissions; the
    encoder runs batched (at small batch it is latency-bound, so one
    admission costs the same call as S — and S admissions cost ONE
    call, not S).

    With ``encode_one_d`` the draft model is encoded + prefilled too and
    the function takes/returns the extended draft state (``d_state`` =
    (d_vars, d_caches, d_ckv); returns with d_caches/d_ckv placed).
    """
    t = engine.t
    init_caches, step = engine._init_caches, engine._step
    P, S = engine.prompt_len, engine.slots
    eot = engine.eot
    ns_id = (t.token_table.no_speech if t.family == "whisper" else None)
    draft = encode_one_d is not None

    def admit(variables, caches, ckv, tokens, pos, active, sum_lp,
              no_speech, windows, prompts, fill_row, fill_valid,
              d_state=None):
        from yoho_tpu.infer.decode import as_f32_logits

        ckv_new = encode_one(variables, windows)
        fresh = init_caches(variables, S)
        logits, fresh = step(variables, prompts, fresh, ckv_new, 0)

        def place(big, new):
            mask = fill_valid.reshape((S,) + (1,) * (big.ndim - 1))
            return jnp.where(mask, new[fill_row].astype(big.dtype), big)

        if draft:
            d_vars, d_caches, d_ckv = d_state
            d_ckv_new = encode_one_d(d_vars, windows)
            d_fresh = engine._init_caches_d(d_vars, S)
            _dl, d_fresh = engine._step_d(d_vars, prompts, d_fresh,
                                          d_ckv_new, 0)
            d_ckv = jax.tree_util.tree_map(place, d_ckv, d_ckv_new)
            d_caches = jax.tree_util.tree_map(place, d_caches, d_fresh)

        last = logits[:, -1]
        # <|nospeech|> mass at the SOT position's output distribution
        # (OpenAI probs_at_sot) — same convention as greedy/beam.
        sot_pos = t._sot_index(P)
        ns_src = last if sot_pos is None else logits[:, sot_pos]
        ns_prob = (jax.nn.softmax(as_f32_logits(ns_src), axis=-1)[:, ns_id]
                   if ns_id is not None else jnp.zeros((S,), jnp.float32))
        # Token rows sized to the engine's workspace width: == max_len
        # for the greedy engine, max_len + stale-write slack in spec mode.
        rows_buf = jnp.full((S, engine.ext), eot, jnp.int32)
        rows_buf = jax.lax.dynamic_update_slice(rows_buf, prompts, (0, 0))
        first, lp0 = engine._pick(last, rows_buf, P)
        rows_buf = rows_buf.at[:, P].set(first)

        ckv = jax.tree_util.tree_map(place, ckv, ckv_new)
        caches = jax.tree_util.tree_map(place, caches, fresh)
        tokens = place(tokens, rows_buf)
        pos = jnp.where(fill_valid, P, pos)
        active = jnp.where(fill_valid, first[fill_row] != eot, active)
        sum_lp = jnp.where(fill_valid, lp0[fill_row], sum_lp)
        no_speech = jnp.where(fill_valid, ns_prob[fill_row], no_speech)
        if draft:
            return (caches, d_caches, ckv, d_ckv, tokens, pos, active,
                    sum_lp, no_speech)
        return caches, ckv, tokens, pos, active, sum_lp, no_speech

    return admit


class ContinuousWhisperDecoder:
    """Slot engine: admit windows into free slots, decode in K-token
    chunks, reap finished slots. Driven by one owner thread
    (:class:`ContinuousBatcher`); not itself thread-safe. Despite the
    historical name it drives BOTH families (whisper and yoho — the
    family-dependent surfaces are resolved at construction)."""

    def __init__(self, transcriber, slots: Optional[int] = None,
                 chunk_tokens: int = 16):
        t = transcriber
        if t.family not in ("whisper", "yoho"):
            raise ValueError(f"unknown family {t.family!r}")
        if t.beams > 1:
            raise ValueError("continuous batching is greedy-only "
                             "(no beams)")
        if t.temperatures and t.temperatures[0] != 0.0:
            # Rung 0 is the slot engine's greedy decode; rungs > 0 are
            # handled by the batcher's assemble step (_run_fallback_ladder).
            raise ValueError("continuous batching decodes rung 0 greedily; "
                             "the temperature ladder must start at 0.0")
        self.t = t
        self.slots = int(slots or t.batch_size)
        self.chunk_tokens = int(chunk_tokens)
        if self.chunk_tokens < 1:
            raise ValueError("chunk_tokens must be >= 1 (0 would decode "
                             "nothing per tick and livelock the worker)")
        if self.slots < 1:
            raise ValueError("need at least one slot")
        self.prompt_len = len(t._prompt_ids())
        self.max_len = t.max_len
        self.eot = t.eot
        # Speculative slots (continuous_spec.py): each slot carries its
        # own draft-verify cursor. ``ext`` adds stale-write workspace past
        # the horizon (verify blocks may scatter up to gamma positions
        # beyond a committing EOT; reap reads only [:max_len]).
        self.draft = t.draft_model is not None
        self.gamma = int(t.speculative_gamma) if self.draft else 0
        if self.draft and self.gamma < 1:
            raise ValueError(f"speculative_gamma must be >= 1, "
                             f"got {t.speculative_gamma}")
        self.ext = self.max_len + (self.gamma + 2 if self.draft else 0)

        model = t.model
        self._rules = None
        if t.family == "whisper" and t.timestamps:
            from yoho_tpu.infer.whisper_rules import make_timestamp_rules

            self._rules = make_timestamp_rules(t.token_table, self.prompt_len)
        self._suppress = t._suppress_ids()
        # Same logit bias (hotwords / logit_bias=) as the offline decode
        # programs — applied before the rules, mirroring pipeline.py.
        self._bias = t._bias_logits_fn()
        # Repetition controls, between bias and timestamp rules — the
        # same order as pipeline._build_decode_fn (per-row pos works:
        # logit_rules broadcasts pos exactly like whisper_rules).
        self._rep = t._repetition_rules_fn(self.prompt_len)

        # Family-dependent model surfaces (mirrors infer/pipeline.py):
        # whisper's init_caches takes the quantized flag and its
        # decode_step returns (logits, caches); yoho's decode_step also
        # returns voiceprint states (extracted post-hoc by the batcher).
        quantize = t.quantized_cross_kv if t.family == "whisper" else False
        # Decode horizon: spec mode needs cache workspace past max_len
        # (stale multi-token writes — see infer/speculative.py).
        horizon = self.ext if self.draft else None

        def make_surfaces(a_model):
            if t.family == "whisper":
                def init_caches(variables, batch):
                    return a_model.apply(variables, batch, t.cache_dtype,
                                         horizon, t.quantized_cache,
                                         method=type(a_model).init_caches)

                def step(variables, toks, caches, ckv, pos):
                    return a_model.apply(variables, toks, caches, ckv, pos,
                                         method=type(a_model).decode_step)
            else:
                def init_caches(variables, batch):
                    return a_model.apply(variables, batch, t.cache_dtype,
                                         horizon,
                                         method=type(a_model).init_caches)

                def step(variables, toks, caches, ckv, pos):
                    logits, _vp, caches = a_model.apply(
                        variables, toks, caches, ckv, pos,
                        method=type(a_model).decode_step)
                    return logits, caches

            def encode_one(variables, window):
                mel = t._features(window)
                xa = a_model.apply(variables, mel,
                                   method=type(a_model).encode_audio)
                if quantize:
                    return a_model.apply(variables, xa, quantize,
                                         method=type(a_model).cross_kvs)
                return a_model.apply(variables, xa,
                                     method=type(a_model).cross_kvs)

            return init_caches, step, encode_one

        self._init_caches, self._step, encode_one = make_surfaces(model)

        def ckv_state(enc, variables):
            b1 = jax.eval_shape(
                enc, variables,
                jax.ShapeDtypeStruct((1, t.chunk_samples), jnp.float32))
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros((self.slots,) + s.shape[1:], s.dtype),
                b1)

        self.ckv = ckv_state(encode_one, t.variables)
        self.caches = self._init_caches(t.variables, self.slots)
        encode_one_d = None
        if self.draft:
            (self._init_caches_d, self._step_d,
             encode_one_d) = make_surfaces(t.draft_model)
            self.d_ckv = ckv_state(encode_one_d, t.draft_variables)
            self.d_caches = self._init_caches_d(t.draft_variables,
                                                self.slots)
        self.tokens = jnp.full((self.slots, self.ext), self.eot,
                               jnp.int32)
        self.pos = jnp.zeros((self.slots,), jnp.int32)
        self.active = jnp.zeros((self.slots,), bool)
        self.sum_lp = jnp.zeros((self.slots,), jnp.float32)
        self.no_speech = jnp.zeros((self.slots,), jnp.float32)

        self._occupied: List[Optional[_Window]] = [None] * self.slots
        if self.draft:
            from yoho_tpu.infer.continuous_spec import build_spec_programs

            self._admit, self._chunk = build_spec_programs(
                self, encode_one, encode_one_d)
        else:
            self._build_programs(encode_one)

    # ------------------------------------------------------------------
    def _pick(self, logits, tokens, pos):
        """Greedy next-token under suppression + timestamp rules; returns
        (next_id, logprob). ``pos`` scalar (admission) or vector (chunk)."""
        from yoho_tpu.infer.decode import _suppress, as_f32_logits

        logits = _suppress(as_f32_logits(logits), self._suppress)
        if self._bias is not None:
            logits = self._bias(logits)
        if self._rep is not None:
            logits = self._rep(logits, tokens, pos)
        if self._rules is not None:
            logits = self._rules(logits, tokens, pos)
        nxt = jnp.argmax(logits, axis=-1)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        return nxt.astype(jnp.int32), lp

    def _build_programs(self, encode_one) -> None:
        t = self.t
        model = t.model
        init_caches, step = self._init_caches, self._step
        P, S, L = self.prompt_len, self.slots, self.max_len
        eot = self.eot

        admit = make_admit(self, encode_one)

        def chunk(variables, caches, ckv, tokens, pos, active, sum_lp):
            """K greedy steps over all slots, each at its own position."""

            def body(_i, state):
                caches, tokens, pos, active, sum_lp = state
                rows = jnp.arange(S)
                cur = tokens[rows, pos][:, None]  # last decided token
                logits, caches = step(variables, cur, caches, ckv, pos)
                nxt, lp = self._pick(logits[:, -1], tokens, pos + 1)
                nxt = jnp.where(active, nxt, eot)
                sum_lp = sum_lp + jnp.where(active, lp, 0.0)
                new_pos = jnp.where(active, pos + 1, pos)
                val = jnp.where(active, nxt, tokens[rows, new_pos])
                tokens = tokens.at[rows, new_pos].set(val)
                active = jnp.logical_and(
                    active, jnp.logical_and(nxt != eot, new_pos + 1 < L))
                return caches, tokens, new_pos, active, sum_lp

            caches, tokens, pos, active, sum_lp = jax.lax.fori_loop(
                0, self.chunk_tokens, body,
                (caches, tokens, pos, active, sum_lp))
            return caches, tokens, pos, active, sum_lp

        self._admit = jax.jit(admit, donate_argnums=(1, 2, 3, 4, 5, 6, 7))
        self._chunk = jax.jit(chunk, donate_argnums=(1, 3, 4, 5, 6))

    # ------------------------------------------------------------------
    def admit(self, win: _Window) -> bool:
        """Place one window into a free slot; False when all slots busy."""
        return self.admit_many([win]) == 1

    def admit_many(self, wins: List[_Window]) -> int:
        """Admit up to ``free_slots`` windows in ONE device call; returns
        how many were taken (the rest stay with the caller)."""
        free = [s for s, w in enumerate(self._occupied) if w is None]
        take = wins[: len(free)]
        if not take:
            return 0
        S = self.slots
        windows = np.zeros((S, self.t.chunk_samples), np.float32)
        prompts = np.zeros((S, self.prompt_len), np.int32)
        prompts[:] = take[0].prompt[None, :]  # valid ids in garbage rows
        fill_row = np.zeros(S, np.int32)
        fill_valid = np.zeros(S, bool)
        for i, win in enumerate(take):
            windows[i] = win.window
            prompts[i] = win.prompt
            fill_row[free[i]] = i
            fill_valid[free[i]] = True
        if self.draft:
            (self.caches, self.d_caches, self.ckv, self.d_ckv, self.tokens,
             self.pos, self.active, self.sum_lp, self.no_speech) = \
                self._admit(
                    self.t.variables, self.t.draft_variables, self.caches,
                    self.d_caches, self.ckv, self.d_ckv, self.tokens,
                    self.pos, self.active, self.sum_lp, self.no_speech,
                    jnp.asarray(windows), jnp.asarray(prompts),
                    jnp.asarray(fill_row), jnp.asarray(fill_valid))
        else:
            (self.caches, self.ckv, self.tokens, self.pos, self.active,
             self.sum_lp, self.no_speech) = self._admit(
                self.t.variables, self.caches, self.ckv, self.tokens,
                self.pos, self.active, self.sum_lp, self.no_speech,
                jnp.asarray(windows), jnp.asarray(prompts),
                jnp.asarray(fill_row), jnp.asarray(fill_valid))
        for i, win in enumerate(take):
            self._occupied[free[i]] = win
        return len(take)

    def step(self) -> List[_Window]:
        """One K-token chunk over every slot; returns reaped windows."""
        if self.draft:
            (self.caches, self.d_caches, self.tokens, self.pos, self.active,
             self.sum_lp) = self._chunk(
                self.t.variables, self.t.draft_variables, self.caches,
                self.d_caches, self.ckv, self.d_ckv, self.tokens, self.pos,
                self.active, self.sum_lp)
        else:
            (self.caches, self.tokens, self.pos, self.active,
             self.sum_lp) = self._chunk(
                self.t.variables, self.caches, self.ckv, self.tokens,
                self.pos, self.active, self.sum_lp)
        return self.reap()

    def reap(self) -> List[_Window]:
        """Collect finished slots (occupied but no longer active)."""
        active = np.asarray(self.active)
        done: List[_Window] = []
        dirty = [s for s, w in enumerate(self._occupied)
                 if w is not None and not active[s]]
        if not dirty:
            return done
        tokens = np.asarray(self.tokens)
        sum_lp = np.asarray(self.sum_lp)
        no_speech = np.asarray(self.no_speech)
        P = self.prompt_len
        for s in dirty:
            win = self._occupied[s]
            self._occupied[s] = None
            # Spec mode keeps stale-write workspace past max_len — the
            # committed stream (and greedy parity) lives in [:max_len].
            row = tokens[s][: self.max_len]
            is_eot = row[P:] == self.eot
            length = (P + int(np.argmax(is_eot)) + 1 if is_eot.any()
                      else self.max_len)
            win.tokens = row
            win.length = length
            win.sum_logprob = float(sum_lp[s])
            win.no_speech_prob = float(no_speech[s])
            done.append(win)
        return done

    def release(self, pred) -> int:
        """Free every occupied slot whose window matches ``pred`` without
        reaping its tokens (request cancellation): the slot goes inactive
        on device — it stops advancing in :meth:`step` and is refillable
        by the next :meth:`admit_many` — and the window is discarded."""
        idx = [s for s, w in enumerate(self._occupied)
               if w is not None and pred(w)]
        if not idx:
            return 0
        self.active = self.active.at[jnp.asarray(np.asarray(idx))].set(False)
        for s in idx:
            self._occupied[s] = None
        return len(idx)

    @property
    def busy(self) -> bool:
        return any(w is not None for w in self._occupied)

    @property
    def free_slots(self) -> int:
        return sum(w is None for w in self._occupied)


@dataclass(eq=False)
class _Request:
    audio: Any
    sample_rate: Optional[int]
    language: Optional[str]
    vad: Optional[bool] = None
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[BaseException] = None
    windows: List[_Window] = field(default_factory=list)
    starts: List[int] = field(default_factory=list)
    vmap: Any = None
    original: Any = None
    lang: Optional[str] = None
    lang_prob: Optional[float] = None  # softmax prob when auto-detected
    remaining: int = 0
    cancelled: bool = False


class ContinuousBatcher:
    """Drop-in for :class:`yoho_tpu.infer.batching.MicroBatcher` backed by
    the slot engine: requests' windows are admitted into freed decode
    slots between K-token chunks instead of waiting for whole-batch
    completion. Callers block in :meth:`submit`; one worker thread owns
    the engine (JAX dispatch stays single-threaded)."""

    def __init__(self, transcriber, max_batch: Optional[int] = None,
                 max_wait_ms: float = 0.0, chunk_tokens: int = 16,
                 max_pending: Optional[int] = None):
        del max_wait_ms  # admission happens between chunks; no wait knob
        self.t = transcriber
        self.engine = ContinuousWhisperDecoder(
            transcriber, slots=max_batch, chunk_tokens=chunk_tokens)
        self.max_pending = max_pending
        self._queue: List[_Request] = []  # requests awaiting windowing
        self._window_queue: List[_Window] = []
        self._cv = threading.Condition()
        self._closed = False
        self.requests_served = 0
        self.requests_failed = 0
        self.requests_rejected = 0
        self.requests_cancelled = 0
        self.inflight = 0
        self.batches_dispatched = 0  # chunk count (statz compatibility)
        self._latencies = deque(maxlen=512)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(self, audio, sample_rate: Optional[int] = None,
               language: Optional[str] = None,
               vad: Optional[bool] = None,
               prompt: Optional[str] = None,
               temperature: Optional[float] = None,
               cancelled: Optional[Callable[[], bool]] = None):
        """``language``/``vad``/``cancelled`` are per-request overrides
        (same contract as :meth:`MicroBatcher.submit`). A cancelled
        request's queued windows are dropped and its occupied slots are
        RELEASED at the next chunk boundary — the big win over the
        micro-batcher, where a dispatched batch runs to completion.

        ``prompt``/``temperature`` are NOT supported here: the slot
        engine's two compiled programs bake the prompt length and the
        temperature ladder — use the micro-batching engine for those."""
        from yoho_tpu.infer.batching import RequestCancelled, ServerOverloaded

        if prompt is not None or temperature is not None:
            raise ValueError(
                "per-request prompt/temperature need the micro-batching "
                "engine (drop --continuous): the slot engine's compiled "
                "programs bake the prompt shape and temperature ladder")

        req = _Request(audio, sample_rate, language, vad)
        t0 = time.monotonic()
        with self._cv:
            if self._closed:
                raise RuntimeError("ContinuousBatcher is closed")
            if (self.max_pending is not None
                    and self.inflight >= self.max_pending):
                self.requests_rejected += 1
                raise ServerOverloaded(
                    f"{self.inflight} requests in flight >= max_pending "
                    f"{self.max_pending}")
            self.inflight += 1
            self._queue.append(req)
            self._cv.notify()
        if cancelled is None:
            req.done.wait()
        else:
            while not req.done.wait(timeout=0.25):
                if cancelled():
                    with self._cv:
                        req.cancelled = True
                        self._cv.notify()  # worker frees queued work/slots
                    raise RequestCancelled("client went away")
        if req.error is not None:
            raise req.error
        # Assembly (per-window parsing, yoho voiceprint post-pass, stitch,
        # diarization) runs HERE on the submitting caller's thread — the
        # worker thread only dispatches admit/chunk programs, so a
        # completing request never stalls other slots' decode cadence.
        self._assemble(req)
        self._latencies.append(time.monotonic() - t0)
        return req.result

    def stats(self) -> dict:
        from yoho_tpu.infer.batching import _percentiles

        with self._cv:
            d = {
                "requests_served": self.requests_served,
                "requests_failed": self.requests_failed,
                "requests_rejected": self.requests_rejected,
                "requests_cancelled": self.requests_cancelled,
                "batches_dispatched": self.batches_dispatched,
                "inflight": self.inflight,
                "queue_depth": len(self._queue) + len(self._window_queue),
                "active_slots": self.engine.slots - self.engine.free_slots,
            }
            d.update(_percentiles(list(self._latencies)))
        return d

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=10)

    # ------------------------------------------------------------------
    def _prepare(self, req: _Request) -> None:
        """Host-side request prep: resample, VAD, language, windowing."""
        from yoho_tpu.infer.longform import chunk_audio

        t = self.t
        audio = t._prepare_audio(req.audio, req.sample_rate)
        req.original = audio
        audio, req.vmap = t._apply_vad(audio, req.vad)
        if len(audio) == 0:
            req.lang = req.language or t.language
            req.remaining = 0
            return
        if req.language is not None:
            req.lang = req.language
        elif t.language is not None or t.family != "whisper":
            req.lang = t.language
        else:
            (req.lang,), (req.lang_prob,) = t.detect_language_many(
                [audio], return_probs=True)
        prompt = np.asarray(t._prompt_ids(req.lang), np.int32)
        windows, starts = chunk_audio(audio, t.chunk_samples,
                                      t.stride_samples)
        req.starts = list(starts)
        req.windows = [_Window(w, prompt, req=req) for w in windows]
        req.remaining = len(req.windows)

    def _assemble(self, req: _Request) -> None:
        """All windows decoded -> TranscriptionResult. Per-window parsing
        and quality here; the request-level tail (stitch, remap,
        diarization, text) is Transcriber._finalize_request — SHARED with
        transcribe_many so the two paths cannot drift."""
        t = self.t
        per_window = []
        n = len(req.windows)
        if n:
            lengths = np.asarray([w.length for w in req.windows])
            aux = {
                "sum_logprob": np.asarray([w.sum_logprob
                                           for w in req.windows]),
                "no_speech_prob": np.asarray([w.no_speech_prob
                                              for w in req.windows]),
                "used_temperature": np.zeros(n, np.float32),
            }
            # One mel computation per S-window group, shared between the
            # fallback ladder and the teacher-forced post-passes (both
            # group windows identically; keyed by group start index).
            mel_cache: dict = {}
            if t.family == "whisper" and len(t.temperatures) > 1:
                lengths = self._fallback_retry(req, lengths, aux, mel_cache)
            silent = t._silent_mask(lengths, aux)
            segs = [[] if silent[j] else
                    t._tokens_to_segments(req.windows[j].tokens,
                                          int(lengths[j]))
                    for j in range(n)]
            t._attach_quality(segs, lengths, aux)
            if t.family == "yoho":
                self._post_pass(req, lambda mel, tok, sl: t._attach_voiceprints(
                    mel, tok, segs[sl], lengths[sl]), mel_cache)
            if t.word_timestamps and (
                    t.family == "yoho"
                    or t.token_table.text_backend is not None):
                self._post_pass(req, lambda mel, tok, sl: t._attach_words(
                    mel, tok, lengths[sl], segs[sl]), mel_cache)
            per_window = segs
        req.result = t._finalize_request(per_window, req.starts, req.vmap,
                                         req.original, req.lang,
                                         language_probability=req.lang_prob)

    def _group_mel(self, group, start: int, mel_cache: dict):
        """Features for one pad-to-slot-count window group, computed at
        most once per request (``mel_cache`` is keyed by the group's
        start index and shared by the fallback ladder and post-passes)."""
        if start in mel_cache:
            return mel_cache[start]
        t = self.t
        windows = np.zeros((self.engine.slots, t.chunk_samples), np.float32)
        for j, w in enumerate(group):
            windows[j] = w.window
        # _to_device (not a bare jnp.asarray) so the batch follows the
        # mesh sharding every other entry point applies.
        mel = t._features(t._to_device(windows))
        mel_cache[start] = mel
        return mel

    def _post_pass(self, req: _Request, fn, mel_cache: dict) -> None:
        """Run a teacher-forced post-pass (yoho voiceprint extraction /
        whisper word-timestamp alignment — the batched path does these
        inside transcribe_many; here windows arrive from slots) over the
        request's windows in groups PADDED to the slot count, so ONE
        compiled program serves every request size. ``fn(mel, tokens,
        slice)`` receives the padded (S, ...) device batch and the
        request-relative window slice it covers."""
        S = self.engine.slots
        n = len(req.windows)
        for i in range(0, n, S):
            group = req.windows[i : i + S]
            tokens = np.full((S, self.engine.max_len), self.engine.eot,
                             np.int32)
            for j, w in enumerate(group):
                tokens[j] = w.tokens
            mel = self._group_mel(group, i, mel_cache)
            fn(mel, tokens, slice(i, i + len(group)))

    def _fallback_retry(self, req: _Request, lengths: np.ndarray, aux,
                        mel_cache: dict):
        """Whisper temperature-ladder parity: slot decodes ARE rung 0
        (greedy); windows failing the quality thresholds re-decode at
        rungs > 0 through the SAME `_run_fallback_ladder` the batched
        path uses, over groups padded to the slot count. Runs on the
        submitting caller's thread — retries never stall the engine.
        Returns the (possibly updated) lengths array; tokens and aux are
        updated in place (windows' `.tokens` included)."""
        t = self.t
        S = self.engine.slots
        n = len(req.windows)
        for i in range(0, n, S):
            group = req.windows[i : i + S]
            k = len(group)
            tokens = np.full((S, self.engine.max_len), self.engine.eot,
                             np.int32)
            # Padding rows carry length == prompt_len: zero generated
            # tokens, avg logprob 0, empty text — never retried.
            lens = np.full((S,), group[0].prompt.shape[0], np.int32)
            gaux = {
                "sum_logprob": np.zeros((S,), np.float32),
                "no_speech_prob": np.zeros((S,), np.float32),
                "used_temperature": np.zeros((S,), np.float32),
            }
            prompt = np.zeros((S, group[0].prompt.shape[0]), np.int32)
            for j, w in enumerate(group):
                tokens[j] = w.tokens
                lens[j] = lengths[i + j]
                prompt[j] = w.prompt
                for key in ("sum_logprob", "no_speech_prob"):
                    gaux[key][j] = aux[key][i + j]

            def make_mel(ws=group, start=i):
                # Lazy (only computed when a window actually re-decodes)
                # and cached for the post-passes that follow.
                return self._group_mel(ws, start, mel_cache)

            t._run_fallback_ladder(S, make_mel, prompt, tokens, lens, gaux)

            for j, w in enumerate(group):
                w.tokens = tokens[j]
                lengths[i + j] = lens[j]
                for key in ("sum_logprob", "no_speech_prob",
                            "used_temperature"):
                    aux[key][i + j] = gaux[key][j]
        return lengths

    def _finish(self, req: _Request, error: Optional[BaseException] = None,
                cancelled: bool = False):
        """Mark decode-complete and wake the submitter. Assembly happens
        in :meth:`submit` on the caller's thread (NOT here on the worker)
        so a completing request's post-pass device work cannot stall the
        chunk cadence of still-active slots."""
        if req.done.is_set():
            return  # e.g. cancelled while its last window also completed
        req.error = error
        with self._cv:
            self.inflight -= 1
            # req.cancelled covers the race where the client vanished
            # during the very chunk that completed its last window: the
            # worker reaches the normal completion path before
            # _sweep_cancelled runs, but nobody received the result, so
            # it must not count as served.
            if cancelled or req.cancelled:
                self.requests_cancelled += 1
            elif error is not None:
                # An errored request is not served (same contract as the
                # micro-batcher's requests_failed).
                self.requests_failed += 1
            else:
                self.requests_served += 1
        req.done.set()

    def _sweep_cancelled(self) -> None:
        """Drop cancelled requests' queued windows and free their decode
        slots (they stop costing chunk work at the next boundary). Runs
        on the worker thread between device calls."""
        gone = [w.req for w in self._window_queue
                if w.req is not None and w.req.cancelled]
        gone += [w.req for w in self.engine._occupied
                 if w is not None and w.req is not None and w.req.cancelled]
        if not gone:
            return
        self._window_queue = [w for w in self._window_queue
                              if not (w.req is not None and w.req.cancelled)]
        self.engine.release(lambda w: w.req is not None and w.req.cancelled)
        from yoho_tpu.infer.batching import RequestCancelled

        for req in {id(r): r for r in gone}.values():
            self._finish(req, RequestCancelled("client went away"),
                         cancelled=True)

    def _fail_inflight(self, error: BaseException) -> None:
        """Deliver ``error`` to every request with device work in flight
        and reset the engine's slot bookkeeping (the next admissions
        rewrite per-slot device state from scratch)."""
        reqs = {id(w.req): w.req for w in self._window_queue if w.req}
        for w in self.engine._occupied:
            if w is not None and w.req is not None:
                reqs[id(w.req)] = w.req
        self._window_queue.clear()
        self.engine._occupied = [None] * self.engine.slots
        import jax.numpy as _jnp

        self.engine.active = _jnp.zeros((self.engine.slots,), bool)
        for req in reqs.values():
            self._finish(req, error)

    def _run(self) -> None:
        engine = self.engine
        while True:
            with self._cv:
                while (not self._queue and not self._window_queue
                       and not engine.busy and not self._closed):
                    self._cv.wait()
                if (self._closed and not self._queue
                        and not self._window_queue and not engine.busy):
                    return
                incoming, self._queue = self._queue, []

            for req in incoming:
                if req.cancelled:
                    self._finish(req, None, cancelled=True)
                    continue
                try:
                    self._prepare(req)
                except BaseException as e:  # noqa: BLE001
                    self._finish(req, e)
                    continue
                if req.remaining == 0:
                    self._finish(req)
                else:
                    self._window_queue.extend(req.windows)

            self._sweep_cancelled()

            # Device work is guarded: an engine exception (device OOM,
            # relay RPC failure, ...) must fail the in-flight requests
            # loudly, never kill the worker and hang every submitter.
            try:
                done: List[_Window] = []
                # Admit queued windows into free slots — ONE batched
                # device call regardless of how many slots freed.
                if self._window_queue and engine.free_slots:
                    n_took = engine.admit_many(self._window_queue)
                    del self._window_queue[:n_took]
                    # Windows silent at admission (first token == EOT)
                    # finish without waiting a whole chunk.
                    done += engine.reap()
                if engine.busy:
                    self.batches_dispatched += 1
                    done += engine.step()
            except BaseException as e:  # noqa: BLE001 — fail in-flight reqs
                self._fail_inflight(e)
                continue
            for win in done:
                req = win.req
                req.remaining -= 1
                if req.remaining == 0:
                    self._finish(req)
