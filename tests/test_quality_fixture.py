"""Held-out WER sensitivity of the approximation lanes (VERDICT r4 #2).

The committed ``whisper_quality`` fixture is a micro-whisper trained on
tone-word sentences and evaluated on 40 HELD-OUT sentences with noise
tuned so bf16 WER is genuinely non-zero — decode decisions sit near
boundaries, so an approximation lane that moves logits can move words.
Each lane's WER is re-measured here (CPU, fixed eval seed — byte-
identical audio to the builder) and pinned to the recorded golden:
a regression in any approximation path now shows up as a WER delta on a
non-overfit task instead of vanishing inside an overfit fixture's
margin. Builder: experiments/build_quality_fixture.py.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.eval.wer import wer
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.whisper_tokens import WhisperTokenTable
from yoho_tpu.train.checkpoint import load_params

FIX = Path(__file__).parent / "fixtures" / "whisper_quality"


class WordBackend:
    def __init__(self, word_ids):
        self.word_ids = {k: int(v) for k, v in word_ids.items()}
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


def synth(sentence, words, base_hz, word_sec, rng, noise, n_samples):
    """Mirror of build_quality_fixture.synth (kept in sync by the
    recorded-WER pins below: any drift changes every lane's WER)."""
    audio = (noise * rng.standard_normal(n_samples)).astype(np.float32)
    sr = 16000
    t = np.arange(int(word_sec * sr)) / sr
    pos = int(0.05 * sr)
    for w in sentence.split():
        i = words.index(w)
        ph = rng.uniform(0, 2 * np.pi, 2)
        tone = (0.22 * np.sin(2 * np.pi * base_hz[i] * t + ph[0])
                + 0.08 * np.sin(2 * np.pi * 2.01 * base_hz[i] * t + ph[1]))
        env = np.minimum(1.0, np.minimum(np.arange(len(t)),
                                         len(t) - np.arange(len(t))) / 240.0)
        audio[pos:pos + len(t)] += (tone * env).astype(np.float32)
        pos += len(t)
    return audio


@pytest.fixture(scope="module")
def quality():
    spec = json.loads((FIX / "spec.json").read_text())
    cfg = WhisperConfig(**json.loads((FIX / "config.json").read_text()))
    table = WhisperTokenTable(multilingual=True,
                              text_backend=WordBackend(spec["word_ids"]))
    template = jax.eval_shape(
        Whisper(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), template)
    params = load_params(FIX / "params.msgpack", template)
    rng = np.random.default_rng(spec["eval_seed"])
    audio = [synth(s, spec["words"], spec["base_hz"], spec["word_sec"],
                   rng, spec["noise"], cfg.n_samples)
             for s in spec["eval_sentences"]]
    return spec, cfg, table, {"params": params}, audio


def _lane_wer(name, spec, cfg, table, variables, audio):
    from yoho_tpu.nn.quantize import (quantize_whisper_decoder,
                                      quantize_whisper_encoder)

    mkw, vars_, tkw = {}, variables, {}
    if name == "int8-kv":
        tkw = dict(quantized_cross_kv="int8", quantized_cache=True)
    elif name == "int4-kv":
        tkw = dict(quantized_cross_kv="int4", quantized_cache=True)
    elif name == "int8-weights":
        mkw = dict(weights_int8=True)
        vars_ = quantize_whisper_decoder(variables)
        tkw = dict(quantized_cross_kv="int8", quantized_cache=True)
    elif name == "int8-encoder":
        mkw = dict(encoder_int8=True)
        vars_ = quantize_whisper_encoder(variables)
        tkw = dict(quantized_cross_kv="int8", quantized_cache=True)
    elif name == "fast-gelu":
        mkw = dict(fast_gelu=True)
        tkw = dict(quantized_cross_kv="int8", quantized_cache=True)
    t = Transcriber(Whisper(cfg, dtype=jnp.bfloat16, **mkw), vars_,
                    family="whisper", token_table=table, batch_size=8,
                    timestamps=False, **tkw)
    hyps = [r.text for r in t.transcribe_many(audio)]
    rate, _ = wer(spec["eval_sentences"], hyps, normalize=False)
    return float(rate)


def test_bf16_wer_is_measurable(quality):
    """The fixture is non-vacuous: bf16 errs on held-out data (so lane
    deltas CAN move) but still largely generalizes."""
    spec, *_ = quality
    assert 0.0 < spec["wer"]["bf16"] < 0.4


@pytest.mark.parametrize("lane", ["bf16", "int8-kv", "int4-kv",
                                  "int8-weights", "int8-encoder",
                                  "fast-gelu"])
def test_lane_wer_matches_recorded(quality, lane):
    """Each approximation lane's held-out WER equals the recorded golden
    (deterministic decode, fixed eval audio). PERFORMANCE.md's quality
    table quotes exactly these numbers."""
    spec, cfg, table, variables, audio = quality
    got = _lane_wer(lane, spec, cfg, table, variables, audio)
    # abs=1e-4: the recorded goldens are rounded to 4 decimals; the
    # decode itself is deterministic.
    assert got == pytest.approx(spec["wer"][lane], abs=1e-4), lane


def test_lane_deltas_are_small(quality):
    """Every approximation lane stays within a few points of bf16 on the
    held-out set. Note the honest finding this fixture surfaced: int8
    cross-KV — transcript-exact on every overfit fixture — is NOT
    guaranteed argmax-identical once decisions sit near boundaries (the
    quantization error can flip a near-tie), so its delta is pinned like
    the other lanes instead of asserted zero."""
    spec, *_ = quality
    for lane, rate in spec["wer"].items():
        assert abs(rate - spec["wer"]["bf16"]) <= 0.06, (lane, rate)


def test_spec_slots_exact_and_alpha_on_trained_pair(quality):
    """Speculative slots with the GENUINELY smaller trained draft
    (half-width, half-depth, worse held-out WER) stay token-exact vs
    greedy, and the measured per-round acceptance alpha is substantial —
    the empirical anchor for the spec-continuous projection
    (PERFORMANCE.md 'Measured with a genuinely smaller trained draft')."""
    spec, cfg, table, variables, audio = quality
    dcfg = WhisperConfig(
        **json.loads((FIX / "draft_config.json").read_text()))
    template = jax.eval_shape(
        Whisper(dcfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, dcfg.n_frames, dcfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), template)
    d_vars = {"params": load_params(FIX / "draft_params.msgpack", template)}
    target = Whisper(cfg, dtype=jnp.bfloat16)
    draft = Whisper(dcfg, dtype=jnp.bfloat16)

    kw = dict(family="whisper", token_table=table, batch_size=4,
              timestamps=False)
    clips = audio[:6]
    want = Transcriber(target, variables, **kw).transcribe_many(clips)

    from yoho_tpu.infer.continuous import ContinuousBatcher

    spec_t = Transcriber(target, variables, draft_model=draft,
                         draft_variables=d_vars, speculative_gamma=2, **kw)
    b = ContinuousBatcher(spec_t, max_batch=4, chunk_tokens=6)
    try:
        got = [b.submit(c) for c in clips]
    finally:
        b.close()
    for w, g_res in zip(want, got):
        assert [s.tokens for s in w.segments] == \
               [s.tokens for s in g_res.segments]

    # alpha from per-chunk cursor advances (1 round per chunk).
    from yoho_tpu.infer.slot_engine import SlotEngine, _Window

    eng = SlotEngine(spec_t, slots=4, chunk_tokens=3)  # gamma+1
    prompt = np.asarray(spec_t._prompt_ids(), np.int32)
    todo = [_Window(np.pad(c[: spec_t.chunk_samples],
                           (0, max(0, spec_t.chunk_samples - len(c)))),
                    prompt) for c in clips]
    committed = rounds = 0
    while todo or eng.busy:
        if todo and eng.free_slots:
            n = eng.admit_many(todo)
            del todo[:n]
        before = np.asarray(eng.pos).copy()
        active = np.asarray(eng.active).copy()
        eng.step()
        committed += int(np.sum((np.asarray(eng.pos) - before)[active]))
        rounds += int(np.sum(active))
    alpha = (committed / max(1, rounds) - 1) / 2  # gamma = 2
    assert alpha > 0.2, alpha  # a same-corpus draft accepts substantially
