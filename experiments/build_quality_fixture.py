"""Build the NON-overfit micro-whisper quality fixture (held-out WER).

VERDICT r4 missing #2: every approximation lane (int8 weights, int4
cross-KV, int8 encoder, fast-gelu) was pinned "transcript-exact" on
OVERFIT fixtures whose margins made exactness vacuous — no lane had a
measurable sensitivity number. This builds a fixture where bf16 WER is
genuinely non-zero on HELD-OUT data, so each lane's WER delta is a real
measurement instead of 0-by-construction.

Recipe (no network; synthetic but non-degenerate):
  * a 12-word vocabulary, each word a fixed 0.30 s tone chord
    (fundamental + harmonic, per-utterance random phase);
  * sentences = 3..6-word sequences; TRAIN on 160 random sentences,
    EVALUATE on 40 sentences never seen in training (word-sequence
    generalization, not memorization);
  * evaluation audio carries noise at an SNR chosen so the trained
    model errs on a few percent of held-out words — decisions sit near
    boundaries, where approximation lanes can actually move them.

Writes tests/fixtures/whisper_quality/ (params + corpus spec + measured
WERs) and prints the PERFORMANCE.md quality table. The committed test
(tests/test_quality_fixture.py) re-decodes the held-out set per lane on
CPU and pins each WER to the recorded golden.

Usage: python experiments/build_quality_fixture.py
"""

import json
import os
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # goldens must match the test env

import jax.numpy as jnp
import optax

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "whisper_quality"

WORDS = ["red", "green", "blue", "gold", "north", "south", "east", "west",
         "one", "two", "three", "four"]
WORD_IDS = {w: 1000 + i for i, w in enumerate(WORDS)}
BASE_HZ = [380 + 140 * i for i in range(len(WORDS))]
WORD_SEC = 0.30
SR = 16000
NOISE = 0.22  # eval-time noise amplitude (tone amplitude 0.30)

CFG = dict(n_mels=80, n_audio_ctx=128, n_audio_state=64, n_audio_head=4,
           n_audio_layer=2, n_vocab=51865, n_text_ctx=16, n_text_state=64,
           n_text_head=4, n_text_layer=2, chunk_seconds=2.56)

# Enough TRAIN sentences that the decoder cannot memorize sequences and
# must read the audio: with 160 sentences the first run's model emitted
# correct 2-3 word prefixes then drifted into remembered continuations
# (held-out WER 0.55 at every noise level, train WER ~0).
N_TRAIN, N_EVAL = 3000, 40
STEPS, BATCH, LR = 2000, 32, 2e-3


class WordBackend:
    """Whitespace word-id codec (fixture-only text backend)."""

    def __init__(self, word_ids):
        self.word_ids = dict(word_ids)
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


def make_sentences(rng, n, taken=None):
    """Random 3-6 word sentences, distinct from each other and `taken`."""
    taken = set(taken or ())
    out = []
    while len(out) < n:
        k = int(rng.integers(3, 7))
        s = " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), k))
        if s not in taken:
            taken.add(s)
            out.append(s)
    return out


def synth(sentence, rng, noise, n_samples):
    """Tone-chord audio for a word sequence + white noise."""
    audio = (noise * rng.standard_normal(n_samples)).astype(np.float32)
    t = np.arange(int(WORD_SEC * SR)) / SR
    pos = int(0.05 * SR)
    for w in sentence.split():
        i = WORDS.index(w)
        ph = rng.uniform(0, 2 * np.pi, 2)
        tone = (0.22 * np.sin(2 * np.pi * BASE_HZ[i] * t + ph[0])
                + 0.08 * np.sin(2 * np.pi * 2.01 * BASE_HZ[i] * t + ph[1]))
        env = np.minimum(1.0, np.minimum(np.arange(len(t)),
                                         len(t) - np.arange(len(t))) / 240.0)
        audio[pos:pos + len(t)] += (tone * env).astype(np.float32)
        pos += len(t)
    return audio


def main() -> None:
    from yoho_tpu.audio.frontend import whisper_log_mel

    cfg = WhisperConfig(**CFG)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=WordBackend(WORD_IDS))
    model = Whisper(cfg)  # f32 for training

    rng = np.random.default_rng(0)
    train_sents = make_sentences(rng, N_TRAIN)
    eval_sents = make_sentences(rng, N_EVAL, taken=train_sents)

    prompt = table.sot_sequence("en", "transcribe", timestamps=False)
    P = len(prompt)
    T = cfg.n_text_ctx

    def encode_batch(sents):
        tok = np.full((len(sents), T), table.eot, np.int32)
        mask = np.zeros((len(sents), T), np.float32)
        for i, s in enumerate(sents):
            ids = prompt + table.encode_text(s) + [table.eot]
            tok[i, :len(ids)] = ids
            mask[i, P:len(ids)] = 1.0
        return tok, mask

    if (os.environ.get("REUSE_PARAMS")
            and (FIXTURE / "params.msgpack").exists()):
        # Iterating on the EVAL side (noise band, lane list) without
        # paying the ~35 min CPU retrain.
        from yoho_tpu.train.checkpoint import load_params

        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
            jnp.zeros((1, 4), jnp.int32))["params"]
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if jnp.issubdtype(s.dtype, jnp.floating)
                                else s.dtype), template)
        params = load_params(FIXTURE / "params.msgpack", template)
        return finish(cfg, table, params, eval_sents)

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))

    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, LR, 100, STEPS), weight_decay=1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, mel, tok, mask):
        def loss_fn(params):
            logits = model.apply({"params": params}, mel, jnp.asarray(tok))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], jnp.asarray(tok)[:, 1:])
            return jnp.sum(ce * mask[:, 1:]) / jnp.sum(mask[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    # Fresh noise/phases every batch (the generalization pressure: the
    # model must read tones, not memorize waveforms).
    for it in range(STEPS):
        idx = rng.integers(0, N_TRAIN, BATCH)
        sents = [train_sents[i] for i in idx]
        audio = np.stack([synth(s, rng, NOISE * 0.7, cfg.n_samples)
                          for s in sents])
        tok, mask = encode_batch(sents)
        mel = whisper_log_mel(jnp.asarray(audio), n_mels=cfg.n_mels)
        params, opt_state, loss = step(params, opt_state, mel,
                                       jnp.asarray(tok), jnp.asarray(mask))
        if it % 100 == 0:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)
    print(f"final loss {float(loss):.4f}")

    return finish(cfg, table, params, eval_sents)


def finish(cfg, table, params, eval_sents):
    import jax
    import jax.numpy as jnp

    bf16_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    # Save BEFORE evaluation so a band miss below doesn't lose the
    # training run.
    FIXTURE.mkdir(parents=True, exist_ok=True)
    from yoho_tpu.train.checkpoint import save_params

    save_params(FIXTURE / "params.msgpack", bf16_params)
    (FIXTURE / "config.json").write_text(json.dumps(CFG))

    from yoho_tpu.eval.wer import wer
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.quantize import (quantize_whisper_decoder,
                                      quantize_whisper_encoder)

    def eval_audio_at(noise):
        # FIXED seed so the test re-decodes byte-identical windows (the
        # WER deltas are decode-path properties, not data noise).
        eval_rng = np.random.default_rng(1234)
        return [synth(s, eval_rng, noise, cfg.n_samples)
                for s in eval_sents]

    # Pick the eval noise whose bf16 WER sits in the measurable band:
    # non-zero (decisions near boundaries, so approximation lanes CAN
    # move words) but far from breakdown.
    bf16_t = Transcriber(Whisper(cfg, dtype=jnp.bfloat16),
                         {"params": bf16_params}, family="whisper",
                         token_table=table, batch_size=8, timestamps=False)
    chosen_noise, sweep = None, {}
    # The 3000-sentence model is noise-robust well past its training
    # noise (WER 0.0 at 0.20): sweep to where decisions actually start
    # flipping.
    for noise in (0.24, 0.30, 0.36, 0.44, 0.52, 0.62, 0.74):
        hyps = [r.text for r in bf16_t.transcribe_many(eval_audio_at(noise))]
        rate, _ = wer(eval_sents, hyps, normalize=False)
        sweep[noise] = round(float(rate), 4)
        print(f"noise {noise}: bf16 held-out WER {rate:.4f}", flush=True)
        if chosen_noise is None and 0.02 <= rate <= 0.25:
            chosen_noise = noise
    assert chosen_noise is not None, (
        f"no eval noise put bf16 WER in the measurable band: {sweep}")
    eval_audio = eval_audio_at(chosen_noise)

    def lane(name):
        mkw, vars_ = {}, {"params": bf16_params}
        tkw = dict(quantized_cross_kv="int8", quantized_cache=True)
        if name == "bf16":
            tkw = {}
        elif name == "int8-kv":
            pass
        elif name == "int4-kv":
            tkw["quantized_cross_kv"] = "int4"
        elif name == "int8-weights":
            mkw = dict(weights_int8=True)
            vars_ = quantize_whisper_decoder(vars_)
        elif name == "int8-encoder":
            mkw = dict(encoder_int8=True)
            vars_ = quantize_whisper_encoder(vars_)
        elif name == "fast-gelu":
            mkw = dict(fast_gelu=True)
        else:
            raise ValueError(name)
        t = Transcriber(Whisper(cfg, dtype=jnp.bfloat16, **mkw), vars_,
                        family="whisper", token_table=table, batch_size=8,
                        timestamps=False, **tkw)
        hyps = [r.text for r in t.transcribe_many(eval_audio)]
        rate, _ = wer(eval_sents, hyps, normalize=False)
        return round(float(rate), 4), hyps

    results = {}
    for name in ("bf16", "int8-kv", "int4-kv", "int8-weights",
                 "int8-encoder", "fast-gelu"):
        rate, hyps = lane(name)
        results[name] = rate
        print(f"{name}: WER {rate:.4f}", flush=True)

    assert 0.0 < results["bf16"] < 0.4, (
        f"bf16 held-out WER {results['bf16']} is not in the measurable "
        "band — tune the noise sweep")

    (FIXTURE / "spec.json").write_text(json.dumps({
        "words": WORDS, "word_ids": WORD_IDS, "base_hz": BASE_HZ,
        "word_sec": WORD_SEC, "noise": chosen_noise,
        "noise_sweep_bf16_wer": sweep, "eval_seed": 1234,
        "eval_sentences": eval_sents, "wer": results,
    }, indent=1))
    print("fixture written to", FIXTURE)
    print("\nPERFORMANCE.md table:")
    for name, rate in results.items():
        d = rate - results["bf16"]
        print(f"| {name} | {rate:.4f} | {d:+.4f} |")


if __name__ == "__main__":
    main()
