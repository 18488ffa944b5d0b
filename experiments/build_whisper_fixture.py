"""Build the committed trained micro-WHISPER fixture (tests/fixtures/whisper_tiny).

Complements the tiny-YOHO session fixture: the whisper family is the one
with int8/int4 CROSS-KV quantization (``Whisper.cross_kvs(xa, quantize)``),
so measuring quantization quality on real trained weights (VERDICT r1
item 9) needs trained whisper weights. No network -> train our own: a
micro Whisper (dims=32, 2+2 layers, REAL 51865 vocab so the OpenAI
special ids exist) overfit on the same 3 tone-coded sentences, with a
word-level text backend committed beside the weights.

Records goldens (CPU, bf16 — the serving dtype) for bf16 / int8 / int4
cross-KV decodes; tests assert int8 == bf16 exactly and int4 == its own
recorded golden (documented approximation).

Usage: python experiments/build_whisper_fixture.py
"""

import json
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
FIXTURE = REPO / "tests" / "fixtures" / "whisper_tiny"

SENTS = ["hello world", "good morning", "thank you"]
TONES = [440, 880, 1320]
# Word-level text backend: fixture-only (a real deployment loads a GPT-2
# BPE from the checkpoint dir); ids are ordinary text-token ids < eot.
WORD_IDS = {"hello": 1000, "world": 1001, "good": 1002, "morning": 1003,
            "thank": 1004, "you": 1005}

CFG = dict(n_mels=80, n_audio_ctx=64, n_audio_state=32, n_audio_head=4,
           n_audio_layer=2, n_vocab=51865, n_text_ctx=32, n_text_state=32,
           n_text_head=4, n_text_layer=2, chunk_seconds=1.28)


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


def tone_clip(s: int, n_samples: int) -> np.ndarray:
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * TONES[s] * np.arange(int(0.25 * 16000))
                        / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


def main() -> None:
    from yoho_tpu.audio.frontend import whisper_log_mel

    cfg = WhisperConfig(**CFG)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=WordBackend(WORD_IDS))
    model = Whisper(cfg)  # f32 for training

    prompt = table.sot_sequence("en", "transcribe", timestamps=False)
    targets = []
    T = max(len(prompt) + max(len(s.split()) for s in SENTS) + 1, 8)
    tok = np.full((3, T), table.eot, np.int32)
    mask = np.zeros((3, T), np.float32)
    for i, s in enumerate(SENTS):
        ids = prompt + table.encode_text(s) + [table.eot]
        tok[i, :len(ids)] = ids
        mask[i, len(prompt):len(ids)] = 1.0  # loss on words + eot only
        targets.append(ids)

    audio = np.stack([tone_clip(i, cfg.n_samples) for i in range(3)])
    mel = whisper_log_mel(jnp.asarray(audio), n_mels=cfg.n_mels)

    variables = model.init(jax.random.PRNGKey(0), mel[:1], jnp.asarray(tok[:1]))

    def loss_fn(params):
        logits = model.apply({"params": params}, mel, jnp.asarray(tok))
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], jnp.asarray(tok)[:, 1:])
        m = jnp.asarray(mask)[:, 1:]
        return jnp.sum(ce * m) / jnp.sum(m)

    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for i in range(800):
        params, opt_state, loss = step(params, opt_state)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
        if float(loss) < 1e-3:
            break
    print(f"final loss {float(loss):.4f}")

    # Serving dtype: bf16 (matches build_whisper_transcriber).
    bf16_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    from yoho_tpu.infer.pipeline import Transcriber

    def decode_all(quant):
        t = Transcriber(Whisper(cfg, dtype=jnp.bfloat16),
                        {"params": bf16_params}, family="whisper",
                        token_table=table, batch_size=1, timestamps=False,
                        quantized_cross_kv=quant, quantized_cache=True)
        return [t.transcribe(tone_clip(i, cfg.n_samples)).text
                for i in range(3)]

    texts = {q: decode_all(qv) for q, qv in
             (("bf16", False), ("int8", "int8"), ("int4", "int4"))}
    for i, s in enumerate(SENTS):
        assert texts["bf16"][i] == s, (
            f"fixture failed to learn {s!r}: got {texts['bf16'][i]!r}")
    print("bf16:", texts["bf16"])
    print("int8:", texts["int8"], "exact:", texts["int8"] == texts["bf16"])
    print("int4:", texts["int4"], "exact:", texts["int4"] == texts["bf16"])

    FIXTURE.mkdir(parents=True, exist_ok=True)
    from yoho_tpu.train.checkpoint import save_params

    save_params(FIXTURE / "params.msgpack", bf16_params)
    (FIXTURE / "config.json").write_text(json.dumps(CFG))
    (FIXTURE / "word_vocab.json").write_text(json.dumps(WORD_IDS))
    (FIXTURE / "golden.json").write_text(json.dumps(
        {"sentences": SENTS, "tones": TONES, "texts": texts}, indent=1))
    size = (FIXTURE / "params.msgpack").stat().st_size
    print(f"fixture written to {FIXTURE} ({size / 1e6:.2f} MB params)")


if __name__ == "__main__":
    main()
