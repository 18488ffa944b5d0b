"""Build the committed MULTILINGUAL micro-whisper fixture
(tests/fixtures/whisper_multilingual) — VERDICT r2 item 6.

The whisper_tiny fixture is English-only, so audio language auto-detect
(``language=None``), the ``<|translate|>`` task, and
``language_probability`` had no exact-text end-to-end pin. This fixture
closes that: a micro Whisper (real 51865 vocab, so every language/task
token exists) overfit on TWO toy "languages" — tone-coded clips whose
targets carry real ``<|en|>``/``<|de|>`` language tokens — plus
translate-task rows mapping the "German" clips to English text.

Training detail that makes auto-detect work: the loss INCLUDES the
language-token position (the model learns p(lang | sot, audio) — exactly
what ``Transcriber.detect_language`` reads, parity target
``/root/reference/yoho/src/nn/whisper.py:268-270``) but EXCLUDES the
task/notimestamps positions (caller-forced at decode time; training on
them would make transcribe-vs-translate ambiguous from the audio alone).

Usage: python experiments/build_multilingual_fixture.py
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
FIXTURE = REPO / "tests" / "fixtures" / "whisper_multilingual"

# (tone_hz, language, transcribe text, translate-to-English text | None)
SAMPLES = [
    (440, "en", "hello world", None),
    (880, "en", "good morning", None),
    (1320, "de", "guten morgen", "good morning"),
    (1760, "de", "danke schoen", "thank you"),
]
WORD_IDS = {"hello": 1000, "world": 1001, "good": 1002, "morning": 1003,
            "thank": 1004, "you": 1005, "guten": 1006, "morgen": 1007,
            "danke": 1008, "schoen": 1009}

CFG = dict(n_mels=80, n_audio_ctx=64, n_audio_state=32, n_audio_head=4,
           n_audio_layer=2, n_vocab=51865, n_text_ctx=32, n_text_state=32,
           n_text_head=4, n_text_layer=2, chunk_seconds=1.28)


class WordBackend:
    def __init__(self, word_ids):
        self.word_ids = dict(word_ids)
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


def tone_clip(hz: float, n_samples: int) -> np.ndarray:
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * hz * np.arange(int(0.25 * 16000)) / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


def main() -> None:
    from yoho_tpu.audio.frontend import whisper_log_mel

    cfg = WhisperConfig(**CFG)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=WordBackend(WORD_IDS))
    model = Whisper(cfg)

    rows = []  # (tone_hz, prompt_ids, text)
    for hz, lang, text, translated in SAMPLES:
        rows.append((hz, table.sot_sequence(lang, "transcribe",
                                            timestamps=False), text))
        if translated is not None:
            rows.append((hz, table.sot_sequence(lang, "translate",
                                                timestamps=False),
                         translated))

    T = max(max(len(p) + len(t.split()) + 1 for _hz, p, t in rows), 8)
    tok = np.full((len(rows), T), table.eot, np.int32)
    mask = np.zeros((len(rows), T), np.float32)
    for i, (_hz, prompt, text) in enumerate(rows):
        ids = list(prompt) + table.encode_text(text) + [table.eot]
        tok[i, :len(ids)] = ids
        # Loss on the LANGUAGE token (position 1) + words + eot; NOT on
        # the caller-forced task/notimestamps positions (2..len(prompt)).
        mask[i, 1] = 1.0
        mask[i, len(prompt):len(ids)] = 1.0

    audio = np.stack([tone_clip(hz, cfg.n_samples) for hz, _p, _t in rows])
    mel = whisper_log_mel(jnp.asarray(audio), n_mels=cfg.n_mels)
    variables = model.init(jax.random.PRNGKey(0), mel[:1],
                           jnp.asarray(tok[:1]))

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
    for i in range(1500):
        params, opt_state, loss = step(params, opt_state)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
        if float(loss) < 1e-3:
            break
    print(f"final loss {float(loss):.4f}")

    bf16_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    from yoho_tpu.infer.pipeline import Transcriber

    def build(language, task="transcribe"):
        return Transcriber(Whisper(cfg, dtype=jnp.bfloat16),
                           {"params": bf16_params}, family="whisper",
                           token_table=table, batch_size=1,
                           timestamps=False, language=language, task=task)

    auto = build(None)
    golden = {"samples": [], "word_ids": WORD_IDS}
    ok = True
    for hz, lang, text, translated in SAMPLES:
        clip = tone_clip(hz, cfg.n_samples)
        res = auto.transcribe(clip)
        det_lang, det_probs = auto.detect_language(clip)
        entry = {"tone": hz, "language": lang, "text": text,
                 "detected": det_lang,
                 "auto_text": res.text,
                 "auto_language": res.language,
                 "language_probability": round(res.language_probability, 4)}
        if translated is not None:
            tr = build("de", task="translate").transcribe(clip)
            entry["translated"] = tr.text
            ok &= tr.text == translated
        golden["samples"].append(entry)
        ok &= res.text == text and res.language == lang and det_lang == lang
        print(entry)
    assert ok, "fixture failed to learn the multilingual contract"

    FIXTURE.mkdir(parents=True, exist_ok=True)
    from yoho_tpu.train.checkpoint import save_params

    save_params(FIXTURE / "params.msgpack", bf16_params)
    (FIXTURE / "config.json").write_text(json.dumps(CFG))
    (FIXTURE / "word_vocab.json").write_text(json.dumps(WORD_IDS))
    (FIXTURE / "golden.json").write_text(json.dumps(golden, indent=1))
    size = (FIXTURE / "params.msgpack").stat().st_size
    print(f"fixture written to {FIXTURE} ({size / 1e6:.2f} MB params)")


if __name__ == "__main__":
    main()
