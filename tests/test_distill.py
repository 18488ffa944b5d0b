"""Distillation: KL/agreement learning, vocab guard, speculative plug-in.

``yoho distill`` exists to manufacture draft models for speculative
decoding (no reference counterpart). The decisive integration check:
an exported student drops into the speculative Transcriber and — by the
draft-verify construction — reproduces the teacher's greedy transcript
exactly, regardless of how well it was trained; training quality then
shows up purely as the agreement (acceptance) number.
"""

import datetime as dt
import json
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.srt import Subtitle, compose_srt
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

TEACHER = dict(n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_head=4,
               n_audio_layer=1, n_text_ctx=48, n_text_state=32,
               n_text_head=4, n_text_layer=1, chunk_seconds=0.64)
# Smaller width; SAME n_mels as the teacher — the speculative Transcriber
# feeds one shared mel to both models (the distiller warns otherwise).
STUDENT = dict(TEACHER, n_audio_state=24, n_text_state=24)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]


class _WordBackend:
    def __init__(self, words):
        self.word_ids = {w: 100 + i for i, w in enumerate(words)}
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill_corpus")
    (root / "transcripts").mkdir()
    (root / "audio").mkdir()
    g = np.random.default_rng(1)
    for f in range(3):
        subs, t = [], 0.05
        audio = g.standard_normal(16000).astype(np.float32) * 0.003
        for u in range(3):
            w = (f + 2 * u) % len(WORDS)
            start, end = t, t + 0.15
            tone = 0.4 * np.sin(2 * np.pi * (300 + 120 * w)
                                * np.arange(int(0.15 * 16000)) / 16000)
            audio[int(start * 16000):int(start * 16000) + len(tone)] += \
                tone.astype(np.float32)
            subs.append(Subtitle(u + 1, dt.timedelta(seconds=start),
                                 dt.timedelta(seconds=end), WORDS[w]))
            t = end + 0.08
        (root / "transcripts" / f"t{f}.srt").write_text(compose_srt(subs))
        pcm = np.clip(audio * 32768, -32768, 32767).astype(np.int16)
        with wave.open(str(root / "audio" / f"t{f}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
    return root


@pytest.fixture(scope="module")
def table():
    return WhisperTokenTable(multilingual=True,
                             text_backend=_WordBackend(WORDS))


def _init(cfg, seed):
    model = Whisper(cfg, dtype=jnp.float32)
    return model, jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]


def test_vocab_mismatch_rejected(corpus, table, tmp_path):
    from yoho_tpu.train.distill import WhisperDistiller

    t_cfg = WhisperConfig(**TEACHER)
    s_cfg = WhisperConfig(**dict(STUDENT, n_vocab=12345))
    _tm, t_params = _init(t_cfg, 0)
    _sm, s_params = _init(s_cfg, 1)
    with pytest.raises(ValueError, match="vocab"):
        WhisperDistiller(t_cfg, t_params, s_cfg, s_params, table,
                         corpus, tmp_path / "bad")


def test_distill_learns_and_plugs_into_speculative(corpus, table, tmp_path):
    from safetensors.numpy import load_file

    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.convert import convert_hf_whisper
    from yoho_tpu.train.distill import WhisperDistiller
    from yoho_tpu.train.whisper_finetune import WhisperFinetuner

    # 1. Make a trained teacher (overfit on the tiny corpus).
    t_cfg = WhisperConfig(**TEACHER)
    _tm, t_params0 = _init(t_cfg, 0)
    teacher_tuner = WhisperFinetuner(
        t_cfg, t_params0, table, corpus, tmp_path / "teacher",
        batch_size=8, updates=80, warmup_updates=5, learning_rate=3e-3,
        timestamps=False, augment=False, language_whitelist=["en"],
        compute_dtype=jnp.float32, validation_frequency=0, seed=0)
    teacher_tuner.run()
    t_params = jax.device_get(teacher_tuner.state.params)

    # 2. Distill a narrower student against it.
    s_cfg = WhisperConfig(**STUDENT)
    _sm, s_params0 = _init(s_cfg, 1)
    out = tmp_path / "draft"
    distiller = WhisperDistiller(
        t_cfg, t_params, s_cfg, s_params0, table, corpus, out,
        alpha=0.3, tau=2.0,
        batch_size=8, updates=120, warmup_updates=5, learning_rate=3e-3,
        timestamps=False, augment=False, language_whitelist=["en"],
        compute_dtype=jnp.float32, validation_frequency=1000, seed=0)

    batch = distiller.train_dataloader.get_prepared_batch()
    agree0 = float(distiller._agreement(
        distiller.state.params, distiller._t_params,
        *map(jnp.asarray, batch[:3])))
    distiller.run()
    agreeN = float(distiller._agreement(
        distiller.state.params, distiller._t_params,
        *map(jnp.asarray, batch[:3])))
    assert agreeN > max(0.7, agree0 + 0.2), (agree0, agreeN)

    # 3. Exported dir: student architecture in config.json (never the
    # teacher's), loadable params.
    cfg_json = json.loads((out / "config.json").read_text())
    assert cfg_json["d_model"] == 24 and cfg_json["num_mel_bins"] == 16
    s_params = convert_hf_whisper(load_file(out / "model.safetensors"),
                                  s_cfg)

    # 4. Speculative decode with the distilled draft reproduces the
    # teacher's greedy transcript EXACTLY (draft-verify invariant) —
    # the draft only moves the speed, never the output.
    teacher_model = Whisper(t_cfg, dtype=jnp.float32)
    plain = Transcriber(teacher_model, {"params": t_params},
                        family="whisper", token_table=table, batch_size=1,
                        timestamps=False, language="en")
    spec = Transcriber(teacher_model, {"params": t_params},
                       family="whisper", token_table=table, batch_size=1,
                       timestamps=False, language="en",
                       draft_model=Whisper(s_cfg, dtype=jnp.float32),
                       draft_variables={"params": s_params},
                       speculative_gamma=3)
    with wave.open(str(corpus / "audio" / "t0.wav"), "rb") as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    audio = (pcm / 32768.0).astype(np.float32)[:t_cfg.n_samples]
    want = plain.transcribe(audio)
    got = spec.transcribe(audio)
    assert [s.tokens for s in want.segments] == \
           [s.tokens for s in got.segments]
    assert want.text == got.text and want.text.strip()
