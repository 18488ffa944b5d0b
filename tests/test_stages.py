"""Stages 2-4 (the capabilities the reference left as empty files)."""

import datetime as dt
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import (
    DatasetConfig,
    Hyperparameters,
    SessionConfig,
    TrainingASRHP,
    TrainingReconstructionHP,
    TrainingVoicePrintsHP,
    YOHOConfig,
)
from yoho_tpu.nn.reconstruction import VoiceReconstructionVAE, vae_loss
from yoho_tpu.nn.voiceprint import VoiceprintEncoder, nt_xent_loss
from yoho_tpu.parallel.mesh import make_mesh
from yoho_tpu.text.srt import Subtitle, compose_srt
from yoho_tpu.text.tokenizer import train_tokenizer

TINY_YOHO = dict(
    sample_rate=16000, n_mel_bands=16, n_fft=400, stft_hop=160,
    max_audio_len=64, max_text_len=32, dims=32,
    n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
)
SENTENCES = ["hello there friend", "this is a test", "the quick brown fox"]


def _write_wav(path, data, sr=16000):
    pcm = np.clip(data * 32768, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = YOHOConfig(**TINY_YOHO)
    g = np.random.default_rng(0)
    for d in ("noisy", "clean", "finetune", "ambient", "speakers"):
        (root / d / "transcripts").mkdir(parents=True)
        (root / d / "audio").mkdir(parents=True)
    # transcribed tracks (stages 1/4)
    for f in range(3):
        subs, t = [], 0.1
        audio = g.standard_normal(int(16000 * 2.0)).astype(np.float32) * 0.01
        for u in range(3):
            subs.append(Subtitle(u + 1, dt.timedelta(seconds=t),
                                 dt.timedelta(seconds=t + 0.2),
                                 SENTENCES[(f + u) % 3]))
            t += 0.5
        (root / "noisy" / "transcripts" / f"t{f}.srt").write_text(compose_srt(subs))
        _write_wav(root / "noisy" / "audio" / f"t{f}.wav", audio)
    # clean audio (stage 2)
    _write_wav(root / "clean" / "audio" / "c0.wav",
               g.standard_normal(16000 * 2).astype(np.float32) * 0.05)
    # speakers (stage 3): 3 speakers, distinct tones
    for s, f0 in enumerate([220, 440, 880]):
        d = root / "speakers" / f"spk{s}"
        d.mkdir(parents=True)
        for c in range(2):
            t = np.arange(12000) / 16000
            _write_wav(d / f"clip{c}.wav",
                       (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32))

    sess_root = tmp_path_factory.mktemp("sessions")
    hp = Hyperparameters()
    common = dict(learning_rate=1e-3, final_learning_rate=1e-5, batch_size=4,
                  accumulated_batches=1, updates=50, warmup_updates=2,
                  validation_frequency=1, validation_samples=1)
    hp.transcribe_pretrain = TrainingASRHP(**common, speechless_sample_ratio=0.0)
    hp.transcribe_finetune = TrainingASRHP(**common, speechless_sample_ratio=0.0)
    hp.reconstruct_pretrain = TrainingReconstructionHP(**common, latent_dim=8)
    hp.voiceprint_finetune = TrainingVoicePrintsHP(**common, embedding_dim=16)
    config = SessionConfig(
        name="s", yoho=cfg,
        dataset=DatasetConfig(**{k: root / k for k in
                                 ("noisy", "clean", "finetune", "ambient", "speakers")}),
        hyperparameters=hp, sessions_root=sess_root,
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()
    tok = train_tokenizer(SENTENCES * 5, vocab_size=64 + 3 + 256 + 150,
                          max_audio_len=cfg.max_audio_len, backend="python")
    from pathlib import Path

    Path(config.weights.tokenizer).parent.mkdir(parents=True, exist_ok=True)
    tok.save(config.weights.tokenizer)
    return config, tok


# ------------------------------------------------------------------- stage 2
def test_vae_model_shapes():
    cfg = YOHOConfig(**TINY_YOHO)
    model = VoiceReconstructionVAE(cfg, latent_dim=8)
    mel = jnp.zeros((2, cfg.max_audio_len, cfg.n_mel_bands))
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel,
                           jax.random.PRNGKey(1))
    recon, mu, logvar = model.apply(variables, mel, jax.random.PRNGKey(2))
    assert recon.shape == mel.shape
    assert mu.shape == (2, cfg.max_audio_len // 2, 8)
    loss, (mse, kl) = vae_loss(recon, mel, mu, logvar, 1e-3)
    assert np.isfinite(float(loss))


def test_stage2_trainer_runs_and_exports(session):
    from yoho_tpu.train.stages.stage2_reconstruction import ReconstructionTrainer

    config, _tok = session
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    tr = ReconstructionTrainer(config, mesh=mesh)
    tr.run(max_updates=2)
    assert (tr.stage_path / "metrics.csv").exists()
    assert config.weights.voice_reconstruction.exists()


def test_stage23_schedule_indexed_in_applied_updates(session):
    """MultiSteps steps the inner schedule once per APPLIED update —
    horizons must not be scaled by accumulated_batches (regression: both
    stages stretched warmup/decay by the accumulation factor)."""
    from yoho_tpu.train.stages.stage2_reconstruction import ReconstructionTrainer
    from yoho_tpu.train.stages.stage3_voiceprint import VoiceprintTrainer

    config, _tok = session
    config = config.model_copy(deep=True)
    for hp in (config.hyperparameters.reconstruct_pretrain,
               config.hyperparameters.voiceprint_finetune):
        hp.accumulated_batches = 4
        hp.batch_size = 4
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    for cls in (ReconstructionTrainer, VoiceprintTrainer):
        tr = cls(config, mesh=mesh)
        hp = tr.hp
        # Peak exactly at the end of warmup, final LR at `updates` —
        # in applied-update units, independent of accumulation.
        np.testing.assert_allclose(float(tr.lr_schedule(hp.warmup_updates)),
                                   hp.learning_rate, rtol=1e-6)
        np.testing.assert_allclose(float(tr.lr_schedule(hp.updates)),
                                   hp.final_learning_rate, rtol=1e-3)
        assert float(tr.lr_schedule(hp.warmup_updates * 2)) < hp.learning_rate


# ------------------------------------------------------------------- stage 3
def test_voiceprint_encoder_and_ntxent():
    cfg = YOHOConfig(**TINY_YOHO)
    model = VoiceprintEncoder(cfg, embedding_dim=16)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((4, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mel)
    emb = model.apply(variables, mel)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               atol=1e-4)

    # masked pooling differs from full pooling
    mask = jnp.zeros((4, cfg.max_audio_len)).at[:, :8].set(1.0)
    emb_masked = model.apply(variables, mel, mask)
    assert not np.allclose(np.asarray(emb), np.asarray(emb_masked))

    # NT-Xent: perfectly clustered embeddings beat random ones
    ids = jnp.asarray([0, 0, 1, 1])
    perfect = jnp.asarray([[1, 0], [1, 0], [0, 1], [0, 1]], jnp.float32)
    rand = jnp.asarray(g.standard_normal((4, 2)).astype(np.float32))
    rand = rand / jnp.linalg.norm(rand, axis=-1, keepdims=True)
    assert float(nt_xent_loss(perfect, ids)) < float(nt_xent_loss(rand, ids))


def test_stage3_trainer_runs_and_exports(session):
    from yoho_tpu.train.stages.stage3_voiceprint import VoiceprintTrainer

    config, _tok = session
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    tr = VoiceprintTrainer(config, mesh=mesh)
    tr.run(max_updates=2)
    assert config.weights.voiceprint.exists()


def test_speaker_dataloader(session):
    from yoho_tpu.train.dataloader import SpeakerDataloader

    config, _tok = session
    dl = SpeakerDataloader(config, batch_size=4, clips_per_speaker=2,
                           use_multiprocessing=False)
    audio, ids = dl.get_batch(0)
    assert audio.shape == (4, config.yoho.n_samples)
    assert ids.shape == (4,)
    # pairs share speaker ids
    assert ids[0] == ids[1] and ids[2] == ids[3]


def test_speaker_batches_differ_across_epochs(session):
    """Sampling-based loader: without the epoch in the RNG stream every
    epoch replays epoch 1's speaker/clip/augment draws bit-identically."""
    from yoho_tpu.train.dataloader import SpeakerDataloader

    config, _tok = session
    dl = SpeakerDataloader(config, batch_size=4, clips_per_speaker=2,
                           use_multiprocessing=False, augment=True)
    a0, _ = dl.get_batch(0)
    dl._epoch = 1
    a1, _ = dl.get_batch(0)
    assert not np.array_equal(a0, a1)


def test_audio_chunks_differ_across_epochs(session):
    """AudioChunkDataloader folds the epoch so augmentation noise varies
    across epochs (the chunk slices themselves are deterministic)."""
    from yoho_tpu.train.dataloader import AudioChunkDataloader

    config, _tok = session
    dl = AudioChunkDataloader(config, batch_size=2,
                              use_multiprocessing=False, augment=True)
    (a0,) = dl.get_batch(0)
    dl._epoch = 1
    (a1,) = dl.get_batch(0)
    assert not np.array_equal(a0, a1)


# ------------------------------------------------------------------- stage 4
def test_spans_dataloader(session):
    from yoho_tpu.train.dataloader import TranscriptionDataloader

    config, tok = session
    dl = TranscriptionDataloader((0, 1), config, tok, batch_size=2,
                                 use_multiprocessing=False, return_spans=True,
                                 speechless_ratio=0.0)
    audio, tokens, mask, spans, valid = dl.get_batch(0)
    assert spans.shape == (2, 8, 2) and valid.shape == (2, 8)
    for r in range(2):
        n_vp = int((tokens[r] == tok.voiceprint_id).sum())
        assert valid[r].sum() >= 1
        # spans ordered and within the clip
        for u in range(int(valid[r].sum())):
            s, e = spans[r, u]
            assert 0 <= s <= e <= config.yoho.n_samples


def test_stage4_joint_trainer(session):
    from yoho_tpu.train.stages.stage4_joint_finetune import JointTrainer

    config, tok = session
    if not config.weights.voiceprint.exists():
        pytest.skip("stage 3 artifact missing (test ordering)")
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    tr = JointTrainer(config, tokenizer=tok, mesh=mesh)
    tr.run(max_updates=2)
    assert (tr.stage_path / "metrics.csv").exists()
    assert config.weights.yoho.exists()
