"""Subprocess body for tests/test_multihost.py — one process of a real
2-process cluster running a full ASRTrainer stage-1 session.

Exercises the whole multi-host training contract end to end: disjoint
dataloader shards (``shard=(index, count)``), process-local batch rows
assembled into global arrays (``shard_batch`` →
``make_array_from_process_local_data``), collective validation decode,
collective host-gather checkpointing, and coordinator-only artifact
writes. Corpus/session dirs come from YOHO_MH_CORPUS / YOHO_MH_SESSIONS
(the parent test builds them once; both processes share the paths, like
a pod's shared filesystem).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from yoho_tpu.parallel.mesh import init_distributed  # noqa: E402

init_distributed()

import numpy as np  # noqa: E402

from yoho_tpu.core.config import (  # noqa: E402
    DatasetConfig,
    Hyperparameters,
    MeshConfig,
    SessionConfig,
    TrainingASRHP,
    TrainingReconstructionHP,
    YOHOConfig,
)
from yoho_tpu.text.tokenizer import train_tokenizer  # noqa: E402
from yoho_tpu.train.stages.stage2_reconstruction import (  # noqa: E402
    ReconstructionTrainer,
)
from yoho_tpu.train.trainer import ASRTrainer  # noqa: E402

TINY_YOHO = dict(
    sample_rate=16000, n_mel_bands=16, n_fft=400, stft_hop=160,
    max_audio_len=64, max_text_len=32, dims=32,
    n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
)

SENTENCES = [
    "hello there friend", "this is a test", "the quick brown fox",
    "we are training a model", "speech goes in text comes out",
    "one more utterance here",
]


def main() -> None:
    assert jax.process_count() == 2
    corpus = os.environ["YOHO_MH_CORPUS"]
    sessions = os.environ["YOHO_MH_SESSIONS"]

    cfg = YOHOConfig(**TINY_YOHO)
    hp = Hyperparameters()
    hp.transcribe_pretrain = TrainingASRHP(
        learning_rate=1e-3, final_learning_rate=1e-5,
        batch_size=4,          # GLOBAL batch: 2 local rows per process
        accumulated_batches=1, updates=2, warmup_updates=1,
        validation_frequency=1, validation_samples=1,
        speechless_sample_ratio=0.0,
    )
    # updates > 2*warmup: stage 2 sizes its cosine tail as
    # (updates - warmup) - warmup, which must stay positive.
    hp.reconstruct_pretrain = TrainingReconstructionHP(
        learning_rate=1e-3, final_learning_rate=1e-5, batch_size=4,
        accumulated_batches=1, updates=3, warmup_updates=1,
        validation_frequency=1, validation_samples=1,
        kl_weight=1e-3, latent_dim=8,
    )
    config = SessionConfig(
        name="mh", yoho=cfg,
        dataset=DatasetConfig(**{k: os.path.join(corpus, k) for k in
                                 ("noisy", "clean", "finetune", "ambient",
                                  "speakers")}),
        hyperparameters=hp,
        mesh=MeshConfig(data=4, model=2),
        sessions_root=sessions,
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()

    # Deterministic from the sentence list — identical on both processes.
    tok = train_tokenizer(
        SENTENCES * 5,
        vocab_size=cfg.max_audio_len + 3 + 256 + 200,
        max_audio_len=cfg.max_audio_len, backend="python",
    )

    trainer = ASRTrainer(config, tokenizer=tok, stage=1,
                         use_multiprocessing=False)
    pid = jax.process_index()

    # Disjoint shards: the two processes' epoch tables must not overlap
    # and together must cover the corpus exactly once.
    table = trainer.train_dataloader.index_table
    assert trainer.train_dataloader.shard == (pid, 2)
    print(f"MH_SHARD {pid} {sorted(int(i) for i in table)}", flush=True)

    # Writers exist only on the coordinator.
    assert (trainer.metrics is not None) == (pid == 0)

    trainer.run(progress=False)

    stage_path = trainer.stage_path
    if pid == 0:
        rows = (stage_path / "metrics.csv").read_text().strip().splitlines()
        assert len(rows) >= 3, rows  # header + 2 updates
        assert (stage_path / "checkpoint.msgpack").exists()
        assert (stage_path / "validations.jsonl").exists()
        loss = float(rows[-1].split(",")[2])
    else:
        loss = float("nan")

    # Both processes report the (replicated) final step count; process 0
    # also reports the logged loss for the parent to sanity-check.
    print(f"MH_TRAIN_OK pid={pid} step={int(trainer.state.step)} "
          f"loss={loss}", flush=True)

    # Resume on the cluster: a fresh trainer must restore the
    # coordinator-written checkpoint on EVERY process (host arrays
    # re-placed onto the global mesh via cross-process device_put) and
    # pick up at the finished step. Barrier first: the write is the
    # coordinator's (a real pod restarts all processes together, so
    # only this in-process handoff needs it).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mh_ckpt_written")
    resumed = ASRTrainer(config, tokenizer=tok, stage=1,
                         use_multiprocessing=False)
    assert int(resumed.state.step) == 2, int(resumed.state.step)
    resumed.run(progress=False)  # target already reached: exits at once
    print(f"MH_RESUME_OK pid={pid} step={int(resumed.state.step)}",
          flush=True)

    # Stage 2 on the same cluster: AudioChunkDataloader shards chunks
    # disjointly, writers stay coordinator-only.
    rec = ReconstructionTrainer(config)
    assert rec.dataloader.shard == (pid, 2)
    assert (rec.metrics is not None) == (pid == 0)
    rec.run(progress=False)
    if pid == 0:
        assert (rec.stage_path / "metrics.csv").exists()
        assert (rec.stage_path / "checkpoint.msgpack").exists()
    print(f"MH_STAGE2_OK pid={pid} step={int(rec.state.step)}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
