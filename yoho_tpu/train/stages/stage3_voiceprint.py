"""Stage 3: voiceprint encoder contrastive finetuning.

Fills the reference's empty ``voiceprint_encoder_contrastive_finetune.py``
placeholder. Trains :class:`VoiceprintEncoder` with supervised NT-Xent over
speaker-labeled clips; the encoder initializes from the stage-2
reconstruction encoder when that artifact exists. Exports to
``weights.voiceprint`` (consumed by stage 4 as the embedding teacher).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from yoho_tpu.audio.frontend import yoho_log_mel
from yoho_tpu.core.config import SessionConfig
from yoho_tpu.nn.voiceprint import VoiceprintEncoder, nt_xent_loss
from yoho_tpu.parallel.mesh import (
    is_coordinator,
    local_batch_size,
    make_mesh,
    process_shard,
    shard_batch,
)
from yoho_tpu.parallel.sharding import shard_params
from yoho_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    load_params,
    save_params,
    save_train_state,
)
from yoho_tpu.train.dataloader import SpeakerDataloader
from yoho_tpu.train.metrics import MetricsWriter
from yoho_tpu.train.session import stage_dir


class VoiceprintTrainer:
    def __init__(self, config: SessionConfig, mesh=None,
                 use_multiprocessing: bool = False):
        self.config = config
        self.hp = config.hyperparameters.voiceprint_finetune
        self.stage_path = stage_dir(config, 3)
        self.checkpoint_path = self.stage_path / "checkpoint.msgpack"
        # Multi-host (same contract as ASRTrainer): global hp.batch_size,
        # decorrelated per-process sampling, coordinator-only writers.
        # NB the NT-Xent in-batch negatives then come from the process's
        # LOCAL rows only (the loss is computed on the global batch, but
        # each process contributes batch/process_count clips per step).
        self.process_index, self.n_processes = process_shard()
        local_batch = local_batch_size(self.hp.batch_size)
        self.metrics = (MetricsWriter(self.stage_path / "metrics.csv")
                        if is_coordinator() else None)
        self.mesh = mesh or make_mesh(config.mesh.data, config.mesh.model)

        self.model = VoiceprintEncoder(config.yoho,
                                       embedding_dim=self.hp.embedding_dim,
                                       remat=self.hp.remat)
        self.dataloader = SpeakerDataloader(
            config, local_batch,
            shard=(self.process_index, self.n_processes),
            use_multiprocessing=use_multiprocessing,
            disable_warnings=True, warmup_queue=False,
        )

        acc = self.hp.accumulated_batches
        # Horizons in APPLIED updates (see the stage-2/ASRTrainer note):
        # MultiSteps steps the inner schedule once per applied update, so
        # scaling by `acc` would stretch warmup/decay by the accumulation
        # factor. decay_steps is TOTAL (incl. warmup), clamped.
        warmup = self.hp.warmup_updates
        total = max(self.hp.updates, warmup + 1)
        self.lr_schedule = optax.schedules.warmup_cosine_decay_schedule(
            0.0, self.hp.learning_rate, warmup, total,
            self.hp.final_learning_rate,
        )
        self.optimizer = optax.MultiSteps(optax.adamw(self.lr_schedule), acc)
        self.state = self._init_state()
        self._build_step()

    def _init_state(self) -> TrainState:
        cfg = self.config.yoho
        mel = jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
        params = jax.jit(self.model.init)(jax.random.PRNGKey(0), mel)["params"]

        # Warm-start the encoder tower from the stage-2 VAE when available
        # (both use YOHOAudioEncoder under the name "encoder").
        vae_params = load_params(self.config.weights.voice_reconstruction,
                                 {"encoder": params["encoder"]})
        if vae_params is not None:
            params = dict(params)
            params["encoder"] = vae_params["encoder"]

        params = shard_params(params, self.mesh)
        state = jax.jit(
            lambda p: TrainState.create(apply_fn=self.model.apply, params=p,
                                        tx=self.optimizer)
        )(params)
        restored = load_checkpoint(self.checkpoint_path, state.params, state.opt_state)
        if restored is not None:
            step, rp, opt_state = restored
            state = TrainState(step=jnp.asarray(step), apply_fn=self.model.apply,
                               params=shard_params(rp, self.mesh),
                               tx=self.optimizer, opt_state=opt_state)
        return state

    def _build_step(self):
        cfg = self.config.yoho
        temperature = self.hp.temperature
        model = self.model

        def loss_fn(params, mel, speaker_ids):
            emb = model.apply({"params": params}, mel)
            return nt_xent_loss(emb, speaker_ids, temperature)

        def train_step(state, audio, speaker_ids):
            mel = yoho_log_mel(audio.astype(jnp.float32), cfg)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mel, speaker_ids)
            return state.apply_gradients(grads=grads), loss

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

    def run(self, max_updates: Optional[int] = None, progress: bool = False) -> None:
        hp = self.hp
        acc = hp.accumulated_batches
        target = (max_updates or hp.updates) * acc
        ckpt = (AsyncCheckpointer(self.checkpoint_path, install_sigterm=True)
                if self.metrics is not None else None)
        acc_loss, seen = 0.0, 0
        try:
            while int(self.state.step) < target:
                step = int(self.state.step)
                audio, speaker_ids = self.dataloader.get_prepared_batch()
                audio, speaker_ids = shard_batch(
                    self.mesh, (np.asarray(audio), np.asarray(speaker_ids))
                )
                self.state, loss = self._train_step(self.state, audio, speaker_ids)
                acc_loss += float(loss)
                seen += 1
                if step % acc == acc - 1:
                    update = (step + 1) // acc
                    if self.metrics is not None:
                        self.metrics.log(
                            update, float(self.lr_schedule(update)),
                            acc_loss / max(seen, 1))
                    acc_loss, seen = 0.0, 0
                    if update % hp.validation_frequency == 0:
                        self._save_checkpoint(ckpt)
        finally:
            params = self._save_checkpoint(ckpt)
            if ckpt is not None:
                ckpt.close()
            if self.metrics is not None:
                save_params(self.config.weights.voiceprint, params)

    def _save_checkpoint(self, ckpt: Optional[AsyncCheckpointer]):
        """Collective on all processes; coordinator writes. Returns the
        host params (see ``checkpoint.save_train_state``)."""
        return save_train_state(self.mesh, self.state, ckpt)


def main(config: SessionConfig, max_updates=None,
         use_multiprocessing: bool = True) -> None:
    VoiceprintTrainer(config, use_multiprocessing=use_multiprocessing).run(
        max_updates=max_updates, progress=True
    )
