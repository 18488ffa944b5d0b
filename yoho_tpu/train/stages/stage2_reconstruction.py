"""Stage 2: voice-reconstruction VAE pretraining.

Fills the reference's empty ``voice_reconstruction_pretrain.py`` placeholder
(``run_train_session.py:17-24`` stage list, hyperparameter block
``train/config.toml:50-58``, weights slot ``config.py:51-57``). Trains
:class:`VoiceReconstructionVAE` on audio-only chunks; the encoder weights
are exported to ``weights.voice_reconstruction`` and seed stage 3.
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
from yoho_tpu.nn.reconstruction import VoiceReconstructionVAE, vae_loss
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
    save_params,
    save_train_state,
)
from yoho_tpu.train.dataloader import AudioChunkDataloader
from yoho_tpu.train.metrics import MetricsWriter
from yoho_tpu.train.session import stage_dir


class ReconstructionTrainer:
    def __init__(self, config: SessionConfig, mesh=None,
                 use_multiprocessing: bool = False):
        self.config = config
        self.hp = config.hyperparameters.reconstruct_pretrain
        self.stage_path = stage_dir(config, 2)
        self.checkpoint_path = self.stage_path / "checkpoint.msgpack"
        # Multi-host (same contract as ASRTrainer): global hp.batch_size,
        # disjoint per-process dataloader shards, coordinator-only writers.
        self.process_index, self.n_processes = process_shard()
        local_batch = local_batch_size(self.hp.batch_size)
        self.metrics = (MetricsWriter(self.stage_path / "metrics.csv")
                        if is_coordinator() else None)
        self.mesh = mesh or make_mesh(config.mesh.data, config.mesh.model)

        self.model = VoiceReconstructionVAE(config.yoho,
                                            latent_dim=self.hp.latent_dim,
                                            remat=self.hp.remat)
        self.dataloader = AudioChunkDataloader(
            config, local_batch, augment=False,
            shard=(self.process_index, self.n_processes),
            use_multiprocessing=use_multiprocessing, disable_warnings=True,
            warmup_queue=False,
        )

        acc = self.hp.accumulated_batches
        # Horizons in APPLIED updates: under optax.MultiSteps the inner
        # adamw (and its schedule) steps once per applied update, not per
        # accumulation micro-step — scaling by `acc` would stretch
        # warmup/decay by the accumulation factor (the ASRTrainer note;
        # this trainer had exactly that bug). decay_steps is the TOTAL
        # schedule length including warmup, clamped for short runs.
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
        params = jax.jit(self.model.init)(
            {"params": jax.random.PRNGKey(0)}, mel, jax.random.PRNGKey(1)
        )["params"]
        params = shard_params(params, self.mesh)
        state = jax.jit(
            lambda p: TrainState.create(apply_fn=self.model.apply, params=p,
                                        tx=self.optimizer)
        )(params)
        restored = load_checkpoint(self.checkpoint_path, state.params, state.opt_state)
        if restored is not None:
            step, params, opt_state = restored
            state = TrainState(step=jnp.asarray(step), apply_fn=self.model.apply,
                               params=shard_params(params, self.mesh),
                               tx=self.optimizer, opt_state=opt_state)
        return state

    def _build_step(self):
        cfg = self.config.yoho
        kl_weight = self.hp.kl_weight
        model = self.model

        def loss_fn(params, mel, rng):
            recon, mu, logvar = model.apply({"params": params}, mel, rng)
            loss, (mse, kl) = vae_loss(recon, mel, mu, logvar, kl_weight)
            return loss, (mse, kl)

        def train_step(state, audio, rng):
            mel = yoho_log_mel(audio.astype(jnp.float32), cfg)
            (loss, (mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mel, rng
            )
            return state.apply_gradients(grads=grads), loss, mse, kl

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

    def run(self, max_updates: Optional[int] = None, progress: bool = False) -> None:
        hp = self.hp
        acc = hp.accumulated_batches
        target = (max_updates or hp.updates) * acc
        ckpt = (AsyncCheckpointer(self.checkpoint_path, install_sigterm=True)
                if self.metrics is not None else None)
        rng = jax.random.PRNGKey(42)
        acc_loss, seen = 0.0, 0
        try:
            while int(self.state.step) < target:
                step = int(self.state.step)
                (audio,) = self.dataloader.get_prepared_batch()
                audio = shard_batch(self.mesh, np.asarray(audio))
                rng, sub = jax.random.split(rng)
                self.state, loss, mse, kl = self._train_step(self.state, audio, sub)
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
                save_params(self.config.weights.voice_reconstruction, params)

    def _save_checkpoint(self, ckpt: Optional[AsyncCheckpointer]):
        """Collective on all processes; coordinator writes. Returns the
        host params (see ``checkpoint.save_train_state``)."""
        return save_train_state(self.mesh, self.state, ckpt)


def main(config: SessionConfig, max_updates=None,
         use_multiprocessing: bool = True) -> None:
    ReconstructionTrainer(config, use_multiprocessing=use_multiprocessing).run(
        max_updates=max_updates, progress=True
    )
