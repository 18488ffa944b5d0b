"""Stage-1/4 ASR trainer: mesh/GSPMD data parallelism, fully-jitted steps.

Redesign of the reference Trainer
(``train/stages/transcription_pretrain_no_voiceprints.py:29-330``) on
TPU-native distribution: instead of pmap + replicate/unreplicate plumbing
(reference :215-236), parameters are placed on a named (data, model) Mesh
via the partition rules, batches are sharded on ``data``, and one jitted
donated ``train_step`` carries everything — XLA inserts the gradient
reductions over ICI. Multi-host = same code after
``jax.distributed.initialize`` (bigger mesh).

Training semantics preserved: on-device mel + standardization preprocessing
(ref :172-179), masked next-token CE (ref :181-187), optax
warmup-cosine-decay AdamW wrapped in MultiSteps gradient accumulation
(ref :67-79), metrics CSV + validation JSONL cadence, resume from
checkpoint. Validation sample decoding uses the KV-cached jitted greedy
decoder instead of the reference's per-token full recompute (ref :273-286).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from yoho_tpu.audio.frontend import yoho_log_mel
from yoho_tpu.core.config import SessionConfig, TrainingHP
from yoho_tpu.infer.decode import greedy_decode, make_yoho_step_fn
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.parallel.mesh import (
    fetch_to_host,
    is_coordinator,
    local_batch_size,
    make_mesh,
    process_shard,
    shard_batch,
)
from yoho_tpu.parallel.sharding import YOHO_RULES, shard_params
from yoho_tpu.text.tokenizer import YOHOTokenizer
from yoho_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    save_train_state,
)
from yoho_tpu.train.dataloader import TranscriptionDataloader
from yoho_tpu.train.metrics import MetricsWriter
from yoho_tpu.train.session import stage_dir


def masked_ce_loss(logits, tokens, loss_mask):
    """Next-token CE, masked (parity: reference loss_fn :181-187)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], tokens[:, 1:].astype(jnp.int32)
    )
    mask = loss_mask[:, 1:].astype(ce.dtype)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def restore_train_state(state: TrainState, checkpoint_path, mesh, rules,
                        apply_fn, optimizer) -> TrainState:
    """Restore a checkpoint into a freshly created (mesh-sharded) state.

    Shared by the YOHO trainer and the Whisper fine-tuner. The subtle
    part: the fresh ``state.opt_state`` carries the correct mesh
    placements (it was built under jit from sharded params), while
    restored leaves are host arrays — without re-placement the first
    step commits ~3x params of f32 optimizer state to one device.
    Returns ``state`` unchanged when no checkpoint exists."""
    restored = load_checkpoint(checkpoint_path, state.params, state.opt_state)
    if restored is None:
        return state
    step, params, opt_state = restored
    params = shard_params(params, mesh, rules)
    opt_state = jax.tree_util.tree_map(
        lambda ref, x: (jax.device_put(x, ref.sharding)
                        if hasattr(ref, "sharding") else x),
        state.opt_state, opt_state,
    )
    return TrainState(
        step=jnp.asarray(step),
        apply_fn=apply_fn,
        params=params,
        tx=optimizer,
        opt_state=opt_state,
    )


class ASRTrainer:
    """Transcription (pre)training. ``stage=1`` trains without voiceprint
    supervision; ``stage=4`` reuses the loop with voiceprint-aware data."""

    def __init__(
        self,
        config: SessionConfig,
        tokenizer: Optional[YOHOTokenizer] = None,
        stage: int = 1,
        hp: Optional[TrainingHP] = None,
        mesh=None,
        use_multiprocessing: bool = False,
        checkpoint_name: str = "checkpoint.msgpack",
        model: Optional[YOHOModel] = None,
        init_params=None,
        dataloader_kwargs: Optional[dict] = None,
        compute_dtype=None,
    ):
        # Mixed precision: bf16 activations/matmuls with f32 params and
        # optimizer state (pass compute_dtype=jnp.bfloat16). Default f32.
        self.compute_dtype = compute_dtype or jnp.float32
        self.config = config
        self.stage = stage
        self.hp = hp or (
            config.hyperparameters.transcribe_pretrain
            if stage == 1
            else config.hyperparameters.transcribe_finetune
        )
        self.stage_path = stage_dir(config, stage)
        self.checkpoint_path = self.stage_path / checkpoint_name
        # Artifact writers are coordinator-only: on a multi-host shared
        # filesystem every process sees the same paths, and concurrent
        # writers would interleave/clobber. Non-coordinators carry None
        # and every use below is gated.
        self.metrics = (
            MetricsWriter(self.stage_path / "metrics.csv",
                          self.stage_path / "validations.jsonl")
            if is_coordinator() else None
        )

        self.tokenizer = tokenizer or YOHOTokenizer.load(config.weights.tokenizer)
        self.model = model or YOHOModel(config.yoho, self.tokenizer.vocab_size,
                                        dtype=self.compute_dtype,
                                        remat=self.hp.remat)

        # Long-context training (session TOML alone turns it on): with
        # [hyperparameters.<stage>] long_context_factor = N > 1, clips are
        # N x the base window, the mesh gains a ``seq`` axis, and the
        # encoder runs sequence-parallel ring attention
        # (yoho_tpu.parallel.long_encoder). The RoPE encoder is
        # length-agnostic, so the SAME parameter tree trains either way.
        self.long_context_factor = int(
            getattr(self.hp, "long_context_factor", 1) or 1)
        data_config = config
        if self.long_context_factor > 1:
            data_config = config.model_copy(deep=True)
            data_config.yoho.max_audio_len *= self.long_context_factor
            data_config.yoho.max_text_len *= self.long_context_factor
            self.mesh = mesh or self._make_long_context_mesh(config)
            n_seq = self.mesh.shape["seq"]
            frames = data_config.yoho.max_audio_len // 2  # post-stem
            if frames % n_seq:
                raise ValueError(
                    f"long-context post-stem length {frames} must divide "
                    f"by the seq axis ({n_seq}); adjust max_audio_len, "
                    "long_context_factor, or [mesh] seq")
        else:
            self.mesh = mesh or make_mesh(config.mesh.data, config.mesh.model)
        self.data_config = data_config

        # Multi-host: hp.batch_size is the GLOBAL batch. Each process
        # loads a disjoint corpus shard of batch_size/process_count rows
        # (shard_batch assembles them into the global array); artifact
        # writers below are coordinator-only.
        self.process_index, self.n_processes = process_shard()
        local_batch = local_batch_size(self.hp.batch_size)
        dl_kwargs = dict(
            config=data_config,
            tokenizer=self.tokenizer,
            # Each stage's OWN ratio (stage 4 has its own field; the
            # dataloader default would silently read the stage-1 value).
            speechless_ratio=getattr(self.hp, "speechless_sample_ratio", 0.0),
            batch_size=local_batch,
            shard=(self.process_index, self.n_processes),
            shuffle=True,
            use_multiprocessing=use_multiprocessing,
            disable_warnings=True,
            warmup_queue=False,
            **(dataloader_kwargs or {}),
        )
        self.train_dataloader = TranscriptionDataloader((0.0, 0.9), seed=0, **dl_kwargs)
        try:
            self.val_dataloader = TranscriptionDataloader((0.9, 1.0), seed=1, **dl_kwargs)
        except FileNotFoundError:
            # Tiny corpora: fall back to a reshuffled train slice.
            self.val_dataloader = TranscriptionDataloader((0.0, 1.0), seed=1, **dl_kwargs)

        acc = self.hp.accumulated_batches
        # optax's decay_steps is the TOTAL schedule length INCLUDING warmup
        # (cosine runs for decay_steps - warmup_steps). Clamp so short runs
        # (updates <= warmup) still construct a valid schedule.
        # Horizons are in APPLIED UPDATES: under optax.MultiSteps the inner
        # optimizer (and therefore its schedule) steps once per applied
        # update, not per accumulation micro-step — scaling by `acc` here
        # would stretch warmup/decay by the accumulation factor (verified
        # empirically: param deltas track sched(update_count)).
        warmup = self.hp.warmup_updates
        total = max(self.hp.updates, warmup + 1)
        self.lr_schedule = optax.schedules.warmup_cosine_decay_schedule(
            0.0,
            self.hp.learning_rate,
            warmup,
            total,
            self.hp.final_learning_rate,
        )
        self.optimizer = optax.MultiSteps(optax.adamw(self.lr_schedule), acc)

        self.state = self._init_state(init_params)
        self._build_steps()

    # ------------------------------------------------------------------
    def _init_state(self, init_params=None) -> TrainState:
        cfg = self.config.yoho
        b = self.hp.batch_size
        dummy_tokens = jnp.zeros((b, cfg.max_text_len), jnp.int32)
        dummy_mel = jnp.zeros((b, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
        if init_params is None:
            variables = jax.jit(
                partial(self.model.init, method=YOHOModel.forward_with_voiceprints)
            )(jax.random.PRNGKey(0), dummy_tokens, dummy_mel)
            params = variables["params"]
        else:
            params = init_params

        params = shard_params(params, self.mesh, YOHO_RULES)
        state = jax.jit(
            lambda p: TrainState.create(
                apply_fn=self.model.apply, params=p, tx=self.optimizer
            )
        )(params)

        return restore_train_state(state, self.checkpoint_path, self.mesh,
                                   YOHO_RULES, self.model.apply,
                                   self.optimizer)

    @staticmethod
    def _make_long_context_mesh(config: SessionConfig):
        """(data, seq) mesh for sequence-parallel training. ``[mesh] seq``
        sizes the ring axis (-1: every device the data axis doesn't use;
        with both -1, seq takes all devices — long clips are the scarce
        resource, not batch)."""
        devices = jax.devices()
        n = len(devices)
        seq = config.mesh.seq
        if seq == -1:
            seq = n // config.mesh.data if config.mesh.data != -1 else n
        if seq < 1 or n % seq:
            raise ValueError(f"seq axis size {seq} does not divide "
                             f"device count {n}")
        data = n // seq
        if config.mesh.data not in (-1, data):
            raise ValueError(f"mesh {config.mesh.data}x{seq} != {n} devices")
        import numpy as _np

        from jax.sharding import Mesh

        return Mesh(_np.asarray(devices).reshape(data, seq), ("data", "seq"))

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        model, cfg = self.model, self.config.yoho

        def preprocess(audio, tokens, loss_mask):
            mel = yoho_log_mel(audio.astype(jnp.float32), cfg)
            return mel, tokens.astype(jnp.int32), loss_mask.astype(jnp.uint8)

        if self.long_context_factor > 1:
            from yoho_tpu.parallel.long_encoder import make_long_context_loss_fn

            if cfg.n_experts > 0:
                raise ValueError(
                    "long_context_factor > 1 with n_experts > 0 is not "
                    "supported: the ring encoder does not collect MoE aux "
                    "losses (train MoE models with the standard step)")
            loss_fn = make_long_context_loss_fn(model, self.mesh)
        elif cfg.n_experts > 0:
            from yoho_tpu.nn.moe import collect_aux_losses

            def loss_fn(params, mel, tokens, loss_mask):
                logits, st = model.apply({"params": params}, tokens, mel,
                                         mutable=["intermediates"])
                aux = collect_aux_losses(st["intermediates"])
                return (masked_ce_loss(logits, tokens, loss_mask)
                        + cfg.moe_aux_weight * aux)
        else:
            def loss_fn(params, mel, tokens, loss_mask):
                logits = model.apply({"params": params}, tokens, mel)
                return masked_ce_loss(logits, tokens, loss_mask)

        def train_step(state, audio, tokens, loss_mask):
            mel, tokens, loss_mask = preprocess(audio, tokens, loss_mask)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, mel, tokens, loss_mask
            )
            # No explicit pmean: grads of data-sharded batches are reduced
            # by XLA through the sharded dot/reduce ops (GSPMD).
            state = state.apply_gradients(grads=grads)
            return state, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def val_loss_fn(params, audio, tokens, loss_mask):
            mel, tokens, loss_mask = preprocess(audio, tokens, loss_mask)
            return loss_fn(params, mel, tokens, loss_mask)

        self._val_loss = jax.jit(val_loss_fn)

        def decode_samples(params, audio, prompt):
            mel = yoho_log_mel(audio.astype(jnp.float32), cfg)
            variables = {"params": params}
            xa = model.apply(variables, mel, method=YOHOModel.encode_audio)
            ckv = model.apply(variables, xa, method=YOHOModel.cross_kvs)
            # Cache batch from the actual prompt (static at trace time) —
            # validation batches can be smaller than validation_samples.
            caches = model.apply(variables, prompt.shape[0], jnp.float32,
                                 method=YOHOModel.init_caches)
            step = make_yoho_step_fn(model, variables, ckv)
            tokens, lengths = greedy_decode(
                step, caches, prompt, cfg.max_text_len, self.tokenizer.eot_id
            )
            return tokens, lengths

        self._decode_samples = jax.jit(decode_samples)

    # ------------------------------------------------------------------
    def _validate(self, update: int) -> float:
        hp = self.hp
        val_batch = self.val_dataloader.get_prepared_batch()
        train_batch = self.train_dataloader.get_prepared_batch()
        n = min(hp.validation_samples, len(val_batch[0]), len(train_batch[0]))
        audio = np.concatenate([val_batch[0][:n], train_batch[0][:n]])
        tokens = np.concatenate([val_batch[1][:n], train_batch[1][:n]])
        masks = np.concatenate([val_batch[2][:n], train_batch[2][:n]])
        prompt = np.full((2 * n, 1), self.tokenizer.sot_id, np.int32)

        if self.n_processes == 1:
            val_loss = float(
                self._val_loss(self.state.params,
                               *map(jnp.asarray, val_batch[:3]))
            )
            decoded, _lengths = self._decode_samples(
                self.state.params, jnp.asarray(audio), jnp.asarray(prompt)
            )
            decoded = np.asarray(decoded)
        else:
            # Multi-host: every process contributes its local rows to ONE
            # global computation — this whole block is collective and must
            # run on all processes in lockstep. The coordinator then
            # renders ITS rows: the first 2n of the process-major global
            # batch. Rows are wrap-padded to the per-process data extent
            # (global decode batches must divide over the data axis).
            val_loss = float(self._val_loss(
                self.state.params,
                *shard_batch(self.mesh,
                             tuple(np.asarray(x) for x in val_batch[:3]))))
            extent = max(1, self.mesh.shape["data"] // self.n_processes)
            rows = 2 * n
            idx = np.arange(rows + (-rows) % extent) % rows
            audio_g, prompt_g = shard_batch(self.mesh,
                                            (audio[idx], prompt[idx]))
            decoded_g, _lengths = self._decode_samples(
                self.state.params, audio_g, prompt_g
            )
            decoded = np.asarray(
                fetch_to_host(self.mesh, decoded_g))[:rows]
            if self.metrics is None:
                return val_loss

        def _true_len(mask):
            nz = np.nonzero(mask)[0]
            return int(nz[-1]) + 1 if len(nz) else 0

        correct = [
            self.tokenizer.decode(row[: _true_len(m)])
            for row, m in zip(tokens, masks)
        ]
        predicted = [self.tokenizer.decode(row) for row in decoded]
        self.metrics.write_validation(
            correct[:n], predicted[:n], correct[n:], predicted[n:]
        )
        return val_loss

    # ------------------------------------------------------------------
    def run(self, max_updates: Optional[int] = None, progress: bool = False) -> None:
        hp = self.hp
        acc = hp.accumulated_batches
        target_steps = (max_updates or hp.updates) * acc
        # Coordinator-only writer; every process still participates in the
        # collective host-gather inside _save_checkpoint.
        ckpt = (AsyncCheckpointer(self.checkpoint_path, install_sigterm=True)
                if self.metrics is not None else None)
        pbar = None
        if progress:
            from tqdm import tqdm

            pbar = tqdm(initial=int(self.state.step) // acc,
                        total=max_updates or hp.updates)

        # Profiling (SURVEY.md §5: the reference has none): set
        # YOHO_PROFILE_DIR to capture a TensorBoard device trace of steps
        # [profile_start, profile_start + profile_steps).
        import os as _os

        profile_dir = _os.environ.get("YOHO_PROFILE_DIR")
        profile_start = int(_os.environ.get("YOHO_PROFILE_START", "4"))
        profile_steps = int(_os.environ.get("YOHO_PROFILE_STEPS", "3"))
        profiling = False

        acc_loss, seen = 0.0, 0
        completed = False
        try:
            while int(self.state.step) < target_steps:
                step = int(self.state.step)
                if profile_dir and not profiling and step == profile_start:
                    import jax.profiler

                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                if profiling and step >= profile_start + profile_steps:
                    import jax.profiler

                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None
                accumulation_step = step % acc
                batch = self.train_dataloader.get_prepared_batch()
                batch = shard_batch(self.mesh, tuple(np.asarray(x) for x in batch))
                self.state, loss = self._train_step(self.state, *batch)
                acc_loss += float(loss)
                seen += 1

                if accumulation_step == acc - 1:
                    update = (step + 1) // acc
                    batch_loss = acc_loss / max(seen, 1)
                    acc_loss, seen = 0.0, 0
                    if pbar is not None:
                        pbar.update()
                        pbar.set_postfix_str(f"loss {batch_loss:.4e}")

                    val_loss = None
                    if update % hp.validation_frequency == 0:
                        val_loss = self._validate(update)
                        self._save_checkpoint(ckpt)
                    # The schedule is indexed by APPLIED updates (see the
                    # MultiSteps note at construction) — logging it at the
                    # micro-step count would show a value the optimizer
                    # never applies.
                    if self.metrics is not None:
                        self.metrics.log(
                            update, float(self.lr_schedule(update)),
                            batch_loss, val_loss,
                        )
            # Export the cross-stage weights artifact only on SUCCESSFUL
            # completion (this line is unreached on exceptions) — a
            # crashed/interrupted re-run must not overwrite a previous
            # good artifact with half-trained params; crash recovery is
            # the checkpoint's job, saved in the finally either way.
            completed = True
        finally:
            if profiling:
                import jax.profiler

                jax.profiler.stop_trace()
            params_host = self._save_checkpoint(ckpt)
            if ckpt is not None:
                ckpt.close()
            if completed:
                self._export_weights(params_host)
            if pbar is not None:
                pbar.close()

    def _save_checkpoint(self, ckpt: Optional[AsyncCheckpointer]):
        """Collective on all processes; coordinator writes. Returns the
        host params (see ``checkpoint.save_train_state``)."""
        return save_train_state(self.mesh, self.state, ckpt)

    def _export_weights(self, params_host=None) -> None:
        """Write the stage's params artifact into its weights.* slot
        (stage 1 -> weights.asr, stage 4 -> weights.yoho). Pass the host
        params from the final checkpoint save to skip a redundant
        cross-host gather of the same tree."""
        from yoho_tpu.train.checkpoint import save_params

        target = (self.config.weights.asr if self.stage == 1
                  else self.config.weights.yoho)
        if params_host is None:
            params_host = fetch_to_host(self.mesh, self.state.params)
        if self.metrics is not None:
            save_params(target, params_host)
