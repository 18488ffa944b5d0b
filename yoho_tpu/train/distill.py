"""Whisper knowledge distillation: train a small same-vocab draft model.

Speculative decoding (``infer/speculative.py``) needs a draft that
agrees with the target model — acceptance rate IS the speedup. Public
small checkpoints only match public big ones; the moment a model is
fine-tuned (``yoho finetune``) its matched draft has to be *made*. This
module closes that loop: ``yoho distill`` trains a small Whisper
(random-init preset or an existing small checkpoint) against a frozen
teacher with a temperature-scaled KL + CE blend, reports masked argmax
agreement (a direct proxy for speculative acceptance), and exports an HF
checkpoint dir ready for ``yoho serve --draft-hf``.

No reference counterpart (its Whisper integration is inference-only,
``yoho/src/nn/whisper.py``); the trainer reuses the fine-tune machinery
(``train/whisper_finetune.py``) — same dataloader, mesh-DP jitted step,
provenance-guarded resume.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from yoho_tpu.audio.frontend import whisper_log_mel
from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.parallel.sharding import WHISPER_RULES, shard_params
from yoho_tpu.train.trainer import masked_ce_loss
from yoho_tpu.train.whisper_finetune import WhisperFinetuner


def distill_kl_loss(t_logits, s_logits, loss_mask, tau: float):
    """Masked KL(teacher || student) at temperature ``tau``, aligned with
    :func:`masked_ce_loss`'s next-token shift (position i's loss covers
    predicting token i+1), scaled by tau^2 (Hinton et al.) so gradients
    keep magnitude as tau grows."""
    t = jax.nn.log_softmax(t_logits[:, :-1].astype(jnp.float32) / tau)
    s = jax.nn.log_softmax(s_logits[:, :-1].astype(jnp.float32) / tau)
    per_pos = jnp.sum(jnp.exp(t) * (t - s), axis=-1)
    mask = loss_mask[:, 1:].astype(per_pos.dtype)
    return tau * tau * jnp.sum(per_pos * mask) / jnp.maximum(
        jnp.sum(mask), 1.0)


class WhisperDistiller(WhisperFinetuner):
    """Train ``student`` to match a frozen ``teacher`` on an SRT corpus.

    Loss = ``alpha * CE(labels) + (1 - alpha) * KL(teacher||student)``.
    The teacher runs its own mel frontend (teacher and student may use
    different ``n_mels`` — e.g. large-v3's 128 vs tiny's 80); both are
    teacher-forced on the ground-truth target tokens, so teacher and
    student distributions are compared at identical positions.
    """

    def __init__(self, teacher_cfg: WhisperConfig, teacher_params,
                 student_cfg: WhisperConfig, student_params, table,
                 data_dir, out_dir, *, alpha: float = 0.5, tau: float = 2.0,
                 **kwargs):
        if teacher_cfg.n_vocab != student_cfg.n_vocab:
            raise ValueError(
                f"teacher vocab {teacher_cfg.n_vocab} != student vocab "
                f"{student_cfg.n_vocab} — speculative verify compares "
                "token ids, so the draft must share the tokenizer")
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        if kwargs.get("lora_rank"):
            raise ValueError(
                "LoRA adapts a PRETRAINED base; the distilled student "
                "starts from random init, so every weight must train — "
                "use --lora with `yoho finetune` instead")
        if tau <= 0:
            raise ValueError(
                f"tau must be > 0, got {tau} — log_softmax(logits/tau) "
                "would NaN the loss on the first step")
        if teacher_cfg.n_mels != student_cfg.n_mels:
            import warnings

            warnings.warn(
                f"student n_mels {student_cfg.n_mels} != teacher "
                f"{teacher_cfg.n_mels}: distillation itself handles "
                "distinct frontends, but the speculative Transcriber "
                "feeds ONE shared mel to both models — this draft will "
                "not plug into `serve --draft-hf`.", stacklevel=2)
        # _build_steps (called by the parent constructor) needs these.
        self.teacher_cfg = teacher_cfg
        self._teacher_host_params = teacher_params
        self.alpha = float(alpha)
        self.tau = float(tau)
        self.last_agreement = None
        super().__init__(student_cfg, student_params, table, data_dir,
                         out_dir, **kwargs)

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        super()._build_steps()  # student val-loss + validation decode
        student, s_cfg = self.model, self.cfg
        t_cfg = self.teacher_cfg
        teacher = Whisper(t_cfg, dtype=self.compute_dtype)
        t_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32),
            self._teacher_host_params)
        # Replicated on the DP mesh; passed as an ARGUMENT (not a closure
        # constant) so the compiled program doesn't embed ~teacher-sized
        # literals (CLAUDE.md: closures re-ship per compile through the
        # relay).
        self._t_params = shard_params(t_params, self.mesh, WHISPER_RULES)
        self._teacher_host_params = None  # free the host copy

        mel_s = partial(whisper_log_mel, n_mels=s_cfg.n_mels,
                        sample_rate=s_cfg.sample_rate, n_fft=s_cfg.n_fft,
                        hop=s_cfg.hop_length)
        mel_t = partial(whisper_log_mel, n_mels=t_cfg.n_mels,
                        sample_rate=t_cfg.sample_rate, n_fft=t_cfg.n_fft,
                        hop=t_cfg.hop_length)
        alpha, tau = self.alpha, self.tau

        def distill_step(state, t_params, audio, tokens, loss_mask):
            audio = audio.astype(jnp.float32)
            tokens = tokens.astype(jnp.int32)
            loss_mask = loss_mask.astype(jnp.uint8)
            t_logits = jax.lax.stop_gradient(
                teacher.apply({"params": t_params}, mel_t(audio), tokens))

            def loss_fn(p):
                s_logits = student.apply({"params": p}, mel_s(audio), tokens)
                ce = masked_ce_loss(s_logits, tokens, loss_mask)
                kl = distill_kl_loss(t_logits, s_logits, loss_mask, tau)
                return alpha * ce + (1.0 - alpha) * kl

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        jitted = jax.jit(distill_step, donate_argnums=(0,))
        self._train_step = (
            lambda state, *batch: jitted(state, self._t_params, *batch))

        def agreement(s_params, t_params, audio, tokens, loss_mask):
            """Masked next-token argmax agreement — a direct proxy for
            speculative acceptance with this (teacher, draft) pair."""
            audio = audio.astype(jnp.float32)
            tokens = tokens.astype(jnp.int32)
            t_logits = teacher.apply({"params": t_params}, mel_t(audio),
                                     tokens)
            s_logits = student.apply({"params": s_params}, mel_s(audio),
                                     tokens)
            same = (jnp.argmax(t_logits[:, :-1], -1)
                    == jnp.argmax(s_logits[:, :-1], -1))
            mask = loss_mask[:, 1:].astype(jnp.float32)
            return jnp.sum(same * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        self._agreement = jax.jit(agreement)

    # ------------------------------------------------------------------
    def _validate(self, update: int) -> float:
        val_loss = super()._validate(update)
        batch = self._last_val_batch  # same batch as val_loss
        self.last_agreement = float(self._agreement(
            self.state.params, self._t_params,
            *self._place_batch(batch[:3])))
        if self.metrics is not None:  # coordinator-only, like all writers
            print(f"[distill] update {update}: teacher-agreement "
                  f"{self.last_agreement:.3f} (projected speculative "
                  "acceptance)", flush=True)
        return val_loss

    # ------------------------------------------------------------------
    def export(self):
        """Student params as an HF dir; tokenizer files come from the
        TEACHER checkpoint (src_dir) but config.json must describe the
        student architecture, so it is always synthesized."""
        from yoho_tpu.nn.export import export_hf_whisper
        from yoho_tpu.parallel.mesh import fetch_to_host

        params = fetch_to_host(self.mesh, self.state.params)
        if self.metrics is None:
            return self.out_dir  # non-coordinator: participated in the gather
        return export_hf_whisper(params, self.cfg, self.out_dir,
                                 src_dir=self.src_dir, copy_config=False)
