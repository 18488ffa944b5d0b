"""Stage 4: joint transcription + voiceprint finetuning.

Fills the reference's empty ``transcription_voiceprints_finetune.py``
placeholder and completes the contract the dataloader set up: the decoder
emits speaker embeddings at ``<|voiceprint|>`` slots (which carry no CE
loss, ``dataloaders.py:211-217``), supervised here by the frozen stage-3
voiceprint encoder evaluated on each utterance's audio span.

Loss = masked next-token CE + lambda * mean(1 - cos(pred_vp, teacher_vp))
over valid utterances. Model init: stage-1 ASR weights when available.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from yoho_tpu.audio.frontend import yoho_log_mel
from yoho_tpu.core.config import SessionConfig
from yoho_tpu.nn.voiceprint import VoiceprintEncoder
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.text.tokenizer import YOHOTokenizer
from yoho_tpu.train.checkpoint import load_params
from yoho_tpu.train.trainer import ASRTrainer, masked_ce_loss


class JointTrainer(ASRTrainer):
    def __init__(self, config: SessionConfig, tokenizer: Optional[YOHOTokenizer] = None,
                 voiceprint_loss_weight: float = 1.0, mesh=None,
                 use_multiprocessing: bool = False):
        self.vp_weight = voiceprint_loss_weight
        tokenizer = tokenizer or YOHOTokenizer.load(config.weights.tokenizer)
        vp_dim = config.hyperparameters.voiceprint_finetune.embedding_dim

        # Frozen teacher: the stage-3 voiceprint encoder.
        self.teacher = VoiceprintEncoder(config.yoho, embedding_dim=vp_dim)
        t_template = jax.eval_shape(
            lambda: self.teacher.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, config.yoho.max_audio_len, config.yoho.n_mel_bands)),
                jnp.zeros((1, config.yoho.max_audio_len)),
            )["params"]
        )
        t_template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), t_template
        )
        teacher_params = load_params(config.weights.voiceprint, t_template)
        if teacher_params is None:
            raise FileNotFoundError(
                f"Stage 4 needs the stage-3 voiceprint artifact at "
                f"{config.weights.voiceprint}; run stage 3 first."
            )
        self.teacher_params = teacher_params

        model = YOHOModel(config.yoho, tokenizer.vocab_size, voiceprint_dim=vp_dim,
                          remat=config.hyperparameters.transcribe_finetune.remat)

        # Warm-start from the stage-1 ASR export when present.
        init_params = None
        asr_path = config.weights.asr
        if asr_path.exists():
            dummy_t = jnp.zeros((1, config.yoho.max_text_len), jnp.int32)
            dummy_m = jnp.zeros((1, config.yoho.max_audio_len,
                                 config.yoho.n_mel_bands), jnp.float32)
            template = jax.jit(
                lambda: model.init(jax.random.PRNGKey(0), dummy_t, dummy_m,
                                   method=YOHOModel.forward_with_voiceprints)
            )()["params"]
            # Stage-1 checkpoints may predate the voiceprint head size; load
            # leniently — missing/mismatched leaves keep their fresh init.
            try:
                init_params = load_params(asr_path, template)
            except (KeyError, ValueError):
                init_params = None

        super().__init__(
            config, tokenizer=tokenizer, stage=4,
            hp=config.hyperparameters.transcribe_finetune, mesh=mesh,
            use_multiprocessing=use_multiprocessing, model=model,
            init_params=init_params,
            dataloader_kwargs={"return_spans": True},
        )

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        super()._build_steps()  # keeps _val_loss/_decode_samples from stage 1
        model, cfg = self.model, self.config.yoho
        teacher, teacher_params = self.teacher, self.teacher_params
        vp_id = self.tokenizer.voiceprint_id
        vp_weight = self.vp_weight
        U = self.train_dataloader.max_utterances

        def loss_fn(params, mel, tokens, loss_mask, spans, span_valid):
            logits, vp_pred = model.apply(
                {"params": params}, tokens, mel,
                method=YOHOModel.forward_with_voiceprints,
            )
            ce = masked_ce_loss(logits, tokens, loss_mask)

            # Teacher embedding per utterance span (frozen).
            frame_pos = jnp.arange(cfg.max_audio_len) * cfg.stft_hop  # (T,)
            fmask = (
                (frame_pos[None, None, :] >= spans[:, :, 0:1])
                & (frame_pos[None, None, :] < spans[:, :, 1:2])
            ).astype(jnp.float32)  # (B, U, T)

            def one_utt(m_u):
                return teacher.apply({"params": teacher_params}, mel, m_u)

            teach = jax.vmap(one_utt, in_axes=1, out_axes=1)(fmask)  # (B, U, E)
            teach = jax.lax.stop_gradient(teach)

            # Student embedding: state at the position BEFORE the u-th
            # voiceprint token (the state that predicts the slot).
            vp_mask = (tokens == vp_id).astype(jnp.int32)  # (B, Ttxt)
            order = jnp.cumsum(vp_mask, axis=1) * vp_mask  # 1-based at slots
            losses = []
            for u in range(U):
                match = (order == u + 1).astype(vp_pred.dtype)  # (B, Ttxt)
                match_prev = jnp.pad(match[:, 1:], ((0, 0), (0, 1)))
                pred_u = jnp.einsum("bt,bte->be", match_prev, vp_pred)
                has = jnp.clip(match_prev.sum(axis=1), 0, 1)
                valid = span_valid[:, u].astype(pred_u.dtype) * has
                cos = jnp.sum(pred_u * teach[:, u], axis=-1)
                losses.append((1.0 - cos) * valid)
            losses = jnp.stack(losses, axis=1)  # (B, U)
            denom = jnp.maximum(jnp.sum(span_valid), 1.0)
            vp_loss = jnp.sum(losses) / denom
            return ce + vp_weight * vp_loss, (ce, vp_loss)

        def train_step(state, audio, tokens, loss_mask, spans, span_valid):
            mel = yoho_log_mel(audio.astype(jnp.float32), cfg)
            (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mel, tokens.astype(jnp.int32),
                loss_mask.astype(jnp.uint8), spans.astype(jnp.int32),
                span_valid.astype(jnp.float32),
            )
            return state.apply_gradients(grads=grads), loss

        self._train_step = jax.jit(train_step, donate_argnums=(0,))


def main(config: SessionConfig, max_updates=None,
         use_multiprocessing: bool = True) -> None:
    trainer = JointTrainer(config, use_multiprocessing=use_multiprocessing)
    trainer.run(max_updates=max_updates, progress=True)
