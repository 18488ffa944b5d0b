"""Stage-3 model: voiceprint (speaker-embedding) encoder + contrastive loss.

Implements the capability the reference reserved (empty
``voiceprint_encoder_contrastive_finetune.py``, weights slot
``config.py:51-57``): an audio encoder pooled into an L2-normalized
speaker embedding, trained with supervised NT-Xent (same-speaker clips are
positives). The trained embedding supervises the decoder's voiceprint head
in stage 4 and powers standalone speaker recognition.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.nn.yoho import YOHOAudioEncoder


class VoiceprintEncoder(nn.Module):
    cfg: YOHOConfig
    embedding_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # see YOHOAudioEncoder.remat

    def setup(self):
        self.encoder = YOHOAudioEncoder(self.cfg, dtype=self.dtype,
                                        remat=self.remat, name="encoder")
        self.proj = nn.Dense(self.embedding_dim, use_bias=False, dtype=self.dtype,
                             name="proj")

    def __call__(self, mel: jnp.ndarray,
                 time_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, T_mel, M) [+ optional (B, T_mel) frame mask] -> (B, E), L2=1.

        ``time_mask`` selects which mel frames belong to the utterance —
        stage 4 uses per-utterance spans over a shared spectrogram.
        """
        h = self.encoder(mel)  # (B, T_mel // 2, D)
        if time_mask is not None:
            m = time_mask.astype(h.dtype)
            # Pool mask to encoder rate (2 mel frames per position).
            t2 = h.shape[1]
            m = m[:, : 2 * t2].reshape(m.shape[0], t2, 2).max(axis=-1)
            denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            pooled = (h * m[:, :, None]).sum(axis=1) / denom
        else:
            pooled = h.mean(axis=1)
        e = self.proj(pooled)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)


def nt_xent_loss(embeddings: jnp.ndarray, speaker_ids: jnp.ndarray,
                 temperature: float = 0.07) -> jnp.ndarray:
    """Supervised NT-Xent: for each anchor, positives are other clips with
    the same speaker id; all non-self pairs are the denominator."""
    sim = embeddings @ embeddings.T / temperature  # (N, N)
    n = embeddings.shape[0]
    eye = jnp.eye(n, dtype=bool)
    pos = (speaker_ids[:, None] == speaker_ids[None, :]) & ~eye

    sim = jnp.where(eye, jnp.finfo(sim.dtype).min, sim)
    log_prob = jax.nn.log_softmax(sim, axis=1)
    pos_count = jnp.maximum(pos.sum(axis=1), 1)
    per_anchor = -(log_prob * pos).sum(axis=1) / pos_count
    has_pos = pos.any(axis=1)
    return jnp.where(has_pos, per_anchor, 0.0).sum() / jnp.maximum(has_pos.sum(), 1)
