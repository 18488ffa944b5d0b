"""Stage-2 model: voice-reconstruction Transformer VAE.

The reference reserves this capability (empty
``train/stages/voice_reconstruction_pretrain.py``, README roadmap,
config/weights slots ``train/utils/config.py:37-48``) — this implements the
intent: self-supervised pretraining of the audio encoder by reconstructing
the log-mel spectrogram through a variational bottleneck. The trained
encoder seeds stage 3 (voiceprint) and provides a strong init for ASR.

Architecture: YOHO audio encoder -> per-frame (mu, logvar) -> sampled z ->
projection -> transformer blocks -> 2x temporal upsample -> mel frames.
All static shapes; loss = masked MSE + beta * KL.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.nn.layers import maybe_remat
from yoho_tpu.nn.yoho import YOHOAudioEncoder, YOHOEncoderBlock


class VoiceReconstructionVAE(nn.Module):
    cfg: YOHOConfig
    latent_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # see YOHOAudioEncoder.remat

    def setup(self):
        c = self.cfg
        d = self.dtype
        self.encoder = YOHOAudioEncoder(c, dtype=d, remat=self.remat,
                                        name="encoder")
        self.to_mu = nn.Dense(self.latent_dim, dtype=d, name="to_mu")
        self.to_logvar = nn.Dense(self.latent_dim, dtype=d, name="to_logvar")
        self.from_latent = nn.Dense(c.dims, dtype=d, name="from_latent")
        dec_cls = maybe_remat(YOHOEncoderBlock, self.remat)
        self.decoder_blocks = [
            dec_cls(c.n_audio_heads, max(1, c.n_audio_heads // 2), c.dims,
                    dtype=d, name=f"dec_blocks_{i}")
            for i in range(max(1, c.n_audio_blocks // 2))
        ]
        self.ln = nn.RMSNorm(dtype=d, name="ln")
        self.to_mel = nn.Dense(c.n_mel_bands, dtype=d, name="to_mel")

    def encode(self, mel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.encoder(mel)
        return self.to_mu(h), self.to_logvar(h)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.from_latent(z)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.ln(x)
        # Upsample time 2x back to mel frame rate (encoder pooled once).
        x = jnp.repeat(x, 2, axis=1)
        return self.to_mel(x)

    def __call__(self, mel: jnp.ndarray, rng: jax.Array):
        """-> (reconstruction, mu, logvar); reparameterized sampling."""
        mu, logvar = self.encode(mel)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        recon = self.decode(z)
        return recon, mu, logvar


def vae_loss(recon, mel, mu, logvar, kl_weight: float):
    """Masked-free MSE over all frames + mean KL to N(0, I)."""
    mse = jnp.mean((recon - mel) ** 2)
    kl = -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))
    return mse + kl_weight * kl, (mse, kl)
