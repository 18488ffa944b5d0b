"""Pallas kernel tests (interpreter mode on CPU — identical code path to
TPU modulo the compiler)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.audio.frontend import (
    log_mel_spectrogram,
    whisper_log_mel,
    yoho_log_mel,
)
from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.ops.flash_attention import _attention_reference, flash_attention
from yoho_tpu.ops.mel_kernel import (
    fused_log_mel,
    fused_whisper_log_mel,
    fused_yoho_log_mel,
)


# ------------------------------------------------------------ flash attention
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(256, 256), (300, 300), (128, 384)])
def test_flash_attention_matches_reference(causal, tq, tk):
    if causal and tq != tk:
        pytest.skip("causal requires square")
    g = np.random.default_rng(0)
    b, h, d = 2, 2, 64
    q = jnp.asarray(g.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, tk, h, d)).astype(np.float32))

    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)

    scale = 1.0 / np.sqrt(d)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    ref = _attention_reference(qf, kf, vf, causal, scale)
    ref = ref.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grad_matches_reference():
    g = np.random.default_rng(1)
    b, t, h, d = 1, 128, 2, 32
    q = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128,
                                       block_k=128) ** 2)

    def f_ref(q, k, v):
        scale = 1.0 / np.sqrt(d)
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        out = _attention_reference(qf, kf, vf, True, scale)
        return jnp.sum(out ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


# ------------------------------------------------------------------ fused mel
def test_fused_log_mel_whisper_matches_xla():
    g = np.random.default_rng(2)
    audio = (0.2 * g.standard_normal((2, 48_000))).astype(np.float32)
    fused = fused_log_mel(jnp.asarray(audio), convention="whisper",
                          mel_scale="slaney", log_floor=1e-10, tile_f=100)
    xla = log_mel_spectrogram(
        jnp.asarray(audio), sample_rate=16000, n_fft=400, hop=160, n_mels=80,
        mel_scale="slaney", convention="whisper", log_floor=1e-10,
    )
    assert fused.shape == xla.shape == (2, 300, 80)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-4, atol=1e-4)


def test_fused_log_mel_scipy_matches_xla():
    cfg = YOHOConfig(n_mel_bands=32, max_audio_len=128)
    g = np.random.default_rng(3)
    audio = (0.2 * g.standard_normal((1, cfg.n_samples))).astype(np.float32)
    fused = fused_yoho_log_mel(jnp.asarray(audio), cfg)
    xla = yoho_log_mel(jnp.asarray(audio), cfg)
    assert fused.shape == xla.shape == (1, 128, 32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-3, atol=2e-3)


def test_fused_whisper_normalized_matches_xla():
    g = np.random.default_rng(4)
    audio = (0.1 * g.standard_normal((1, 480_000))).astype(np.float32)
    fused = fused_whisper_log_mel(jnp.asarray(audio))
    xla = whisper_log_mel(jnp.asarray(audio))
    assert fused.shape == xla.shape == (1, 3000, 80)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-3, atol=2e-3)
