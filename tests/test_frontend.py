"""Golden-value tests for the audio frontend (SURVEY.md §4 test plan).

Oracles: scipy/jax.scipy STFT for the reference convention, transformers'
WhisperFeatureExtractor (independent numpy implementation of the OpenAI
frontend) for the Whisper convention.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yoho_tpu.audio.filters import mel_filter_bank
from yoho_tpu.audio.frontend import (
    n_frames_scipy,
    normalize_standardize,
    stft_power,
    whisper_log_mel,
    yoho_log_mel,
)
from yoho_tpu.core.config import YOHOConfig


@pytest.fixture(scope="module")
def audio(rng=None):
    g = np.random.default_rng(42)
    t = np.arange(164_080) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * g.standard_normal(t.shape)
    return sig.astype(np.float32)


def test_frame_count_identities():
    # The two identities verified in SURVEY.md §6.
    assert n_frames_scipy(164_080, 400, 160) == 1024
    assert n_frames_scipy(480_000, 400, 160) == 2999


def test_mel_filterbank_htk_matches_reference_math():
    # Independent re-derivation in float64 of the reference construction
    # (yoho/src/preprocessing/mel_filterbanks.py:22-42): HTK scale points,
    # triangular ramps, Slaney norm.
    sr, n_fft, n_mels = 16000, 400, 128
    got = mel_filter_bank(sr, n_fft, n_mels, mel_scale="htk")

    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    mel_pts = np.linspace(0.0, 2595.0 * np.log10(1.0 + (sr / 2) / 700.0), n_mels + 2)
    hz = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    expected = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = (fftfreqs - hz[i]) / (hz[i + 1] - hz[i])
        upper = (hz[i + 2] - fftfreqs) / (hz[i + 2] - hz[i + 1])
        expected[i] = np.maximum(0, np.minimum(lower, upper))
    expected *= (2.0 / (hz[2:] - hz[:-2]))[:, None]

    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)
    assert got.shape == (n_mels, 201)


def test_mel_filterbank_slaney_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    got = mel_filter_bank(16000, 400, 80, mel_scale="slaney")
    expected = hf_mel(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (n_freqs, n_mels)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)


def test_stft_power_matches_jax_scipy(audio):
    """Matmul-DFT STFT == jax.scipy.signal.stft (the reference's exact op,
    yoho/src/preprocessing/audio.py:33) with boundary=None."""
    import jax.scipy.signal as jss

    ours = stft_power(audio[None, :], 400, 160, convention="scipy")[0]
    _, _, Z = jss.stft(audio, nperseg=400, noverlap=400 - 160, boundary=None)
    theirs = (np.abs(np.asarray(Z)) ** 2).T  # (freq, time) -> (time, freq)
    assert ours.shape == theirs.shape == (1024, 201)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=1e-10)


def test_stft_power_matches_scipy_cpu(audio):
    import scipy.signal as ss

    ours = np.asarray(stft_power(audio[None, :], 400, 160, convention="scipy")[0])
    _, _, Z = ss.stft(audio.astype(np.float64), nperseg=400, noverlap=240, boundary=None)
    theirs = (np.abs(Z) ** 2).T
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-10)


def test_yoho_log_mel_matches_reference_chain(audio):
    """End-to-end: our fused chain == reference mel_spectogram +
    normalize_spectogram recomputed with jax.scipy ops."""
    import jax.scipy.signal as jss

    cfg = YOHOConfig()
    ours = np.asarray(yoho_log_mel(audio[None, :], cfg))[0]

    Z = jss.stft(audio, nperseg=cfg.n_fft, noverlap=cfg.n_fft - cfg.stft_hop, boundary=None)[-1]
    mag = jnp.abs(Z) ** 2  # (freq, time)
    filt = mel_filter_bank(cfg.sample_rate, cfg.n_fft, cfg.n_mel_bands, mel_scale="htk")
    spec = jnp.einsum("ij,jk->ki", filt, mag)  # (time, mel), reference layout
    ref = np.asarray(normalize_standardize(jnp.log10(jnp.maximum(spec, 1e-13))))

    assert ours.shape == ref.shape == (1024, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_whisper_log_mel_matches_transformers():
    """Whisper convention == HF WhisperFeatureExtractor (numpy oracle)."""
    from transformers import WhisperFeatureExtractor

    g = np.random.default_rng(7)
    wav = (0.3 * g.standard_normal(480_000)).astype(np.float32)

    fe = WhisperFeatureExtractor(feature_size=80)
    expected = fe(wav, sampling_rate=16000, return_tensors="np", padding=False)
    expected = expected["input_features"][0].T  # (mel, time) -> (time, mel)

    ours = np.asarray(whisper_log_mel(wav[None, :]))[0]
    assert ours.shape == expected.shape == (3000, 80)
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=2e-4)


def test_normalize_standardize_guard():
    silent = jnp.zeros((1, 16, 8))
    out = normalize_standardize(silent)
    assert np.all(np.isfinite(np.asarray(out)))


def test_log_mel_rejects_wrong_rank():
    """The public frontends take (batch, n_samples) only: wrong-rank audio
    must raise instead of silently broadcasting into a garbage spectrogram
    (found by an end-to-end error probe; 4-D input used to come back as a
    5-D "mel")."""
    for bad in (np.zeros(1600, np.float32), np.zeros((2, 3, 1600), np.float32)):
        with pytest.raises(ValueError, match="batch, n_samples"):
            whisper_log_mel(bad)
        with pytest.raises(ValueError, match="batch, n_samples"):
            yoho_log_mel(bad, YOHOConfig())
