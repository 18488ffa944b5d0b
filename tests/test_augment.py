"""Augmentation pipeline tests (parity target: the reference's
audiomentations Compose, ``train/utils/augmenter.py:4-18``). Each
transform must be shape-preserving, finite, deterministic under a seeded
rng, and actually DO something (spectral or amplitude assertions from
first principles — no golden values from our own code)."""

import numpy as np
import pytest

from yoho_tpu.audio import augment as ag

SR = 16000


def _tone(freq=440.0, seconds=0.5, amp=0.3):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _band_power(x, lo, hi):
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / SR)
    return spec[(freqs >= lo) & (freqs < hi)].sum()


ALL_TRANSFORMS = [
    ag.add_gaussian_snr, ag.air_absorption, ag.aliasing, ag.band_pass,
    ag.band_stop, ag.clipping_distortion, ag.gain, ag.gain_transition,
    ag.peaking_filter, ag.pitch_shift,
]


@pytest.mark.parametrize("fn", ALL_TRANSFORMS, ids=lambda f: f.__name__)
def test_transform_contract(fn):
    """Shape-preserving, finite, deterministic, and not a no-op."""
    audio = _tone() + 0.01 * np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    a = fn(audio.copy(), SR, np.random.default_rng(7))
    b = fn(audio.copy(), SR, np.random.default_rng(7))
    assert a.shape == audio.shape
    assert a.dtype == np.float32
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)  # seeded rng -> deterministic
    assert not np.allclose(a, audio, atol=1e-7)  # it did something


def test_gaussian_snr_hits_requested_snr():
    audio = _tone(seconds=2.0)
    out = ag.add_gaussian_snr(audio, SR, np.random.default_rng(0),
                              min_snr_db=20.0, max_snr_db=20.0)
    noise = out - audio
    snr_db = 10 * np.log10(np.mean(audio**2) / np.mean(noise**2))
    assert 18.5 < snr_db < 21.5


def test_air_absorption_removes_highs_keeps_lows():
    audio = (_tone(300.0) + _tone(6000.0)).astype(np.float32)
    out = ag.air_absorption(audio, SR, np.random.default_rng(0),
                            min_distance=100.0, max_distance=100.0)
    assert _band_power(out, 5500, 6500) < 0.5 * _band_power(audio, 5500, 6500)
    assert _band_power(out, 200, 400) > 0.7 * _band_power(audio, 200, 400)


def test_band_stop_notches_center():
    audio = _tone(1000.0, seconds=1.0)
    out = ag.band_stop(audio, SR, np.random.default_rng(3),
                       min_center=1000.0, max_center=1000.0)
    assert _band_power(out, 900, 1100) < 0.6 * _band_power(audio, 900, 1100)


def test_clipping_distortion_clips():
    audio = _tone(amp=0.9)
    out = ag.clipping_distortion(audio, SR, np.random.default_rng(1))
    assert np.abs(out).max() <= np.abs(audio).max() + 1e-6
    # Clipping flattens the histogram tails: more samples AT the max.
    assert (np.abs(out) >= np.abs(out).max() - 1e-6).sum() > 10


def test_gain_is_pure_scale():
    audio = _tone()
    rng = np.random.default_rng(2)
    out = ag.gain(audio, SR, rng, min_gain_db=6.0, max_gain_db=6.0)
    np.testing.assert_allclose(out, audio * 10 ** (6 / 20), rtol=1e-5)


def test_pitch_shift_moves_fundamental():
    audio = _tone(440.0, seconds=1.0)
    out = ag.pitch_shift(audio, SR, np.random.default_rng(0),
                         min_semitones=4.0, max_semitones=4.0)
    # 4 semitones up: 440 -> ~554 Hz. Fundamental must move there.
    spec = np.abs(np.fft.rfft(out[SR // 4: -SR // 4].astype(np.float64)))
    freqs = np.fft.rfftfreq(len(out[SR // 4: -SR // 4]), 1 / SR)
    peak = freqs[np.argmax(spec)]
    # Tight band: the boundary-mismatch bug read ~535 Hz (60 cents
    # flat); the fixed phase vocoder lands within ~15 cents of 554.4.
    assert 540 < peak < 570, peak
    assert len(out) == len(audio)  # duration preserved (stretch + resample)


def test_augmenter_pipeline_contract():
    aug = ag.Augmenter()
    audio = _tone(seconds=1.0)
    out = aug(audio, SR, np.random.default_rng(0))
    assert out.shape == audio.shape and np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0 + 1e-6  # headroom normalization
    # compose_p gate: with p=0 the pipeline is the identity.
    silent = ag.Augmenter(compose_p=0.0)
    np.testing.assert_array_equal(silent(audio, SR, np.random.default_rng(0)),
                                  audio)
    # empty input passes through.
    assert len(aug(np.zeros(0, np.float32), SR, np.random.default_rng(0))) == 0
