import numpy as np
import pytest

from yoho_tpu.audio.io import _read_wav, load_audio, load_audio_f32, resample, save_audio


def _write_wav(path, data_f32, sr, channels=1):
    import wave

    pcm = np.clip(data_f32 * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_wav_roundtrip(tmp_path):
    g = np.random.default_rng(0)
    wav = np.clip(0.3 * g.standard_normal(16000), -0.99, 0.99).astype(np.float32)
    path = tmp_path / "x.wav"
    save_audio(wav, path, 16000)
    back = load_audio_f32(path, 16000)
    assert back.shape == wav.shape
    np.testing.assert_allclose(back, wav, atol=2.0 / 32768.0)


def test_load_audio_int16_contract(tmp_path):
    # Same contract as reference load_audio (audio.py:11-18): int16, unscaled.
    path = tmp_path / "x.wav"
    _write_wav(path, np.ones(100, np.float32) * 0.25, 16000)
    out = load_audio(path, 16000)
    assert out.dtype == np.int16
    assert abs(int(out[0]) - 8192) <= 1


def test_load_audio_resamples(tmp_path):
    t = np.arange(32000) / 32000.0
    sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    path = tmp_path / "hi.wav"
    _write_wav(path, sig, 32000)
    out = load_audio_f32(path, 16000)
    assert abs(len(out) - 16000) <= 2
    # Spectral peak survives resampling.
    spec = np.abs(np.fft.rfft(out))
    assert abs(np.argmax(spec) - 440) <= 2


def test_stereo_mixdown(tmp_path):
    left = np.ones(100, np.float32) * 0.5
    right = np.zeros(100, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    path = tmp_path / "st.wav"
    _write_wav(path, inter, 16000, channels=2)
    mono, sr = _read_wav(path)
    assert sr == 16000 and len(mono) == 100
    np.testing.assert_allclose(mono, 0.25, atol=1e-3)


def test_npy_loading(tmp_path):
    arr = (np.arange(100) - 50).astype(np.int16)
    path = tmp_path / "a.npy"
    np.save(path, arr)
    out = load_audio(path, 16000)
    np.testing.assert_array_equal(out, arr)


def test_native_wav_matches_python(tmp_path):
    from yoho_tpu.native import get_lib, wav_decode_native

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    g = np.random.default_rng(3)
    wav = (0.3 * g.standard_normal(12345)).astype(np.float32)
    path = tmp_path / "n.wav"
    _write_wav(path, wav, 22050)
    native = wav_decode_native(path)
    assert native is not None
    n_data, n_sr = native
    p_data, p_sr = _read_wav(path)
    assert n_sr == p_sr == 22050
    np.testing.assert_allclose(n_data, p_data, atol=1e-7)


def test_resample_identity():
    x = np.ones(100, np.float32)
    assert resample(x, 16000, 16000) is x
