"""Compressed-audio codec tests (FLAC own codec; mp3/ogg system bindings).

Parity target: the reference decodes compressed corpora through ffmpeg
(``yoho/src/preprocessing/audio.py:11-18``) and benchmarks mp3/m4a/opus
decode (``experiments/decoding_benchmark.py:50-70``). Here the FLAC codec
is fully owned (encode + two decoders) and mp3/ogg decode binds the system
codec libraries in-process; golden values come from pygame/SDL, an
independent third-party decoder.
"""

import numpy as np
import pytest

from yoho_tpu.audio.flac import decode_flac, encode_flac
from yoho_tpu.audio.io import load_audio, load_audio_f32, save_audio


def _sig(n, nch=1, bps=16, seed=0):
    g = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    # Correlated signal (sinusoid + noise) so LPC/fixed predictors engage.
    t = np.arange(n)[:, None] / 97.0
    x = 0.6 * np.sin(2 * np.pi * t * (1 + np.arange(nch))) + 0.05 * g.standard_normal((n, nch))
    return np.clip(x * (lim - 1), -lim, lim - 1).astype(np.int64)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("bps", [8, 16, 24])
def test_flac_roundtrip_exact(nch, bps, use_native):
    """Both encoders (C++ fast path / pure-Python spec) x both decoders,
    sample-exact."""
    from yoho_tpu.native import flac_decode_native, get_lib

    if use_native and get_lib() is None:
        pytest.skip("native toolchain unavailable")
    x = _sig(10000, nch, bps, seed=bps + nch)
    blob = encode_flac(x, 16000, bps=bps, use_native=use_native)
    pcm, sr, got_bps = decode_flac(blob)
    assert (sr, got_bps) == (16000, bps)
    np.testing.assert_array_equal(pcm, x)
    if get_lib() is not None:
        n_pcm, n_sr, n_bps = flac_decode_native(blob)
        np.testing.assert_array_equal(n_pcm, x)


def test_flac_roundtrip_noise_and_constant():
    # Noise forces verbatim/escape paths; constants force the constant subframe.
    g = np.random.default_rng(7)
    noise = g.integers(-32768, 32768, size=(5000, 2))
    const = np.full((5000, 2), -123)
    for x in (noise, const, np.zeros((1, 1), np.int64)):
        pcm, sr, bps = decode_flac(encode_flac(x, 44100))
        np.testing.assert_array_equal(pcm, x)


def test_flac_native_matches_python():
    from yoho_tpu.native import flac_decode_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    x = _sig(30000, 2, 16, seed=3)
    blob = encode_flac(x, 22050)
    native = flac_decode_native(blob)
    assert native is not None
    n_pcm, n_sr, n_bps = native
    p_pcm, p_sr, p_bps = decode_flac(blob)
    assert (n_sr, n_bps) == (p_sr, p_bps) == (22050, 16)
    np.testing.assert_array_equal(n_pcm, p_pcm)
    np.testing.assert_array_equal(n_pcm, x)


def test_flac_native_rejects_corrupt():
    from yoho_tpu.native import flac_decode_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    blob = bytearray(encode_flac(_sig(4096), 16000))
    blob[len(blob) // 2] ^= 0xFF  # flip bits inside a frame -> CRC16 fails
    with pytest.raises(ValueError):
        flac_decode_native(bytes(blob))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def _pygame_decode(path, frequency=16000):
    """Independent golden decode via pygame/SDL -> mono float32 or None."""
    import os

    try:
        import pygame
    except ImportError:
        return None
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=frequency, size=-16, channels=1)
    try:
        snd = pygame.mixer.Sound(str(path))
        return pygame.sndarray.array(snd).reshape(-1).astype(np.float32)
    except Exception:
        return None
    finally:
        pygame.mixer.quit()


def _aligned_corr(a, b, max_lag=4000):
    """Best-lag Pearson correlation of two 1-D signals (two-sided search)."""
    n = min(len(a), len(b)) - 2 * max_lag
    assert n > 1000
    best = -1.0
    ac = a - a.mean()
    bc = b - b.mean()
    for lag in range(-max_lag, max_lag + 1, 4):
        x = ac[max_lag : max_lag + n]
        y = bc[max_lag + lag : max_lag + lag + n]
        denom = np.sqrt((x * x).sum() * (y * y).sum())
        if denom > 0:
            best = max(best, float((x * y).sum() / denom))
    return best


def test_flac_encoder_validated_by_independent_decoder(tmp_path):
    x = _sig(16000, 1, 16, seed=11).astype(np.int32)
    path = tmp_path / "v.flac"
    path.write_bytes(encode_flac(x, 16000))
    golden = _pygame_decode(path)
    if golden is None:
        pytest.skip("pygame/SDL cannot decode FLAC here")
    np.testing.assert_array_equal(golden[: len(x)], x[:, 0].astype(np.int16))


def test_load_audio_flac_contract(tmp_path):
    # int16 contract + resample, through the full load_audio dispatch.
    t = np.arange(32000) / 32000.0
    sig = np.sin(2 * np.pi * 440 * t)
    pcm = np.clip(sig * 32000, -32768, 32767).astype(np.int64)[:, None]
    path = tmp_path / "t.flac"
    path.write_bytes(encode_flac(pcm, 32000))
    out = load_audio(path, 16000)
    assert out.dtype == np.int16
    assert abs(len(out) - 16000) <= 2
    spec = np.abs(np.fft.rfft(out.astype(np.float32)))
    assert abs(np.argmax(spec) - 440) <= 2


def test_save_audio_flac_roundtrip(tmp_path):
    g = np.random.default_rng(5)
    wav = np.clip(0.3 * g.standard_normal(8000), -0.99, 0.99).astype(np.float32)
    path = save_audio(wav, tmp_path / "x.flac", 16000)
    assert path.suffix == ".flac"
    back = load_audio_f32(path, 16000)
    np.testing.assert_allclose(back, wav, atol=2.0 / 32768.0)  # int16 quantization only


def _fixture(name):
    import os

    import pygame

    return os.path.join(os.path.dirname(pygame.__file__), "examples", "data", name)


def test_mp3_decode_matches_independent_decoder():
    from yoho_tpu.audio import codecs

    if not codecs.mp3_available():
        pytest.skip("libmpg123 unavailable")
    path = _fixture("house_lo.mp3")
    decoded = codecs.decode_mp3(path)
    assert decoded is not None
    pcm, sr = decoded
    assert pcm.dtype == np.int16 and pcm.ndim == 2 and sr > 0
    mono = pcm.astype(np.float32).mean(axis=1)
    golden = _pygame_decode(path, frequency=sr)
    if golden is None:
        pytest.skip("pygame/SDL cannot decode mp3 here")
    # Different decoders may disagree on codec-delay trimming; align by
    # cross-correlation then require near-identity.
    assert _aligned_corr(mono, golden) > 0.99


def test_ogg_decode_matches_independent_decoder():
    from yoho_tpu.audio import codecs

    if not codecs.ogg_available():
        pytest.skip("libvorbisfile unavailable")
    path = _fixture("house_lo.ogg")
    decoded = codecs.decode_ogg(path)
    assert decoded is not None
    pcm, sr = decoded
    assert pcm.dtype == np.int16 and pcm.ndim == 2 and sr > 0
    mono = pcm.astype(np.float32).mean(axis=1)
    golden = _pygame_decode(path, frequency=sr)
    if golden is None:
        pytest.skip("pygame/SDL cannot decode ogg here")
    assert _aligned_corr(mono, golden) > 0.99


def test_load_audio_mp3_end_to_end():
    from yoho_tpu.audio import codecs

    if not codecs.mp3_available():
        pytest.skip("libmpg123 unavailable")
    out = load_audio(_fixture("house_lo.mp3"), 16000)
    assert out.dtype == np.int16 and len(out) > 16000
    assert np.abs(out.astype(np.int32)).max() > 1000  # real signal, not silence


# ---------------------------------------------- libav universal decode
def test_av_decode_matches_codec_bindings():
    """The in-process libav fallback (native/avdecode.cpp) agrees with
    the dedicated mpg123 binding on the same mp3."""
    from yoho_tpu.audio import codecs
    from yoho_tpu.audio.io import resample
    from yoho_tpu.native import av_decode_native, get_av_lib

    if get_av_lib() is None:
        pytest.skip("system libav unavailable")
    if not codecs.mp3_available():
        pytest.skip("libmpg123 unavailable")
    path = _fixture("house_lo.mp3")
    pcm, sr = codecs.decode_mp3(path)
    ours = resample(pcm.astype(np.float32).mean(axis=1) / 32768.0, sr, 16000)
    av = av_decode_native(path, 16000)
    assert av is not None and av.dtype == np.int16
    assert _aligned_corr(ours, av.astype(np.float32) / 32768.0,
                         max_lag=2000) > 0.99


def test_av_decode_rejects_garbage(tmp_path):
    from yoho_tpu.native import av_decode_native, get_av_lib

    if get_av_lib() is None:
        pytest.skip("system libav unavailable")
    bad = tmp_path / "x.m4a"
    bad.write_bytes(b"\x00" * 256)
    with pytest.raises(ValueError):
        av_decode_native(bad, 16000)


def test_m4a_save_load_roundtrip(tmp_path):
    """save_audio writes real AAC/.m4a in-process and load_audio reads it
    back — the reference's mp4 target with no ffmpeg binary anywhere."""
    from yoho_tpu.native import get_av_lib

    if get_av_lib() is None:
        pytest.skip("system libav unavailable")
    t = np.arange(32000) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = save_audio(sig, tmp_path / "tone.m4a", 16000)
    assert p.suffix == ".m4a" and p.stat().st_size > 1000
    back = load_audio_f32(p, 16000)
    # AAC is lossy with codec delay: align, then require high fidelity
    # and the exact spectral peak.
    assert _aligned_corr(sig, back, max_lag=3000) > 0.98
    spec = np.abs(np.fft.rfft(back[:16000]))
    assert abs(int(np.argmax(spec)) - 440) <= 1

    # Reference parity: any non-wav suffix produces an .mp4 container.
    p2 = save_audio(sig, tmp_path / "clip.webm", 16000)
    assert p2.suffix == ".mp4"
    assert _aligned_corr(sig, load_audio_f32(p2, 16000), max_lag=3000) > 0.98


def test_flac_32bps_roundtrip():
    """Full-range 32-bit samples (independent stereo; side modes are
    encoder-gated at bps=32) survive both decoders — exercises the
    64-bit residual/sample paths."""
    from yoho_tpu.native import flac_decode_native, get_lib

    g = np.random.default_rng(21)
    x = g.integers(-(2**31), 2**31, size=(4096 + 777, 2), dtype=np.int64)
    x[:64] = [[-(2**31), 2**31 - 1]] * 64  # extremes
    blob = encode_flac(x, 48000, bps=32)
    pcm, sr, bps = decode_flac(blob)
    assert (sr, bps) == (48000, 32)
    np.testing.assert_array_equal(pcm, x)
    if get_lib() is not None:
        n_pcm, _, n_bps = flac_decode_native(blob)
        assert n_bps == 32
        np.testing.assert_array_equal(n_pcm, x)
