"""On-device audio frontend: framing -> window -> DFT -> power -> mel -> log.

TPU-first design: the STFT is expressed as two small matmuls (frame matrix x
DFT cosine/sine bases, then power x mel filterbank) so the whole frontend
lands on the MXU and fuses under jit — no FFT butterflies, no dynamic shapes.
A fused Pallas kernel for the same computation lives in
``yoho_tpu.ops.mel_kernel``; this module is the reference XLA path and the
numerics oracle.

Two framing/scaling conventions are supported:

* ``convention="scipy"``  — matches ``jax.scipy.signal.stft(...,
  boundary=None, padded=True)`` exactly (periodic Hann, end zero-padding,
  1/sum(window) amplitude scaling). This is the reference YOHO frontend
  (``yoho/src/preprocessing/audio.py:32-37``): 164,080 samples -> 1024
  frames; 480,000 -> 2999 frames.
* ``convention="whisper"`` — matches OpenAI Whisper / HF
  WhisperFeatureExtractor (center=True, reflect padding, unscaled, last
  frame dropped): 480,000 samples -> 3000 frames.

Output layout is time-major ``(batch, frames, mels)`` like the reference
(``audio.py:36`` einsum emits (batch, time, mel)).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.audio.filters import mel_filter_bank


@lru_cache(maxsize=None)
def _hann_periodic(n_fft: int) -> np.ndarray:
    # scipy.signal.get_window("hann", n, fftbins=True) == periodic Hann,
    # also what torch.hann_window / OpenAI Whisper use.
    k = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n_fft)).astype(np.float32)


@lru_cache(maxsize=None)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cosine/sine bases, each (n_fft, n_fft//2 + 1), float32."""
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def n_frames_scipy(n_samples: int, n_fft: int, hop: int) -> int:
    """Frame count of scipy stft with boundary=None, padded=True."""
    return int(np.ceil(max(n_samples - n_fft, 0) / hop)) + 1


def _frame(audio: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """Gather overlapping frames: (..., samples) -> (..., num_frames, n_fft).

    The caller guarantees the audio is long enough (padded) for all frames.
    """
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # static (T, n_fft)
    return jnp.take(audio, jnp.asarray(idx), axis=-1)


def stft_power(
    audio: jnp.ndarray,
    n_fft: int,
    hop: int,
    convention: str = "scipy",
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2, shape (..., frames, n_fft//2 + 1).

    f32 in, f32 out. See module docstring for the two conventions.
    """
    audio = jnp.asarray(audio, jnp.float32)
    n_samples = audio.shape[-1]
    win = jnp.asarray(_hann_periodic(n_fft))

    if convention == "scipy":
        num_frames = n_frames_scipy(n_samples, n_fft, hop)
        pad = (num_frames - 1) * hop + n_fft - n_samples
        if pad > 0:
            audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
        frames = _frame(audio, n_fft, hop, num_frames)
        scale = 1.0 / float(_hann_periodic(n_fft).sum())  # scipy scaling="spectrum"
    elif convention == "whisper":
        half = n_fft // 2
        if n_samples <= max(half, hop):
            # reflect padding needs width < axis size, and the whisper
            # frame count n_samples // hop needs at least one hop of
            # audio: zero-extend tiny inputs (a public entry point must
            # not crash on a sub-200-sample clip).
            grow = max(half + 1, hop) - n_samples
            audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1)
                            + [(0, grow)])
            n_samples += grow
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(half, half)], mode="reflect")
        # torch.stft(center=True): 1 + n_samples // hop frames; whisper drops
        # the last one, so emit n_samples // hop directly.
        num_frames = n_samples // hop
        frames = _frame(audio, n_fft, hop, num_frames)
        scale = 1.0
    else:
        raise ValueError(f"unknown stft convention {convention!r}")

    cos_b, sin_b = _dft_bases(n_fft)
    windowed = frames * win
    # HIGHEST matmul precision: the MXU's default f32 path is bf16 and
    # costs accuracy through the power+log chain (bit-accuracy contract).
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(windowed, jnp.asarray(cos_b), precision=hi)
    im = jnp.matmul(windowed, jnp.asarray(sin_b), precision=hi)
    power = re * re + im * im
    if scale != 1.0:
        power = power * (scale * scale)
    return power


def normalize_standardize(log_spec: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean/std standardization over (time, mel).

    Matches the reference ``normalize_spectogram`` (``audio.py:53-58``)
    including the std==0 guard.
    """
    mean = jnp.mean(log_spec, axis=(-1, -2), keepdims=True)
    std = jnp.std(log_spec, axis=(-1, -2), keepdims=True)
    return (log_spec - mean) / jnp.where(std != 0, std, 1.0)


def normalize_whisper(log_spec: jnp.ndarray) -> jnp.ndarray:
    """OpenAI Whisper dynamic-range compression: clamp to per-sample
    max-8 dB, then (x + 4) / 4."""
    mx = jnp.max(log_spec, axis=(-1, -2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram(
    audio: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    mel_scale: str,
    convention: str,
    log_floor: float,
) -> jnp.ndarray:
    """Un-normalized log10 mel spectrogram, (B, frames, n_mels)."""
    if getattr(audio, "ndim", None) != 2:
        raise ValueError(
            "expected audio of shape (batch, n_samples), got "
            f"{getattr(audio, 'shape', type(audio))}"
        )
    power = stft_power(audio, n_fft, hop, convention=convention)
    filters = jnp.asarray(
        mel_filter_bank(sample_rate, n_fft, n_mels, mel_scale=mel_scale).T
    )  # (n_freq, n_mels)
    mel = jnp.matmul(power, filters, precision=jax.lax.Precision.HIGHEST)
    return jnp.log10(jnp.maximum(mel, log_floor))


def yoho_log_mel(audio: jnp.ndarray, config) -> jnp.ndarray:
    """Reference-compatible frontend: scipy STFT + HTK mel + log10 +
    per-sample standardization. (B, n_samples) -> (B, max_audio_len, n_mels).

    Numerically equivalent to the reference chain ``mel_spectogram`` ->
    ``normalize_spectogram`` (``yoho/src/preprocessing/audio.py:32-58``);
    the scipy 1/sum(win) amplitude scale cancels in the standardization but
    is applied anyway so the un-normalized spectrogram also matches.
    """
    log_spec = log_mel_spectrogram(
        audio,
        sample_rate=config.sample_rate,
        n_fft=config.n_fft,
        hop=config.stft_hop,
        n_mels=config.n_mel_bands,
        mel_scale="htk",
        convention="scipy",
        log_floor=1e-13,
    )
    return normalize_standardize(log_spec)


def whisper_log_mel(
    audio: jnp.ndarray,
    n_mels: int = 80,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop: int = 160,
) -> jnp.ndarray:
    """OpenAI-Whisper-compatible frontend (exact feature parity with
    WhisperFeatureExtractor): (B, 480000) -> (B, 3000, n_mels)."""
    log_spec = log_mel_spectrogram(
        audio,
        sample_rate=sample_rate,
        n_fft=n_fft,
        hop=hop,
        n_mels=n_mels,
        mel_scale="slaney",
        convention="whisper",
        log_floor=1e-10,
    )
    return normalize_whisper(log_spec)
