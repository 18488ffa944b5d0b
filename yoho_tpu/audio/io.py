"""Host-side audio I/O: decode, resample, encode.

The reference shells out to ffmpeg for everything
(``yoho/src/preprocessing/audio.py:11-29``). Here the common path (WAV/PCM)
is decoded natively — stdlib parsing with an optional C++ fast path
(``yoho_tpu.native``) — and ffmpeg is used only as a gated fallback for
compressed containers, keeping the contract: mono int16 PCM at the target
rate (callers divide by 32768 for float, exactly like ``whisper.py:249``).
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path
from typing import Union

import numpy as np

_FFMPEG = shutil.which("ffmpeg")


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (host, scipy). No-op when rates match."""
    if orig_sr == target_sr:
        return audio
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    out = resample_poly(audio.astype(np.float32), frac.numerator, frac.denominator)
    return out.astype(np.float32)


def _read_wav(path: Path) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV file -> (mono float32 in [-1, 1], sample_rate)."""
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data, sr


def _ffmpeg_decode(path: Path, sample_rate: int) -> np.ndarray:
    if _FFMPEG is None:
        raise RuntimeError(
            f"Cannot decode {path.suffix!r}: ffmpeg not available and file is "
            "not a WAV/NPY. Install ffmpeg or convert to WAV."
        )
    cmd = [
        _FFMPEG, "-nostdin", "-i", str(path),
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le",
        "-ar", str(sample_rate), "pipe:1",
    ]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(raw, np.int16)


def load_audio(path: Union[str, Path], sample_rate: int) -> np.ndarray:
    """Decode any supported audio file -> mono int16 at ``sample_rate``.

    Same contract as the reference ``load_audio`` (``audio.py:11-18``):
    raw int16, NOT scaled to [-1, 1].
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".npy":
        arr = np.load(path)
        if arr.dtype != np.int16:
            arr = np.clip(arr * 32768.0, -32768, 32767).astype(np.int16)
        return arr
    if suffix in (".wav", ".wave"):
        from yoho_tpu.native import wav_decode_native

        decoded = wav_decode_native(path)  # C++ fast path; None if lib unbuilt
        try:
            if decoded is not None:
                data, sr = decoded
            else:
                data, sr = _read_wav(path)
        except Exception:  # noqa: BLE001 — 24-bit/float/mu-law WAVs etc.
            if _FFMPEG is None:
                raise  # no decoder can read it; surface the real error
            return _ffmpeg_decode(path, sample_rate)
        data = resample(data, sr, sample_rate)
        return np.clip(data * 32768.0, -32768, 32767).astype(np.int16)
    return _ffmpeg_decode(path, sample_rate)


def load_audio_f32(path: Union[str, Path], sample_rate: int) -> np.ndarray:
    """Float32 [-1, 1] convenience wrapper."""
    return load_audio(path, sample_rate).astype(np.float32) / 32768.0


def save_audio(audio: np.ndarray, path: Union[str, Path], sample_rate: int) -> Path:
    """Write mono audio. WAV natively; mp4 via ffmpeg when available
    (parity with the reference ``save_audio``, ``audio.py:21-29``).

    Accepts int16 or float32 [-1, 1]. Returns the actual path written.
    """
    path = Path(path)
    if audio.dtype != np.int16:
        audio = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)

    if path.suffix.lower() in ("", ".wav") or _FFMPEG is None:
        path = path.with_suffix(".wav")
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(audio.tobytes())
        return path

    path = path.with_suffix(".mp4")
    cmd = [
        _FFMPEG, "-nostdin", "-y",
        "-f", "s16le", "-ac", "1", "-ar", str(sample_rate), "-i", "pipe:0",
        "-f", "mp4", "-b:a", "16k", str(path),
    ]
    subprocess.run(cmd, input=audio.tobytes(), capture_output=True, check=True)
    return path
