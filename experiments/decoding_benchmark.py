"""Audio load-latency benchmark (parity: the reference's
``experiments/decoding_benchmark.py`` which motivated raw-array caching of
training audio — its measured table is preserved in BASELINE.md).

Measures wall-clock decode time per container format for every file in a
directory, relative to the fastest. Also compares the native C++ WAV
decoder against the pure-Python path.

Usage: python experiments/decoding_benchmark.py [audio_dir]
"""

import sys
import time
from pathlib import Path

import numpy as np


def bench_dir(path: Path):
    from yoho_tpu.audio.io import load_audio

    results = []
    for f in sorted(path.iterdir()):
        if f.suffix.lower() not in (".wav", ".npy", ".mp3", ".mp4", ".m4a",
                                    ".flac", ".ogg", ".opus", ".pkl"):
            continue
        size_mb = f.stat().st_size / (1024 * 1024)
        st = time.monotonic()
        if f.suffix == ".pkl":
            import pickle

            with open(f, "rb") as fh:
                pickle.load(fh)
        else:
            load_audio(f, 16000)
        results.append((f.name, f.suffix, size_mb, time.monotonic() - st))
    if not results:
        print(f"no audio files in {path}")
        return
    fastest = min(r[3] for r in results)
    print(f"{'file':30s} {'size MB':>8s} {'load s':>10s} {'relative':>10s}")
    for name, _suffix, size, dur in results:
        print(f"{name:30s} {size:8.2f} {dur:10.5f} {dur / fastest:9.1f}x")


def bench_native_vs_python(n: int = 20):
    import wave

    from yoho_tpu.audio.io import _read_wav
    from yoho_tpu.native import get_lib, wav_decode_native

    tmp = Path("/tmp/bench_sample.wav")
    data = (np.random.default_rng(0).standard_normal(16000 * 30) * 0.1)
    pcm = np.clip(data * 32768, -32768, 32767).astype(np.int16)
    with wave.open(str(tmp), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    t0 = time.monotonic()
    for _ in range(n):
        _read_wav(tmp)
    py = (time.monotonic() - t0) / n

    if get_lib() is None:
        print(f"python WAV decode (30 s file): {py * 1e3:.2f} ms; native unavailable")
        return
    t0 = time.monotonic()
    for _ in range(n):
        wav_decode_native(tmp)
    native = (time.monotonic() - t0) / n
    print(f"30 s WAV decode: python {py * 1e3:.2f} ms | native C++ "
          f"{native * 1e3:.2f} ms ({py / native:.1f}x faster)")


def bench_formats(n: int = 10):
    """Same 30 s clip in every format this framework can WRITE itself
    (wav / flac native codec / m4a in-process AAC), decode-timed — the
    reference's decode table (``decoding_benchmark.py:50-70``) rebuilt
    with no ffmpeg binary anywhere."""
    import tempfile

    from yoho_tpu.audio.io import load_audio, save_audio

    g = np.random.default_rng(0)
    t = np.arange(16000 * 30) / 16000.0
    clip = (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * g.standard_normal(len(t))).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        files = [save_audio(clip, Path(d) / f"clip{suf}", 16000)
                 for suf in (".wav", ".flac", ".m4a")]
        files = [f for f in files if f.exists()]
        rows = []
        for f in files:
            load_audio(f, 16000)  # warm (builds native libs on first call)
            t0 = time.monotonic()
            for _ in range(n):
                load_audio(f, 16000)
            rows.append((f.suffix, f.stat().st_size / 1e6,
                         (time.monotonic() - t0) / n))
        fastest = min(r[2] for r in rows)
        print(f"\n30 s clip per format ({n} decodes each):")
        print(f"{'format':>8s} {'size MB':>8s} {'decode ms':>10s} {'rel':>6s}")
        for suf, size, dur in rows:
            print(f"{suf:>8s} {size:8.2f} {dur * 1e3:10.2f} "
                  f"{dur / fastest:5.1f}x")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        bench_dir(Path(sys.argv[1]))
    bench_native_vs_python()
    bench_formats()
