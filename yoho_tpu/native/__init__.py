"""Native (C++) host runtime components, bound via ctypes.

The reference leans on third-party native code (sentencepiece's C++ core,
the ffmpeg binary, librosa DSP — SURVEY.md §2.2). This package owns those
capabilities directly:

  * ``wav.cpp``       — WAV/PCM decode (mono-mix + int16->f32).
  * ``bpe.cpp``       — byte-level BPE tokenizer: trainer + encoder
                        (the sentencepiece replacement).

The shared library is compiled on first use with g++ (cached next to the
sources, keyed on source hash). Every binding has a pure-Python fallback so
the framework works without a toolchain; tests cross-check both paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _source_files() -> list[Path]:
    return sorted(_SRC_DIR.glob("*.cpp"))


def _build_lib() -> Optional[Path]:
    srcs = _source_files()
    if not srcs:
        return None
    tag = hashlib.sha256(b"".join(p.read_bytes() for p in srcs)).hexdigest()[:16]
    out = _SRC_DIR / f"libyoho_native_{tag}.so"
    if out.exists():
        return out
    # Clean stale builds.
    for old in _SRC_DIR.glob("libyoho_native_*.so"):
        try:
            old.unlink()
        except OSError:
            pass
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-o", str(out), *map(str, srcs),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        stderr = getattr(e, "stderr", b"")
        raise RuntimeError(
            f"native build failed: {stderr.decode(errors='replace') if stderr else e}"
        ) from e
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if os.environ.get("YOHO_DISABLE_NATIVE"):
            _LIB_FAILED = True
            return None
        try:
            path = _build_lib()
            if path is None:
                _LIB_FAILED = True
                return None
            _LIB = ctypes.CDLL(str(path))
            _configure(_LIB)
        except Exception:
            _LIB_FAILED = True
            _LIB = None
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    lib.yoho_wav_decode.restype = ctypes.c_int64
    lib.yoho_wav_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.yoho_free.restype = None
    lib.yoho_free.argtypes = [ctypes.c_void_p]


def wav_decode_native(path) -> Optional[tuple[np.ndarray, int]]:
    """C++ WAV decode -> (mono float32 [-1,1], sample_rate); None if the
    native lib is unavailable or the file isn't plain PCM."""
    lib = get_lib()
    if lib is None:
        return None
    data_ptr = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int32(0)
    n = lib.yoho_wav_decode(str(path).encode(), ctypes.byref(data_ptr), ctypes.byref(sr))
    if n < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data_ptr, shape=(n,)).copy()
    finally:
        lib.yoho_free(data_ptr)
    return arr, int(sr.value)
