"""Adversarial-input fuzzing of the owned parsers (SURVEY.md §4 extension).

These surfaces consume UNTRUSTED bytes in production (serving uploads,
corpus files, WebSocket clients); each must fail with a clean, catchable
error — never a crash, hang, or interpreter abort. The native (C++)
decoders are fuzzed inside a SUBPROCESS so a segfault fails the test
instead of killing the test runner.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

from yoho_tpu.audio.flac import decode_flac, encode_flac

SEED = 1234
N_RANDOM = 150
N_MUTATED = 150


def _valid_flac() -> bytes:
    g = np.random.default_rng(SEED)
    pcm = (g.standard_normal((1600, 2)) * 2000).astype(np.int32)
    return encode_flac(pcm, 16000)


def test_flac_python_decoder_survives_random_bytes():
    g = np.random.default_rng(SEED)
    for _ in range(N_RANDOM):
        blob = bytes(g.integers(0, 256, int(g.integers(0, 512)),
                                dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_flac(blob)
        # With a valid magic the parser goes deeper — still only ValueError.
        with pytest.raises(ValueError):
            decode_flac(b"fLaC" + blob)


def test_flac_python_decoder_survives_mutations():
    """Truncations and bit flips of a valid stream either decode (benign
    flips in padding) or raise ValueError — nothing else escapes."""
    blob = _valid_flac()
    g = np.random.default_rng(SEED + 1)
    for _ in range(N_MUTATED):
        b = bytearray(blob)
        kind = g.integers(0, 3)
        if kind == 0:  # truncate
            b = b[:int(g.integers(0, len(b)))]
        elif kind == 1:  # flip a bit
            i = int(g.integers(0, len(b)))
            b[i] ^= 1 << int(g.integers(0, 8))
        else:  # splice a random run
            i = int(g.integers(0, len(b)))
            n = int(g.integers(1, 32))
            b[i:i + n] = bytes(g.integers(0, 256, n, dtype=np.uint8))
        try:
            pcm, sr, bps = decode_flac(bytes(b))
            assert pcm.dtype == np.int32 and sr > 0
        except ValueError:
            pass  # the only sanctioned failure


_NATIVE_HARNESS = r"""
import sys
import numpy as np
from yoho_tpu.audio.flac import encode_flac
from yoho_tpu.native import flac_decode_native, get_lib

if get_lib() is None:
    print("SKIP: native lib unbuilt")
    sys.exit(0)
g = np.random.default_rng({seed})
pcm = (g.standard_normal((1600, 2)) * 2000).astype(np.int32)
blob = encode_flac(pcm, 16000)
assert flac_decode_native(blob) is not None
for _ in range({n}):
    b = bytearray(blob)
    kind = g.integers(0, 4)
    if kind == 0:
        b = b[:int(g.integers(0, len(b)))]
    elif kind == 1:
        i = int(g.integers(0, len(b)))
        b[i] ^= 1 << int(g.integers(0, 8))
    elif kind == 2:
        i = int(g.integers(0, len(b)))
        n = int(g.integers(1, 32))
        b[i:i + n] = bytes(g.integers(0, 256, n, dtype=np.uint8))
    else:
        b = bytearray(bytes(g.integers(0, 256, int(g.integers(0, 256)),
                                       dtype=np.uint8)))
    try:
        flac_decode_native(bytes(b))
    except (ValueError, RuntimeError):
        pass
print("NATIVE_FUZZ_OK")
"""


def test_flac_native_decoder_survives_mutations_subprocess():
    """The C++ FLAC decoder must raise (or return None), never abort the
    process, on mutated input — checked under a real subprocess so a
    segfault is a test failure, not a runner kill."""
    proc = subprocess.run(
        [sys.executable, "-c",
         _NATIVE_HARNESS.format(seed=SEED + 2, n=N_MUTATED)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"native fuzz crashed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}")
    assert ("NATIVE_FUZZ_OK" in proc.stdout) or ("SKIP" in proc.stdout)


def test_websocket_framing_survives_random_bytes():
    """Random byte streams into the RFC 6455 reader: only clean outcomes
    (message tuple, None = clean close, ConnectionError, ValueError) and
    always terminates (EOF-bounded)."""
    from yoho_tpu.utils.websocket import read_message

    g = np.random.default_rng(SEED + 3)
    for _ in range(400):
        blob = bytes(g.integers(0, 256, int(g.integers(0, 128)),
                                dtype=np.uint8))
        try:
            out = read_message(io.BytesIO(blob), io.BytesIO())
            assert out is None or isinstance(out, tuple)
        except (ConnectionError, ValueError):
            pass


def test_websocket_oversized_length_rejected_without_allocation():
    """A frame header advertising a gigantic payload must be refused
    before any attempt to read/allocate it (DoS cap)."""
    from yoho_tpu.utils.websocket import read_message

    # FIN+binary, unmasked is invalid from clients but length checks come
    # first in robust order; craft masked 64-bit length = 2**40.
    hdr = bytes([0x82, 0xFF]) + (2 ** 40).to_bytes(8, "big") + b"\x00" * 4
    with pytest.raises((ConnectionError, ValueError)):
        read_message(io.BytesIO(hdr), io.BytesIO())


def test_websocket_fragmented_message_total_bound(monkeypatch):
    """Reassembly is bounded too: endless small continuation frames (each
    under the per-frame cap) must not grow the message buffer forever."""
    import yoho_tpu.utils.websocket as ws

    def masked_frame(fin, opcode, payload):
        hdr = bytes([(0x80 if fin else 0) | opcode, 0x80 | len(payload)])
        return hdr + b"\x00" * 4 + payload  # zero mask = identity

    monkeypatch.setattr(ws, "MAX_MESSAGE_BYTES", 256)
    chunk = b"a" * 100
    stream = masked_frame(False, ws.OP_TEXT, chunk) + \
        masked_frame(False, ws.OP_CONT, chunk) * 40
    with pytest.raises(ValueError, match="exceeds"):
        ws.read_message(io.BytesIO(stream), io.BytesIO())

    # Under the bound the same fragmentation reassembles fine.
    ok = masked_frame(False, ws.OP_TEXT, chunk) + \
        masked_frame(True, ws.OP_CONT, chunk)
    op, msg = ws.read_message(io.BytesIO(ok), io.BytesIO())
    assert (op, msg) == (ws.OP_TEXT, chunk * 2)


def test_srt_parser_survives_garbage():
    from yoho_tpu.text.srt import parse_srt

    g = np.random.default_rng(SEED + 4)
    for _ in range(200):
        s = "".join(chr(int(c)) for c in g.integers(32, 700,
                                                    int(g.integers(0, 300))))
        for sub in parse_srt(s):  # may yield junk subs; must not raise
            assert sub.end >= 0

    # Structured-but-wrong: indexes without timestamps, reversed times.
    for s in ("1\n\n2\n\n", "1\n00:00:05,000 --> 00:00:01,000\nhi\n\n",
              "x\n99:99:99,999 --> aa:bb:cc,ddd\n\n"):
        list(parse_srt(s))


def test_compressed_codecs_survive_random_bytes(tmp_path):
    """mp3/ogg/m4a decode of random bytes returns None or raises cleanly
    (containment: these call out to ctypes libs in-process — run last;
    the libs are battle-tested, our wrappers must not mis-handle NULLs)."""
    from yoho_tpu.audio import codecs
    from yoho_tpu.native import av_decode_native, get_av_lib

    g = np.random.default_rng(SEED + 5)
    blob = bytes(g.integers(0, 256, 4096, dtype=np.uint8))
    for name, fn in (("junk.mp3", codecs.decode_mp3),
                     ("junk.ogg", codecs.decode_ogg)):
        p = tmp_path / name
        p.write_bytes(blob)
        try:
            out = fn(p)
            assert out is None or isinstance(out, tuple)
        except Exception:  # noqa: BLE001 — any *Python* exception is clean
            pass
    if get_av_lib() is not None:
        p = tmp_path / "junk.m4a"
        p.write_bytes(blob)
        try:
            out = av_decode_native(p, 16000)
            assert out is None or isinstance(out, np.ndarray)
        except Exception:  # noqa: BLE001
            pass
