"""``yoho doctor`` — production environment self-check.

The reference assumes a working workstation (its only hardware handling is
setting ``CUDA_VISIBLE_DEVICES``, ``train/run_train_session.py:30-32``); a
TPU serving deployment has more ways to be subtly broken: a wedged device
relay that blocks backend init forever, a native library that silently
fell back to pure Python, missing system codecs, an HF checkpoint dir
without tokenizer files (ids-only transcripts). This command probes each
and prints one line per check; exit code 0 means no hard failures.

The device probe runs in a SUBPROCESS with a timeout: cold TPU backend
init can block indefinitely when the chip is held or the relay is down,
and a diagnostic tool must diagnose that state, not reproduce it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

OK, WARN, FAIL = "ok", "warn", "FAIL"


def _check_package() -> list:
    import yoho_tpu

    try:
        from importlib.metadata import version

        ver = version("yoho-tpu")
    except Exception:
        ver = "unknown"
    root = Path(yoho_tpu.__file__).parent
    return [("package", OK, f"yoho-tpu {ver} at {root} "
             f"(python {sys.version.split()[0]})")]


def _check_deps() -> list:
    rows = []
    for mod in ("jax", "flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            rows.append((f"dep:{mod}", OK, getattr(m, "__version__", "?")))
        except Exception as e:  # pragma: no cover - deps are baked in
            rows.append((f"dep:{mod}", FAIL, f"import failed: {e}"))
    return rows


def _check_native() -> list:
    from yoho_tpu import native

    rows = []
    lib = native.get_lib()
    if lib is not None:
        rows.append(("native:core", OK,
                     "C++ wav/flac/bpe/dtw library loaded"))
    else:
        rows.append(("native:core", WARN,
                     "C++ library unavailable (g++ missing?) — "
                     "pure-Python fallbacks active (slower, same results)"))
    av = native.get_av_lib()
    rows.append(("native:libav", OK if av is not None else WARN,
                 "in-process libav decode (m4a/aac/opus/anything)"
                 if av is not None else
                 "libav headers/libs not found — m4a/aac/opus decode "
                 "falls back to an ffmpeg binary if present"))
    return rows


def _check_codecs() -> list:
    from yoho_tpu.audio import codecs

    rows = []
    for name, fn in (("mp3 (libmpg123)", codecs.mp3_available),
                     ("ogg (libvorbisfile)", codecs.ogg_available)):
        try:
            avail = bool(fn())
        except Exception:
            avail = False
        rows.append((f"codec:{name.split()[0]}",
                     OK if avail else WARN,
                     f"{name}: {'available' if avail else 'not found'}"))
    ff = shutil.which("ffmpeg")
    rows.append(("codec:ffmpeg", OK if ff else WARN,
                 f"last-resort ffmpeg binary: {ff or 'absent'} "
                 "(wav/flac/npy are decoded natively either way)"))
    return rows


_PROBE = r"""
import json, sys
# sitecustomize may pre-import jax (snapshotting JAX_PLATFORMS before this
# code runs) — honor the env the operator asked for, like every CLI main
# (CLAUDE.md; yoho_tpu.utils.platform). JAX_PLATFORMS=cpu must probe CPU,
# not cold-init a possibly wedged TPU relay.
from yoho_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax
ds = jax.devices()
ms = {}
try:
    ms = ds[0].memory_stats() or {}
except Exception:
    pass
print(json.dumps({
    "platform": jax.default_backend(),
    "n_devices": len(ds),
    "hbm_bytes": int(ms.get("bytes_limit", 0)),
    "kind": getattr(ds[0], "device_kind", "?"),
}))
"""


def _check_devices(timeout: float) -> list:
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return [("devices", FAIL,
                 f"backend init blocked for {timeout:.0f}s — wedged device "
                 "relay or chip claimed by another process (find and kill "
                 "the holder BY PID, or retry later)")]
    if out.returncode != 0:
        tail = (out.stderr or b"").decode(errors="replace").strip()
        return [("devices", FAIL,
                 f"backend init failed: {tail.splitlines()[-1] if tail else out.returncode}")]
    try:
        info = json.loads(out.stdout.decode().strip().splitlines()[-1])
    except Exception:
        return [("devices", FAIL,
                 f"unparseable probe output: {out.stdout[:200]!r}")]
    hbm = info.get("hbm_bytes") or 0
    detail = (f"{info['n_devices']} x {info.get('kind', '?')} "
              f"({info['platform']})"
              + (f", {hbm / 1e9:.1f} GB HBM" if hbm else ""))
    rows = [("devices", OK, detail)]
    if info["platform"] != "cpu" and hbm:
        from yoho_tpu.core.config import WHISPER_PRESETS
        from yoho_tpu.infer.capacity import suggest_batch_size

        sizes = {n: suggest_batch_size(WHISPER_PRESETS[n], hbm_bytes=hbm,
                                       horizon=224, kv_bytes=1.0,
                                       cache_bytes=1.0)
                 for n in ("small", "large-v3")}
        rows.append(("devices:capacity", OK,
                     "batch_size='auto' (int8 KV, 224-token horizon): "
                     + ", ".join(f"{k}={v}" for k, v in sizes.items())))
    return rows


def _check_hf(path: str) -> list:
    p = Path(path)
    if not p.is_dir():
        return [("hf", FAIL, f"{path}: not a local checkpoint directory")]
    rows = []
    weights = [f for f in ("model.safetensors", "pytorch_model.bin",
                           "flax_model.msgpack")
               if (p / f).exists()] + sorted(
        f.name for f in p.glob("model-*.safetensors"))
    rows.append(("hf:weights", OK if weights else FAIL,
                 ", ".join(weights) if weights else
                 "no model.safetensors / pytorch_model.bin found"))
    rows.append(("hf:config", OK if (p / "config.json").exists() else FAIL,
                 "config.json" if (p / "config.json").exists()
                 else "config.json missing"))
    has_text = ((p / "tokenizer.json").exists()
                or ((p / "vocab.json").exists()
                    and (p / "merges.txt").exists()))
    rows.append(("hf:tokenizer", OK if has_text else WARN,
                 "text backend files present (tokenizer.json or "
                 "vocab.json+merges.txt)" if has_text else
                 "no tokenizer files — transcripts would be token ids "
                 "with empty text"))
    return rows


def _check_session(name: str, root: str) -> list:
    from yoho_tpu.core.config import load_session_config

    try:
        config = load_session_config(name, root)
    except FileNotFoundError as e:
        return [("session", FAIL, str(e))]
    except Exception as e:
        return [("session", FAIL, f"config.toml invalid: {e}")]
    rows = [("session", OK, f"{root}/{name}/config.toml parses")]
    for slot in ("tokenizer", "asr", "voice_reconstruction",
                 "voiceprint", "yoho"):
        path = getattr(config.weights, slot, None)
        if path is None:
            continue
        exists = Path(path).exists()
        rows.append((f"session:weights.{slot}", OK if exists else WARN,
                     f"{path} ({'present' if exists else 'not trained yet'})"))
    return rows


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="yoho doctor",
        description="Check this environment for serving/training readiness")
    parser.add_argument("--hf", type=str, default=None, metavar="DIR",
                        help="also validate a local HF Whisper checkpoint "
                             "directory (weights/config/tokenizer files)")
    parser.add_argument("--session", type=str, default=None, metavar="NAME",
                        help="also validate a training session's config "
                             "and weight artifacts")
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--device-timeout", type=float, default=30.0,
                        metavar="SECONDS",
                        help="max wait for backend init in the device "
                             "probe subprocess (a wedged TPU relay blocks "
                             "forever; the probe must not)")
    parser.add_argument("--no-devices", action="store_true",
                        help="skip the device probe (e.g. on a build host)")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable output, one JSON per check")
    args = parser.parse_args(argv)

    rows = _check_package() + _check_deps() + _check_native() + _check_codecs()
    if not args.no_devices:
        rows += _check_devices(args.device_timeout)
    if args.hf:
        rows += _check_hf(args.hf)
    if args.session:
        rows += _check_session(args.session, args.root)

    failed = False
    for name, status, detail in rows:
        failed |= status == FAIL
        if args.json:
            print(json.dumps({"check": name, "status": status,
                              "detail": detail}))
        else:
            print(f"[{status:>4}] {name:<24} {detail}")
    if not args.json:
        print("doctor:", "FAIL (fix the failed checks above)" if failed
              else "all checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
