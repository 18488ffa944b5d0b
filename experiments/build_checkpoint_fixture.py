"""Build the committed trained-checkpoint fixture (tests/fixtures/sessions/tiny).

Runs the overfit_e2e recipe (tiny YOHO, 3 tone-coded sentences, ~5 min on
CPU), then copies the session config + tokenizer + trained stage-1 params
into the test fixtures and records the EXACT transcripts as goldens —
the text-level e2e tests (tests/test_checkpoint_fixture.py) assert byte
equality against them through the library, the CLI, and the HTTP server.

The north star BASELINE.md measures ("exact-match transcripts") needs
trained weights; random-init tests can only check invariants. This
fixture is the smallest checkpoint that makes transcript TEXT a golden.

Usage: python experiments/build_checkpoint_fixture.py
Rebuild whenever tokenizer/model serialization changes incompatibly.
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

# Goldens must be recorded on the platform the test suite runs on (CPU):
# bf16 matmul rounding differs across backends, and a golden is only a
# golden if CI reproduces it bit-for-bit.
import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
WORKDIR = Path("/tmp/yoho_fixture")
FIXTURE = REPO / "tests" / "fixtures" / "sessions" / "tiny"

# Must match experiments/overfit_e2e.py
SENTS = ["hello world", "good morning", "thank you"]
TONES = [440, 880, 1320]


def tone_clip(s: int, n_samples: int) -> np.ndarray:
    """Deterministic test clip for sentence ``s`` (same recipe as
    overfit_e2e.py's serving check)."""
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * TONES[s] * np.arange(int(0.25 * 16000))
                        / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


def main() -> None:
    if not (WORKDIR / "sessions/ov/weights/asr.ckpt").exists():
        subprocess.run([sys.executable, str(REPO / "experiments/overfit_e2e.py"),
                        str(WORKDIR)], check=True)

    FIXTURE.mkdir(parents=True, exist_ok=True)
    (FIXTURE / "weights").mkdir(exist_ok=True)
    shutil.copy(WORKDIR / "sessions/ov/config.toml", FIXTURE / "config.toml")
    for name in ("tokenizer.model", "asr.ckpt"):
        shutil.copy(WORKDIR / f"sessions/ov/weights/{name}",
                    FIXTURE / "weights" / name)

    # Record goldens through the library path.
    from yoho_tpu.cli.transcribe import build_yoho_transcriber

    t = build_yoho_transcriber("tiny", str(FIXTURE.parent), beams=0, batch=1)
    n_samples = t.model.cfg.n_samples
    golden = []
    for s in range(3):
        res = t.transcribe(tone_clip(s, n_samples))
        assert SENTS[s] in res.text, (
            f"fixture failed to learn {SENTS[s]!r}: got {res.text!r}")
        golden.append({
            "tone": TONES[s],
            "expect_contains": SENTS[s],
            "text": res.text,
            "segments": [{"start": round(seg.start, 4),
                          "end": round(seg.end, 4),
                          "text": seg.text} for seg in res.segments],
        })
    (FIXTURE / "golden.json").write_text(json.dumps(golden, indent=1))
    print(f"fixture written to {FIXTURE}")
    for g in golden:
        print(f"  tone {g['tone']} -> {g['text']!r}")


if __name__ == "__main__":
    main()
