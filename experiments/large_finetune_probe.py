"""large-v3 finetune on one v5e chip: fit boundaries + the remat proof.

VERDICT r4 missing #5: remat's documented use case ("deeper configs —
large-v3 finetune — where activations are the binding HBM term") was
never demonstrated. This probe measures `yoho finetune`-shaped train
steps (bench.bench_whisper_finetune: on-device mel, masked CE, AdamW,
bf16 params + bf16 AdamW moments) on whisper-large-v3 across batches,
with and without remat and with the freeze-encoder lever, recording for
each: fits/OOMs and ms/step. The proof the verdict asked for is a batch
that OOMs plain and trains under --remat, with remat's measured cost at
a batch where both fit.

Each config runs in a FRESH process (``python bench.py`` with
BENCH_TRAIN/BENCH_BATCH): an in-process RESOURCE_EXHAUSTED leaves the
device allocator poisoned for every later config in the same process —
observed live: after one OOM, even configs that fit standalone report
OOM. Subprocess isolation makes every row independent.

Usage: python experiments/large_finetune_probe.py  (TPU; ~45-90 min of
relay compiles). Results land in PERFORMANCE.md "large-v3 finetune".
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONFIGS = [
    # (label, BENCH_TRAIN kind, batch). AdamW lanes: measured OOM at
    # B=2 even with remat (its moment trees + grad/update transients
    # peak at ~5 param-sized copies of a 1.54B model). The full-
    # parameter lane on one chip therefore runs adafactor (factored
    # second moments; train/whisper_finetune.py --optimizer adafactor):
    # there the binding term becomes ACTIVATIONS, which is where remat's
    # proof lives (a batch that OOMs plain and trains under --remat).
    ("plain-b2", "finetune-large-v3", 2),
    ("plain-b4", "finetune-large-v3", 4),
    ("remat-b4", "finetune-large-v3-remat", 4),
    ("remat-b8", "finetune-large-v3-remat", 8),
    ("adafactor-b4", "finetune-large-v3-adafactor", 4),
    ("adafactor-b8", "finetune-large-v3-adafactor", 8),
    ("adafactor-b16", "finetune-large-v3-adafactor", 16),
    ("adafactor-remat-b8", "finetune-large-v3-adafactor-remat", 8),
    ("adafactor-remat-b16", "finetune-large-v3-adafactor-remat", 16),
    ("adafactor-remat-b24", "finetune-large-v3-adafactor-remat", 24),
    ("freeze-b4", "finetune-large-v3-freeze", 4),
    ("freeze-b8", "finetune-large-v3-freeze", 8),
]

# AdamW rows measured in the first run (OOM at every batch incl. B=2
# with remat; freeze-b8 OOMs at compile: 17.66G/15.75G): skip them when
# SKIP_MEASURED=1 so re-runs only probe the new adafactor/freeze lanes.
if os.environ.get("SKIP_MEASURED"):
    CONFIGS = [c for c in CONFIGS
               if c[0].startswith(("adafactor", "freeze-b4"))]


def main():
    rows = []
    for label, kind, batch in CONFIGS:
        print(f"[probe] {label}: {kind} B={batch}...", file=sys.stderr,
              flush=True)
        env = dict(os.environ, BENCH_TRAIN=kind, BENCH_BATCH=str(batch),
                   BENCH_ITERS="2")
        p = subprocess.run([sys.executable, str(REPO / "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3000)
        line = (p.stdout.strip().splitlines() or [""])[-1]
        # The relay reports allocation OOMs as RESOURCE_EXHAUSTED but
        # COMPILE-time OOMs as an HTTP 500 wrapping "Ran out of memory
        # in memory space hbm" (observed on freeze-b8: 17.66G/15.75G).
        oom = any(s in p.stderr for s in (
            "RESOURCE_EXHAUSTED", "ResourceExhausted",
            "Ran out of memory", "Exceeded hbm capacity"))
        parsed = (json.loads(line)
                  if p.returncode == 0 and line.startswith("{") else None)
        if parsed is not None and "error" not in parsed:
            rows.append({"config": label, "fits": True, **parsed})
        elif parsed is not None:
            # bench.py's wedged-relay fail-fast path prints a zero-value
            # JSON line and exits 0 — that is NOT a fitting config.
            rows.append({"config": label, "fits": False, "oom": False,
                         "rc": 0, "error": parsed["error"][:300]})
        else:
            # Surface the actual exception, not jax's traceback-filter
            # notice (which is the literal last stderr line).
            errs = [ln for ln in p.stderr.splitlines()
                    if "Error" in ln or "RESOURCE" in ln]
            rows.append({"config": label, "fits": False, "oom": oom,
                         "rc": p.returncode,
                         "error": (errs[-1] if errs else p.stderr[-300:])
                         [:300]})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
