"""BENCH_MATRIX.json stays in lockstep with bench.py (VERDICT r4 weak #1).

Round 4 shipped a matrix artifact missing a config its docs already
cited; besides the in-run assertion in ``bench.py --matrix``, this
CPU-fast test keeps the COMMITTED artifact honest: every config bench.py
defines has a row, every row's claim matches bench.py's claim, and no
row sits far under its claim (a regression would have been visible to
the driver when the artifact was produced).
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)  # top level is stdlib+numpy only
    rows = json.loads((REPO / "BENCH_MATRIX.json").read_text())
    return bench, rows


def test_artifact_rows_cover_every_config():
    bench, rows = _load()
    want = {m[0] for m in bench.MATRIX} | {m[0] for m in bench.TRAIN_MATRIX}
    got = {r["config"] for r in rows}
    assert got == want, (sorted(got ^ want))


def test_artifact_claims_match_bench_claims():
    bench, rows = _load()
    claims = {m[0]: m[5] for m in bench.MATRIX}
    claims.update({m[0]: m[3] for m in bench.TRAIN_MATRIX})
    for r in rows:
        assert r["claimed"] == claims[r["config"]], r["config"]


def test_artifact_rows_met_their_claims():
    _, rows = _load()
    for r in rows:
        # 0.93 floor: chip/compiler drift across rounds runs a few
        # percent (documented in bench.py TRAIN_MATRIX); a real
        # regression shows up far below this.
        assert r["vs_claimed"] >= 0.93, (r["config"], r["vs_claimed"])
        assert r["value"] > 0, r["config"]
