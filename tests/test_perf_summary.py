"""The PARITY.md perf table must be regenerable from the committed
save/bench artifacts — markdown ledgers drifting from the measurement
JSONs was a round-2 finding."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_md_perf_summary_is_fresh():
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "perf_summary.py"),
         "--check"], capture_output=True, text=True)
    assert p.returncode == 0, p.stderr


def test_headline_artifact_schema():
    import json
    with open(os.path.join(ROOT, "save", "bench",
                           "bench_last_headline.json")) as f:
        h = json.load(f)
    for key in ("metric", "value", "unit", "vs_baseline", "baseline",
                "runs", "spread_pct", "recorded"):
        assert key in h, key
    assert h["baseline"] == "estimated-a100"
    if h.get("interim"):
        # hand-reconciled stopgap (machine-labeled) — 2 runs tolerated
        assert len(h["runs"]) >= 2
    else:
        # written by tools/headline_runs.py, which asserts n >= 3
        assert len(h["runs"]) >= 3
    assert min(h["runs"]) <= h["value"] <= max(h["runs"])
