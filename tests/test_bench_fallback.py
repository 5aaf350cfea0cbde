"""Unit tests for bench.py's degraded-environment fallback machinery.

The compile-host outage of 2026-08-20 (remote tpu_compile_helper SIGKILLed
on every program containing a large Pallas kernel) made the headline bench
walk a ladder of smaller configurations and, at the end, emit the last
recorded measurement labeled stale. These tests cover the chip-independent
pieces: the stale emission, its artifact fallback chain, and the ladder's
shape invariants. The ladder's live behavior (re-exec on compile failure)
was exercised on the real chip during the outage itself.
"""

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stale_output(bench, capsys, why="test outage"):
    bench._emit_stale(why)
    return json.loads(capsys.readouterr().out.strip())


def test_emit_stale_prefers_last_good(bench, capsys, tmp_path, monkeypatch):
    last = {"metric": "points/sec/chip (nats eval, dulcet-universe)",
            "value": 123456.0, "unit": "points/sec", "vs_baseline": 1.646,
            "recorded": "2026-08-19"}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    out = _stale_output(bench, capsys)
    assert out["stale"] is True
    assert out["value"] == last["value"]
    assert out["vs_baseline"] == last["vs_baseline"]
    assert "STALE" in out["metric"] and "2026-08-19" in out["metric"]
    assert "test outage" in out["metric"]


def test_emit_stale_falls_back_to_committed_headline(bench, capsys,
                                                     monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "missing.json"))
    out = _stale_output(bench, capsys)
    committed = json.load(open(os.path.join(
        ROOT, "save", "bench", "bench_headline_transposed.json")))
    assert out["stale"] is True
    assert out["value"] == committed["value"]


def test_emit_stale_without_any_artifact_raises(bench, monkeypatch,
                                                tmp_path):
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "a.json"))
    monkeypatch.setattr(bench, "_ROOT", str(tmp_path))
    with pytest.raises(SystemExit):
        bench._emit_stale("nothing recorded")


def test_degraded_rungs_prefer_recorded_full_measurement(
        bench, capsys, tmp_path, monkeypatch):
    """Entering a degraded rung (kernels disabled) with a recorded
    full-config measurement available must emit that measurement labeled
    stale instead of benchmarking the degraded configuration."""
    last = {"metric": "points/sec/chip (nats eval, dulcet-universe)",
            "value": 99999.0, "unit": "points/sec", "vs_baseline": 1.333,
            "recorded": "2026-08-19"}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    degraded = next(i for i, r in enumerate(bench._RUNGS)
                    if not (r["fused"] and r["fused_encoder"]))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", str(degraded))
    monkeypatch.delenv("FLOWCOMPARE_BENCH_CHUNK", raising=False)
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: True)
    monkeypatch.setattr(bench, "main",
                        lambda *a, **k: pytest.fail("ran degraded bench"))
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True and out["value"] == 99999.0


def test_chip_unreachable_emits_stale_with_correct_label(
        bench, capsys, tmp_path, monkeypatch):
    """A plain worker outage must be labeled as such at rung 0 — not walk
    the ladder and get misattributed to the compile host."""
    last = {"metric": "m", "value": 1.0, "unit": "points/sec",
            "vs_baseline": 0.1, "recorded": "2026-08-19"}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: False)
    monkeypatch.setattr(bench, "main",
                        lambda *a, **k: pytest.fail("touched the backend"))
    monkeypatch.delenv("FLOWCOMPARE_BENCH_RUNG", raising=False)
    monkeypatch.delenv("FLOWCOMPARE_BENCH_CHUNK", raising=False)
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True and "unreachable" in out["metric"]


def test_stale_never_substitutes_a_different_preset(bench, monkeypatch):
    """A non-flagship preset request must fail loudly rather than emit the
    recorded dulcet-universe measurement under the wrong name."""
    monkeypatch.setenv("FLOWCOMPARE_BENCH_PRESET", "good-surf")
    assert bench._load_last_good() is None
    with pytest.raises(SystemExit):
        bench._emit_stale("compile host down")


def test_last_good_recording_policy(bench, monkeypatch):
    """_LAST_GOOD captures only representative flagship measurements."""
    monkeypatch.delenv("FLOWCOMPARE_BENCH_BATCH", raising=False)
    ok = bench._should_record
    assert ok("dulcet-universe", True, True, 80)
    assert ok("dulcet-universe", True, True, 40)
    assert not ok("dulcet-universe", True, True, 1)     # smoke chunk
    assert not ok("dulcet-universe", True, False, 80)   # degraded encoder
    assert not ok("dulcet-universe", False, False, 80)  # scan path
    assert not ok("good-surf", True, True, 80)          # non-flagship
    monkeypatch.setenv("FLOWCOMPARE_BENCH_BATCH", "4")
    assert not ok("dulcet-universe", True, True, 80)    # batch override


def test_ladder_shape(bench):
    """The ladder must try the fastest configuration first, only shrink,
    and end with the pure-XLA rung (the only one the 2026-08-20 degraded
    compile host accepted)."""
    rungs = bench._RUNGS
    assert rungs[0]["chunk"] == 80 and rungs[0]["fused"]
    chunks = [r["chunk"] for r in rungs]
    assert chunks == sorted(chunks, reverse=True)
    assert not rungs[-1]["fused"] and not rungs[-1]["fused_encoder"]
    # degradation is monotone: once a kernel is dropped it stays dropped
    for a, b in zip(rungs, rungs[1:]):
        assert a["fused"] >= b["fused"]
        assert a["fused_encoder"] >= b["fused_encoder"]
    assert all(r["watchdog"] >= 600 for r in rungs)
    # exactly one delayed-retry rung to ride out transient host pressure
    assert sum(1 for r in rungs if r["delay"]) == 1
