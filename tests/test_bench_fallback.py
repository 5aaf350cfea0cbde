"""Unit tests for bench.py's degraded-environment fallback machinery.

The compile-host outage of 2026-08-20 (remote tpu_compile_helper SIGKILLed
on every program containing a large Pallas kernel) made the headline bench
walk a ladder of smaller configurations; the round-2 driver run then
TIMED OUT inside that ladder (BENCH_r02.json rc=124) because the ladder
had no global deadline. These tests cover the chip-independent pieces:
the stale emission and its artifact chain, the global-deadline math, the
compile-health canary gating, and the ladder's shape invariants. The
ladder's live behavior (re-exec on compile failure) was exercised on the
real chip during the outage itself.
"""

import importlib.util
import json
import os
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    """Each test controls its own budget/deadline/rung environment."""
    for var in ("FLOWCOMPARE_BENCH_DEADLINE", "FLOWCOMPARE_BENCH_BUDGET",
                "FLOWCOMPARE_BENCH_RUNG", "FLOWCOMPARE_BENCH_CHUNK",
                "FLOWCOMPARE_BENCH_PRESET", "FLOWCOMPARE_BENCH_ENCODER"):
        monkeypatch.delenv(var, raising=False)
    yield


def _stale_output(bench, capsys, why="test outage"):
    bench._emit_stale(why)
    return json.loads(capsys.readouterr().out.strip())


def _fail_if_called(name):
    def fn(*a, **k):
        pytest.fail(f"{name} must not be called")
    return fn


def test_emit_stale_prefers_last_good(bench, capsys, tmp_path, monkeypatch):
    last = {"metric": "points/sec/chip (nats eval, dulcet-universe)",
            "value": 123456.0, "unit": "points/sec", "vs_baseline": 1.646,
            "baseline": "estimated-a100", "recorded": "2026-08-19",
            "runs": [123000.0, 123456.0, 124000.0], "spread_pct": 0.8}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    out = _stale_output(bench, capsys)
    assert out["stale"] is True
    assert out["value"] == last["value"]
    assert out["vs_baseline"] == last["vs_baseline"]
    assert out["baseline"] == "estimated-a100"
    assert out["runs"] == last["runs"]          # spread survives the relabel
    assert out["spread_pct"] == last["spread_pct"]
    assert "STALE" in out["metric"] and "2026-08-19" in out["metric"]
    assert "test outage" in out["metric"]


def test_committed_authoritative_artifact_is_the_fallback(bench):
    """The stale chain reads exactly ONE file — the committed authoritative
    headline artifact — so a fallback can only republish the reconciled
    number, never a best-ever outlier from a side artifact."""
    committed = json.load(open(bench._LAST_GOOD))
    assert bench._load_last_good() == committed
    assert committed["value"] > 0
    assert committed.get("baseline") == "estimated-a100"


def test_emit_stale_without_any_artifact_raises(bench, monkeypatch,
                                                tmp_path):
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "a.json"))
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
                    if not bench._is_full_config(r)
                    and not r["encoder"].startswith("rolled"))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", str(degraded))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: True)
    monkeypatch.setattr(bench, "main", _fail_if_called("degraded bench"))
    monkeypatch.setattr(bench, "_encoder_canary_ok",
                        _fail_if_called("canary"))
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
    monkeypatch.setattr(bench, "main", _fail_if_called("backend touch"))
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True and "unreachable" in out["metric"]


def test_chip_wait_is_budget_capped(bench, capsys, tmp_path, monkeypatch):
    """With most of the budget gone, the chip wait must shrink so the
    stale emission still fits inside the deadline."""
    last = {"metric": "m", "value": 1.0, "unit": "points/sec",
            "vs_baseline": 0.1}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_DEADLINE",
                       repr(time.time() + 600.0))
    seen = {}

    def fake_wait(cap):
        seen["cap"] = cap
        return False

    monkeypatch.setattr(bench, "_wait_for_chip", fake_wait)
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True
    # 600s left - 240 (min fused watchdog) - 45 (stale reserve) ~= 315
    assert 60.0 <= seen["cap"] <= 330.0


def test_deadline_exhaustion_emits_stale_before_running(
        bench, capsys, tmp_path, monkeypatch):
    """Too little budget for even the minimum watchdog -> emit the recorded
    measurement instead of starting a rung that cannot finish."""
    last = {"metric": "m", "value": 7.0, "unit": "points/sec",
            "vs_baseline": 0.1}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_DEADLINE",
                       repr(time.time() + 120.0))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda cap: True)
    monkeypatch.setattr(bench, "main", _fail_if_called("rung"))
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True and "budget exhausted" in out["metric"]


def test_canary_failure_skips_the_onelaunch_retry(bench, tmp_path,
                                                  monkeypatch):
    """Rung 1 (the delayed full-config retry) must consult the encoder
    compile canary and jump PAST the known-bad configuration when it
    fails, instead of burning a watchdog re-proving the failure."""
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "missing.json"))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", "1")
    monkeypatch.setenv("FLOWCOMPARE_BENCH_DEADLINE",
                       repr(time.time() + 1200.0))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda cap: True)
    monkeypatch.setattr(bench, "_encoder_canary_ok", lambda t: False)
    monkeypatch.setattr(bench, "main", _fail_if_called("rung 1 bench"))
    seen = {}

    def fake_reexec(env):
        seen["rung"] = env["FLOWCOMPARE_BENCH_RUNG"]
        raise SystemExit(0)   # stand-in for the process being replaced

    monkeypatch.setattr(bench, "_reexec", fake_reexec)
    with pytest.raises(SystemExit):
        bench._main_with_rungs()
    assert seen["rung"] == "2"
    assert bench._RUNGS[1]["encoder"] == "onelaunch"  # what was skipped


def test_canary_pass_runs_the_retry(bench, tmp_path, monkeypatch):
    """A passing canary means the failure was transient: rung 1 runs."""
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "missing.json"))
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", "1")
    monkeypatch.setenv("FLOWCOMPARE_BENCH_DEADLINE",
                       repr(time.time() + 1200.0))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda cap: True)
    monkeypatch.setattr(bench, "_encoder_canary_ok", lambda t: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip delay
    ran = {}
    monkeypatch.setattr(
        bench, "main",
        lambda chunk, fused, encoder: ran.update(
            chunk=chunk, fused=fused, encoder=encoder))
    bench._main_with_rungs()
    assert ran == {"chunk": bench._RUNGS[1]["chunk"], "fused": True,
                   "encoder": "onelaunch"}


def test_stale_never_substitutes_a_different_preset(bench, monkeypatch):
    """A non-flagship preset request must fail loudly rather than emit the
    recorded dulcet-universe measurement under the wrong name."""
    monkeypatch.setenv("FLOWCOMPARE_BENCH_PRESET", "good-surf")
    assert bench._load_last_good() is None
    with pytest.raises(SystemExit):
        bench._emit_stale("compile host down")


@pytest.mark.parametrize("enc", ["rolled"])
def test_rolled_rungs_run_fresh_despite_recorded_measurement(
        bench, capsys, tmp_path, monkeypatch, enc):
    """The rolled rungs are within ~5-7% of full config, so a FRESH
    measurement there beats republishing a stale recorded number
    (VERDICT r4) — they must run even when bench_last_headline exists."""
    last = {"metric": "m", "value": 99999.0, "unit": "points/sec",
            "vs_baseline": 1.333, "recorded": "2026-08-19"}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    rolled = next(i for i, r in enumerate(bench._RUNGS)
                  if r["encoder"] == enc)
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", str(rolled))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: True)
    ran = {}

    def fake_main(chunk, fused=True, encoder="onelaunch"):
        ran.update(chunk=chunk, fused=fused, encoder=encoder)
        print(json.dumps({"metric": "fresh", "value": 1.0,
                          "unit": "points/sec", "vs_baseline": 0.0}))

    monkeypatch.setattr(bench, "main", fake_main)
    bench._main_with_rungs()
    assert ran == {"chunk": 80, "fused": True, "encoder": enc}


def _auth_artifact(value=380000.0, age_s=3600.0):
    return {"metric": "points/sec/chip (nats eval, dulcet-universe, "
                      "80-batch chunks)",
            "value": value, "unit": "points/sec", "vs_baseline": 5.07,
            "baseline": "estimated-a100", "recorded": "2026-08-21",
            "recorded_unix": int(time.time() - age_s),
            "runs": [375000.0, value, 386000.0], "spread_pct": 2.9,
            "worker": "w", "chunk": 80, "preset": "dulcet-universe"}


def test_same_round_authoritative_median_is_emitted_not_remeasured(
        bench, capsys, tmp_path, monkeypatch):
    """A fresh (<18 h) headline_runs.py median-of->=3 IS this round's
    measurement — bench.py must republish it stale:false without touching
    the chip (one more fresh run cannot beat the median of three, and the
    ladder risks the driver window)."""
    p = tmp_path / "last.json"
    p.write_text(json.dumps(_auth_artifact()))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    monkeypatch.setattr(bench, "_wait_for_chip", _fail_if_called("chip"))
    monkeypatch.setattr(bench, "main", _fail_if_called("bench"))
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is False
    assert out["value"] == 380000.0 and out["runs"] == _auth_artifact()["runs"]
    assert "median-of-3" in out["source"]


def test_aged_authoritative_median_walks_the_ladder(
        bench, capsys, tmp_path, monkeypatch):
    """An authoritative median older than the round must NOT be republished
    as fresh — the ladder runs (here: chip unreachable -> stale label).
    Age comes from the artifact's own recorded_unix; a fresh file mtime
    (e.g. a new git checkout) must NOT rejuvenate it."""
    p = tmp_path / "last.json"
    p.write_text(json.dumps(_auth_artifact(age_s=19 * 3600)))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: False)
    monkeypatch.setattr(bench, "main", _fail_if_called("bench"))
    bench._main_with_rungs()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True


def test_interim_artifact_never_takes_the_authoritative_fast_path(
        bench, tmp_path, monkeypatch):
    art = dict(_auth_artifact(), interim=True)
    p = tmp_path / "last.json"
    p.write_text(json.dumps(art))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    assert bench._authoritative_recent() is None


def test_artifact_without_recorded_unix_never_fast_paths(
        bench, tmp_path, monkeypatch):
    """Pre-round-5 artifacts (no recorded_unix) have no trustworthy age —
    file mtime lies after any checkout — so they take the ladder."""
    art = _auth_artifact()
    del art["recorded_unix"]
    p = tmp_path / "last.json"
    p.write_text(json.dumps(art))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    assert bench._authoritative_recent() is None


def test_explicit_rung_request_bypasses_the_fast_path(
        bench, tmp_path, monkeypatch):
    """FLOWCOMPARE_BENCH_RUNG is an operator asking for a specific fresh
    configuration — the authoritative republish must not override it."""
    p = tmp_path / "last.json"
    p.write_text(json.dumps(_auth_artifact()))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    rolled = next(i for i, r in enumerate(bench._RUNGS)
                  if r["encoder"] == "rolled")
    monkeypatch.setenv("FLOWCOMPARE_BENCH_RUNG", str(rolled))
    monkeypatch.setattr(bench, "_wait_for_chip", lambda *a, **k: True)
    ran = {}
    monkeypatch.setattr(
        bench, "main",
        lambda chunk, fused=True, encoder="onelaunch": ran.update(
            encoder=encoder))
    bench._main_with_rungs()
    assert ran.get("encoder") == "rolled"


def test_force_fresh_overrides_the_fast_path(bench, tmp_path, monkeypatch):
    p = tmp_path / "last.json"
    p.write_text(json.dumps(_auth_artifact()))
    monkeypatch.setattr(bench, "_LAST_GOOD", str(p))
    assert bench._authoritative_recent() is not None
    monkeypatch.setenv("FLOWCOMPARE_BENCH_FORCE_FRESH", "1")
    assert bench._authoritative_recent() is None


def test_ladder_shape(bench):
    """The ladder must try the fastest configuration first, only shrink,
    end with the pure-XLA rung (the only one the 2026-08-20 degraded
    compile host was proven to accept), and fit inside the default budget
    in the worst case."""
    rungs = bench._RUNGS
    assert rungs[0]["chunk"] == 80 and bench._is_full_config(rungs[0])
    # chunk sizes only shrink, except the "rolled" near-full-perf rung
    # which re-raises to 80 (its compile footprint is the small one)
    chunks = [r["chunk"] for r in rungs
              if not r["encoder"].startswith("rolled")]
    assert chunks == sorted(chunks, reverse=True)
    assert not rungs[-1]["fused"] and rungs[-1]["encoder"] == "xla"
    # degradation is monotone: once a kernel is dropped it stays dropped
    order = {"onelaunch": 0, "rolled_x": 1, "rolled": 2, "stages": 3,
             "xla": 4}
    for a, b in zip(rungs, rungs[1:]):
        assert a["fused"] >= b["fused"]
        assert order[a["encoder"]] <= order[b["encoder"]]
    assert all(r["watchdog"] >= 300 for r in rungs)
    # exactly one delayed-retry rung to ride out transient host pressure,
    # and it is the canary-gated one-launch retry
    delayed = [r for r in rungs if r["delay"]]
    assert len(delayed) == 1 and delayed[0]["encoder"] == "onelaunch"
    # worst realistic walk (rung 0 + canary + stale emission) fits the
    # default budget with the chip-wait cap doing the remaining squeeze
    worst = (rungs[0]["watchdog"] + 300  # canary cap
             + bench._STALE_RESERVE_S)
    assert worst < bench._DEFAULT_BUDGET_S


def test_deadline_is_installed_and_inherited(bench, monkeypatch):
    monkeypatch.setenv("FLOWCOMPARE_BENCH_BUDGET", "900")
    d = bench._deadline()
    assert 890 <= d - time.time() <= 905
    # a re-exec'd child sees the SAME deadline, not a fresh budget
    assert os.environ["FLOWCOMPARE_BENCH_DEADLINE"] == repr(d)
    assert bench._deadline() == d
