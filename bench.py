"""Headline benchmark: points/sec/chip on the flagship nats-eval.

Runs the full dulcet-universe model (115 flow layers, latent 300, DGCNN
attention conditioner, 165M params) at the reference's eval workload
(batch 20, 1024 target / 1250 context points per item) on the attached TPU
chip, measuring sustained dataset-eval throughput: chunks of CHUNK batches
are evaluated per compiled dispatch (lax.scan over the chunk — exactly how
an eval loop over a dataset amortises host dispatch), with a forced host
sync per chunk.

The model runs the eval fast path: bf16 compute with f32 ldj accumulation
(nats drift 0.002 vs pure f32, budget +-0.01), the fused flow-layer
megakernel (nats identical to the scan path to 5 decimals), and the fused
edge-conv kernel (bit-exact vs the gather path).

vs_baseline is measured against an ESTIMATED A100 throughput for the
PyTorch reference, since the reference publishes no throughput numbers
(BASELINE.md): ~175M MACs/point in the flow stack + encoder, A100 TF32
(torch matmul default on Ampere) at a realistic ~35% utilisation, halved
for the reference's 345-module per-layer dispatch + activation
checkpointing overhead => ~75k points/sec. Every emitted JSON carries
"baseline": "estimated-a100" so the estimate is machine-readable.
The north-star target (>=5x, BASELINE.json) is therefore ~375k points/sec.

Degraded-environment behavior and the DEADLINE CONTRACT: the hosted
backend's REMOTE compile helper can SIGKILL large programs (the one-launch
encoder megakernel is the proven trigger — tools/probe_compile_health2.py,
2026-08-20) or hang outright, and the TPU worker itself can be down for
hours. The driver runs this script under a finite timeout (~28 min
observed), so for the DRIVER invocation (bare `python bench.py`, flagship
preset, a committed recorded artifact present) the worst case must still
print one JSON line within the budget. (Manual FLOWCOMPARE_BENCH_CHUNK
runs and non-flagship presets are interactive tooling: they fail loudly
instead of emitting a substitute measurement.) Mechanism:

  * a global wall-clock deadline (default 1200 s, FLOWCOMPARE_BENCH_BUDGET
    to override) installed in the environment on first entry and inherited
    by every watchdog re-exec;
  * the chip-wait, every rung's watchdog, and the compile-health canary
    are all capped to the remaining budget;
  * after a rung-0 failure, the encoder-kernel compile canary
    (tools/probe_encoder_compile.py) decides between one delayed retry
    (transient pressure) and skipping straight past the known-bad
    configuration (degraded host);
  * degraded-kernel rungs only run when no recorded full-config
    measurement exists — a recorded flagship measurement, explicitly
    labeled "stale": true, is more representative than a fresh number
    with kernels disabled;
  * whenever the remaining budget cannot fit the next rung, the recorded
    measurement is emitted immediately.

The authoritative recorded measurement lives in
save/bench/bench_last_headline.json — median of >=3 fresh full-config
runs + spread, written only by tools/headline_runs.py (never by this
script), so the stale fallback can only republish the reconciled number.
"""

import json
import os
import subprocess
import sys
import threading
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
_SCRIPT = os.path.abspath(__file__)
_LAST_GOOD = os.path.join(_ROOT, "save", "bench", "bench_last_headline.json")
_BASELINE_TAG = "estimated-a100"

# --- deadline machinery -----------------------------------------------------

_DEADLINE_ENV = "FLOWCOMPARE_BENCH_DEADLINE"
_DEFAULT_BUDGET_S = 1200.0   # 20 min, well under the ~28-min driver window
_STALE_RESERVE_S = 45.0      # time reserved to print the stale fallback
_MIN_FUSED_WATCHDOG_S = 240.0  # fused compiles take ~100-300 s when healthy
_MIN_XLA_WATCHDOG_S = 150.0    # pure-XLA program compiled in 72 s


def _deadline() -> float:
    """Global wall-clock deadline (epoch seconds). Installed into the
    environment on first use so watchdog re-execs inherit the ORIGINAL
    deadline rather than restarting their own budget."""
    env = os.environ.get(_DEADLINE_ENV)
    if env:
        return float(env)
    budget = float(os.environ.get("FLOWCOMPARE_BENCH_BUDGET",
                                  _DEFAULT_BUDGET_S))
    d = time.time() + budget
    os.environ[_DEADLINE_ENV] = repr(d)
    return d


def _remaining() -> float:
    return _deadline() - time.time()


def _wait_for_chip(max_wait_s: float = 1800.0) -> bool:
    """Give a restarting TPU worker a bounded chance to come back.

    The axon backend blocks INDEFINITELY inside backend init while the
    remote worker restarts (outages of 10 min - hours observed), so probe
    with short-lived subprocesses — this process must not touch jax until
    a probe succeeds. Returns True once a tiny matmul executes."""
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    while True:
        try:
            p = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True)
            if p.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        time.sleep(30)


def _encoder_canary_ok(timeout_s: float) -> bool:
    """Does the one-launch encoder megakernel (the proven compile-helper
    killer) compile+run right now? Subprocess so a hang can't take this
    process down with it."""
    try:
        p = subprocess.run(
            [sys.executable,
             os.path.join(_ROOT, "tools", "probe_encoder_compile.py")],
            timeout=max(30.0, timeout_s), capture_output=True)
        return p.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


import jax

# Persistent compilation cache (save/jax_cache): executables round-trip
# through the axon plugin (save/bench/probe_compile_cache.json), so one
# healthy-host compile of the fused program survives later compile-helper
# degradation. Must be set before the first compile; every watchdog
# re-exec and ladder rung shares the same dir.
from flowcompare_tpu.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

A100_BASELINE_POINTS_PER_SEC = 75_000.0
N_CHUNKS = 3       # timed chunks

# Ladder of progressively more compile-friendly configurations, walked on
# failure (each rung in a fresh process — a killed compile helper can leave
# the backend client unusable). encoder: "onelaunch" = the one-launch DGCNN
# megakernel (fastest, biggest compile — the proven killer on a degraded
# host), "stages" = per-stage edge-conv Pallas kernels + XLA glue (4 small
# compiles, ~99% of the headline — encoder one-launch vs per-stage measured
# at 18.7 vs 19.4 ms of an ~83 ms batch), "xla" = pure-XLA gather encoder
# (compiled in 108 s on the 2026-08-20 degraded host). Rung 1 re-tries the
# full configuration once after a delay, but only when the compile-health
# canary clears it (transient host pressure, not the degraded state).
_RUNGS = (
    {"chunk": 80, "fused": True,  "encoder": "onelaunch",
     "delay": 0,  "watchdog": 480},
    {"chunk": 40, "fused": True,  "encoder": "onelaunch",
     "delay": 60, "watchdog": 420},
    # "rolled": the one-launch encoder with rolled row-major extraction
    # (_UNROLL_EXTRACT/_TRANSPOSED_EXTRACT/_EXTRACT_X off) — the ONE
    # eval-kNN kernel shape the 2026-08-21 degraded compile host accepts
    # (33-40 s compiles while every unrolled or transposed variant hangs;
    # save/bench/probe_compile_variants.json). A FRESH measurement here
    # lands ~4.6-4.7x — which beats republishing a stale 4.85x (VERDICT
    # r4), so unlike the rungs below it runs even when a recorded
    # measurement exists. (The "rolled_x" low-rank-gather variant also
    # compiles degraded but measured a same-worker WASH — 350.5k vs
    # 351.2k — so it is a manual encoder mode, not a rung: extract_x's
    # ~2 ms win exists only in the unrolled extraction codegen.)
    {"chunk": 80, "fused": True,  "encoder": "rolled",
     "delay": 0,  "watchdog": 420},
    # Rungs below measure a deeply DEGRADED configuration; they only run
    # when no recorded full-config measurement exists (_main_with_rungs).
    {"chunk": 40, "fused": True,  "encoder": "stages",
     "delay": 0,  "watchdog": 420},
    {"chunk": 10, "fused": True,  "encoder": "xla",
     "delay": 0,  "watchdog": 420},
    {"chunk": 10, "fused": False, "encoder": "xla",
     "delay": 0,  "watchdog": 420},
)


def _is_full_config(rung: dict) -> bool:
    return rung["fused"] and rung["encoder"] == "onelaunch"


_PATH_LABELS = {"onelaunch": "",
                "rolled_x": ", rolled-extraction encoder (low-rank gather)",
                "rolled": ", rolled-extraction encoder",
                "stages": ", per-stage encoder kernels",
                "xla": ", xla encoder"}


def main(chunk: int, fused: bool = True, encoder: str = "onelaunch"):
    # NOTE: the caller (_main_with_rungs) is responsible for _wait_for_chip
    # — waiting here would race the per-rung watchdog and mislabel a plain
    # chip outage as a compile-host failure.
    import flowcompare_tpu as fc

    # `flowcompare bench --preset X --batch-size B` parameterizes through the
    # env (cli.py cmd_bench); the bare driver invocation benches the flagship
    preset = os.environ.get("FLOWCOMPARE_BENCH_PRESET", "dulcet-universe")
    cfg = fc.get_config(preset)
    if os.environ.get("FLOWCOMPARE_BENCH_BATCH"):
        cfg["batch_size"] = int(os.environ["FLOWCOMPARE_BENCH_BATCH"])
    # bf16 compute / f32 ldj policy: nats delta vs pure-f32 measured at 0.002
    # (within the +-0.01 parity budget)
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4
    if encoder == "xla":
        cfg["fused_encoder"] = False
    elif encoder == "stages":
        # per-stage edge-conv kernels instead of the one-launch megakernel
        from flowcompare_tpu.encoders import dgcnn as _dgcnn
        _dgcnn._ONE_LAUNCH = False
    elif encoder in ("rolled", "rolled_x"):
        # one-launch megakernel, rolled row-major extraction (the
        # degraded-host-compilable variant — see _RUNGS comment);
        # "rolled_x" keeps the low-rank extract_x gather (also accepted by
        # the degraded helper, probed 2026-08-21: 40.4 s compile) for the
        # ~2 ms/batch extraction win
        from flowcompare_tpu.ops import edgeconv_pallas as _ep
        _ep._UNROLL_EXTRACT = False
        _ep._TRANSPOSED_EXTRACT = False
        _ep._EXTRACT_X = encoder == "rolled_x"
    # remat off (eval forward — no memory/compute trade needed),
    # fused_layers on (Pallas flow-layer megakernel, eval-only)
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=fused)

    params, state = model.init_params(jax.random.PRNGKey(0))
    batch_size = cfg["batch_size"]  # 20, per reference config
    # fresh per-run salt: the tunnel memoizes repeated (name, inputs) calls
    # even across processes (MEASUREMENT TRAP 3, CLAUDE.md) — fixed keys
    # would let a rerun ride memoized results instead of executing
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(1), salt), 4)

    def make_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (chunk, batch_size, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (chunk, batch_size, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i),
                              (chunk, batch_size, 1)),
        )

    @jax.jit
    def eval_chunk(params, state, batches, rng):
        def body(i, xs):
            loss, _, nats, _ = fc.inner_loop(
                model, params, state, xs, rng=jax.random.fold_in(rng, i),
                training=False)
            return i + 1, (loss, nats)

        _, (losses, nats) = jax.lax.scan(body, 0, batches)
        return losses, nats

    # Pre-build every chunk ON DEVICE before the timed region: make_chunk
    # runs 3 EAGER ops (fold_in + normal per tensor), and through the
    # tunnel each eager dispatch costs ~12-30 ms — leaving input
    # generation inside the loop silently adds up to ~9 ms/batch at
    # CHUNK=10 (discovered 2026-08-18; a dataset-eval loop would stream
    # real data with the input pipeline overlapped, so device-resident
    # inputs are the honest model).
    warm_chunks = [make_chunk(100 + w) for w in range(2)]
    timed_chunks = [make_chunk(i) for i in range(N_CHUNKS)]
    jax.block_until_ready((warm_chunks, timed_chunks))

    # warmup: first call pays compilation, second the one-time
    # executable-load hit this backend charges (~1s). float() forces a real
    # device sync through the hosted-TPU tunnel (block_until_ready can
    # return early there).
    for c in warm_chunks:
        losses, nats = eval_chunk(params, state, c, ks[3])
        float(losses[0])

    t0 = time.perf_counter()
    for c in timed_chunks:
        losses, nats = eval_chunk(params, state, c, ks[3])
        float(losses[0])
    dt = (time.perf_counter() - t0) / N_CHUNKS

    points_per_sec = chunk * batch_size * cfg["sample_size"] / dt
    path = _PATH_LABELS[encoder] if fused else ", scan path"
    result = {
        "metric": (f"points/sec/chip (nats eval, {preset}, "
                   f"{chunk}-batch chunks{path})"),
        "value": round(points_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(points_per_sec / A100_BASELINE_POINTS_PER_SEC, 3),
        "baseline": _BASELINE_TAG,
    }
    if not (fused and encoder == "onelaunch"):
        result["degraded"] = True
    print(json.dumps(result), flush=True)


def _load_last_good():
    """The authoritative recorded full-config measurement of the flagship
    preset (median of >=3 runs, written by tools/headline_runs.py), or
    None. Shared by the degraded-rung gate and _emit_stale so they can
    never disagree about whether a fallback measurement exists."""
    if os.environ.get("FLOWCOMPARE_BENCH_PRESET",
                      "dulcet-universe") != "dulcet-universe":
        return None   # recorded artifacts are flagship-only
    try:
        with open(_LAST_GOOD) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


_AUTHORITATIVE_MAX_AGE_S = 18 * 3600.0


def _authoritative_recent():
    """The recorded headline, IF it is an authoritative same-round
    measurement: a tools/headline_runs.py median of >=3 fresh full-config
    runs (not the hand-reconciled interim) recorded within the last 18 h
    (same driver round, by construction of the round cadence). Such an
    artifact is this round's measurement campaign — republishing it is
    not staleness, and it is statistically stronger than one more fresh
    run (worker-to-worker spread ~13%). Age comes from the artifact's own
    recorded_unix field (written by the measuring process) — NOT file
    mtime, which any git checkout/clone resets to 'now' and would make a
    months-old artifact look fresh. Returns (artifact, age_s) or None.
    Opt out with FLOWCOMPARE_BENCH_FORCE_FRESH=1."""
    if os.environ.get("FLOWCOMPARE_BENCH_FORCE_FRESH"):
        return None
    last = _load_last_good()
    if (last is None or last.get("interim")
            or len(last.get("runs", [])) < 3
            or not isinstance(last.get("recorded_unix"), (int, float))):
        return None
    age = time.time() - last["recorded_unix"]
    return (last, age) if 0 <= age <= _AUTHORITATIVE_MAX_AGE_S else None


def _emit_authoritative(last: dict, age_s: float):
    out = dict(last)
    out["stale"] = False
    out["source"] = (f"tools/headline_runs.py median-of-{len(last['runs'])}"
                     f" measured {age_s / 3600.0:.1f}h ago (same round)")
    print(json.dumps(out), flush=True)


def _emit_stale(why: str):
    """Last resort: print the most recent successful chip measurement,
    explicitly labeled stale, instead of failing the round's artifact."""
    last = _load_last_good()
    if last is None:
        raise SystemExit(f"bench: {why}, and no recorded measurement of the "
                         "requested configuration to fall back on")
    out = {
        "metric": last["metric"] + f" [STALE: {why}; last recorded chip "
        f"measurement {last.get('recorded', 'of a prior run')}]",
        "value": last["value"],
        "unit": last["unit"],
        "vs_baseline": last["vs_baseline"],
        "baseline": last.get("baseline", _BASELINE_TAG),
        "stale": True,
    }
    if "runs" in last:
        out["runs"] = last["runs"]
    if "spread_pct" in last:
        out["spread_pct"] = last["spread_pct"]
    if last.get("interim"):
        # the recorded artifact itself is a hand-reconciled interim number
        # (not yet a headline_runs.py median-of->=3) — surface that
        out["interim"] = True
    print(json.dumps(out), flush=True)


def _reexec(env: dict):
    """Replace this process (hung backend threads and all) with a fresh
    ladder step. Factored out so tests can intercept it."""
    os.execve(sys.executable, [sys.executable, _SCRIPT], env)


def _advance_to(rung_i: int, reason: str):
    sys.stderr.write(f"bench: advancing to rung {rung_i} ({reason})\n")
    sys.stderr.flush()
    env = dict(os.environ, FLOWCOMPARE_BENCH_RUNG=str(rung_i))
    _reexec(env)


def _main_with_rungs():
    """Walk the _RUNGS ladder across fresh processes with a wall-clock
    watchdog per rung (compile requests can HANG, not just fail) and a
    GLOBAL deadline: every wait is budget-capped and the recorded
    measurement is emitted the moment the budget can no longer fit a rung.
    FLOWCOMPARE_BENCH_CHUNK pins a single manual configuration with no
    ladder (and no deadline — manual runs are interactive tooling)."""
    manual = os.environ.get("FLOWCOMPARE_BENCH_CHUNK")
    if manual is not None:
        # bounded chip wait even for manual runs: touching jax during a
        # worker outage blocks FOREVER in backend init (CLAUDE.md) — fail
        # loudly instead of hanging the caller's terminal/subprocess
        wait_s = float(os.environ.get("FLOWCOMPARE_BENCH_WAIT", "600"))
        if not _wait_for_chip(wait_s):
            raise SystemExit(
                f"bench: TPU worker unreachable (waited {wait_s:.0f}s); "
                "manual runs do not emit stale fallbacks")
        enc = os.environ.get("FLOWCOMPARE_BENCH_ENCODER", "onelaunch")
        if os.environ.get("FLOWCOMPARE_BENCH_FUSED_ENCODER", "1") == "0":
            enc = "xla"
        main(int(manual),
             fused=os.environ.get("FLOWCOMPARE_BENCH_FUSED", "1") != "0",
             encoder=enc)
        return

    # Same-round authoritative median (headline_runs.py, n>=3, <18 h old):
    # emit it outright — fresher per-run data cannot beat the median of
    # three fresh runs from the same round, and skipping the ladder keeps
    # the driver window safe regardless of current host health. An
    # EXPLICIT rung request is an operator asking for a specific fresh
    # configuration (CLAUDE.md degraded-host workflow) — honor it.
    if os.environ.get("FLOWCOMPARE_BENCH_RUNG") is None:
        auth = _authoritative_recent()
        if auth is not None:
            _emit_authoritative(*auth)
            return

    _deadline()   # install the global budget before any waiting starts

    rung_i = int(os.environ.get("FLOWCOMPARE_BENCH_RUNG", "0"))
    if rung_i >= len(_RUNGS):
        _emit_stale("compile host rejected every ladder configuration")
        return

    rung = _RUNGS[rung_i]
    # Degraded-rung gate FIRST — it needs no chip, and reaching a degraded
    # rung means the fused program already failed upstream: a recorded
    # full-config measurement (labeled stale) beats a fresh measurement
    # with kernels disabled. (Checking before the chip wait also keeps the
    # stale label accurate — the worker often restarts right after the
    # compile-helper SIGKILLs, and a probe here would misattribute the
    # compile failure to a worker outage.)
    if (not _is_full_config(rung)
            and not rung["encoder"].startswith("rolled")
            and _load_last_good() is not None):
        _emit_stale("compile host cannot fit the fused program; "
                    "degraded-kernel rungs skipped in favor of the last "
                    "full-config measurement")
        return

    # bounded wait for a mid-restart TPU worker, BEFORE any watchdog starts:
    # a plain chip outage must surface as "worker unreachable" at rung 0,
    # not be misattributed to the compile host after walking the ladder.
    # Budget-capped so a long outage still leaves room for one rung attempt
    # (or, failing that, the stale emission).
    wait_cap = max(60.0, min(1800.0, _remaining() - _MIN_FUSED_WATCHDOG_S
                             - _STALE_RESERVE_S))
    if not _wait_for_chip(wait_cap):
        _emit_stale(f"TPU worker unreachable (waited {wait_cap:.0f}s)")
        return

    if rung_i > 0 and rung["encoder"] == "onelaunch":
        # a one-launch retry is only worth the budget if the compile-health
        # canary clears the known killer; a failed canary means the host is
        # in the degraded state and this configuration cannot compile
        canary_t = min(300.0, _remaining() - _STALE_RESERVE_S - 60.0)
        if canary_t < 60.0 or not _encoder_canary_ok(canary_t):
            _advance_to(rung_i + 1,
                        "encoder-kernel compile canary failed "
                        "(degraded compile host)")
            return

    min_wd = (_MIN_FUSED_WATCHDOG_S if rung["fused"]
              else _MIN_XLA_WATCHDOG_S)
    watchdog_s = min(float(rung["watchdog"]),
                     _remaining() - rung["delay"] - _STALE_RESERVE_S)
    if watchdog_s < min_wd:
        _emit_stale(f"budget exhausted ({_remaining():.0f}s left) before "
                    f"rung {rung_i} could run")
        return

    done = threading.Event()

    def _watchdog_fire():
        if done.is_set():   # measurement finished just before the deadline
            return
        _advance_to(rung_i + 1, f"rung {rung_i} watchdog {watchdog_s:.0f}s")

    if rung["delay"]:
        time.sleep(rung["delay"])
    dog = threading.Timer(watchdog_s, _watchdog_fire)
    dog.daemon = True
    dog.start()
    try:
        main(rung["chunk"], fused=rung["fused"], encoder=rung["encoder"])
        done.set()
    except Exception as e:
        done.set()
        dog.cancel()
        _advance_to(rung_i + 1, f"rung {rung_i} failed: {repr(e)[:300]}")
        return
    dog.cancel()


if __name__ == "__main__":
    _main_with_rungs()
