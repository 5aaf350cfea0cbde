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

vs_baseline is measured against an estimated A100 throughput for the
PyTorch reference, since the reference publishes no throughput numbers
(BASELINE.md): ~175M MACs/point in the flow stack + encoder, A100 TF32
(torch matmul default on Ampere) at a realistic ~35% utilisation, halved
for the reference's 345-module per-layer dispatch + activation
checkpointing overhead => ~75k points/sec. The north-star target
(>=5x, BASELINE.json) is therefore ~375k points/sec/chip.

Degraded-environment behavior: the hosted backend's REMOTE compile helper
can SIGKILL on large programs (OOM on the compile host — observed
2026-08-20 at every chunk size for the ~1MB-MLIR fused program, while tiny
programs compiled fine) or hang outright. Rather than fail the round's
bench artifact, `_main_with_rungs` walks a ladder of progressively more
compile-friendly configurations (smaller chunks -> delayed retry ->
pure-XLA scan path) in fresh processes, each under a wall-clock watchdog,
and as a last resort emits the most recent successful chip measurement
explicitly labeled "stale": true.
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


import jax
import jax.numpy as jnp

A100_BASELINE_POINTS_PER_SEC = 75_000.0
N_CHUNKS = 3       # timed chunks

# Ladder of progressively more compile-friendly configurations, walked on
# failure. Measured on the degraded compile host of 2026-08-20 (probes:
# tools/probe_compile_health{,2}.py): any program containing the one-launch
# encoder megakernel was SIGKILLed (or hung — hence the watchdogs), the
# flow megakernel WITHOUT the encoder kernel compiled in 108 s, pure XLA in
# 72 s. Chunk 80 -> 10 costs ~4% throughput (save/bench/ab_bench_chunk.json)
# and covers the failure class where only the biggest program is rejected;
# the delayed retry covers transient host pressure.
_RUNGS = (
    {"chunk": 80, "fused": True,  "fused_encoder": True,
     "delay": 0,   "watchdog": 1500},
    {"chunk": 10, "fused": True,  "fused_encoder": True,
     "delay": 120, "watchdog": 1200},
    # Rungs below measure a DEGRADED configuration (the host won't compile
    # the full program). A recorded full-config measurement, explicitly
    # labeled stale, is more representative of the framework than a fresh
    # number with kernels disabled — so these only run when no full-config
    # measurement exists (see _main_with_rungs).
    {"chunk": 10, "fused": True,  "fused_encoder": False,
     "delay": 0,   "watchdog": 900},
    {"chunk": 10, "fused": False, "fused_encoder": False,
     "delay": 0,   "watchdog": 900},
)


def main(chunk: int, fused: bool = True, fused_encoder: bool = True):
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
    if not fused_encoder:
        cfg["fused_encoder"] = False
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
    path = ("" if fused and fused_encoder
            else ", xla encoder" if fused else ", scan path")
    result = {
        "metric": (f"points/sec/chip (nats eval, {preset}, "
                   f"{chunk}-batch chunks{path})"),
        "value": round(points_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(points_per_sec / A100_BASELINE_POINTS_PER_SEC, 3),
    }
    print(json.dumps(result), flush=True)
    if _should_record(preset, fused, fused_encoder, chunk):
        # record the measurement for the stale fallback of future runs;
        # write atomically — a watchdog re-exec mid-dump must not leave a
        # truncated artifact behind
        try:
            os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
            tmp = _LAST_GOOD + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(result, recorded=time.strftime("%Y-%m-%d"),
                               preset=preset, chunk=chunk), f)
            os.replace(tmp, _LAST_GOOD)
        except OSError:
            pass


def _should_record(preset: str, fused: bool, fused_encoder: bool,
                   chunk: int) -> bool:
    """Record _LAST_GOOD only for a representative flagship measurement:
    full kernel config, full-scale chunking (a manual FLOWCOMPARE_BENCH_CHUNK
    smoke run at a tiny chunk is dispatch-dominated and must not become the
    number stale fallbacks republish), default batch size."""
    return (preset == "dulcet-universe" and fused and fused_encoder
            and chunk >= 40
            and "FLOWCOMPARE_BENCH_BATCH" not in os.environ)


def _load_last_good():
    """The most recent recorded FULL-CONFIG measurement of the flagship
    preset, or None. Shared by the degraded-rung gate and _emit_stale so
    they can never disagree about whether a fallback measurement exists."""
    if os.environ.get("FLOWCOMPARE_BENCH_PRESET",
                      "dulcet-universe") != "dulcet-universe":
        return None   # recorded artifacts are flagship-only
    for path in (_LAST_GOOD,
                 os.path.join(_ROOT, "save", "bench",
                              "bench_headline_transposed.json")):
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            continue
    return None


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
        "stale": True,
    }
    print(json.dumps(out), flush=True)


def _main_with_rungs():
    """Walk the _RUNGS ladder across fresh processes (re-exec on failure —
    a killed compile helper can leave the backend client unusable) with a
    wall-clock watchdog per rung (compile requests can HANG, not just
    fail). FLOWCOMPARE_BENCH_CHUNK pins a single manual configuration with
    no ladder."""
    # bounded wait for a mid-restart TPU worker, BEFORE any watchdog starts:
    # a plain chip outage must surface as "worker unreachable" at rung 0,
    # not be misattributed to the compile host after walking the ladder
    if not _wait_for_chip():
        _emit_stale("TPU worker unreachable (waited 30 min)")
        return
    manual = os.environ.get("FLOWCOMPARE_BENCH_CHUNK")
    if manual is not None:
        main(int(manual),
             fused=os.environ.get("FLOWCOMPARE_BENCH_FUSED", "1") != "0",
             fused_encoder=os.environ.get("FLOWCOMPARE_BENCH_FUSED_ENCODER",
                                          "1") != "0")
        return
    rung_i = int(os.environ.get("FLOWCOMPARE_BENCH_RUNG", "0"))
    if rung_i >= len(_RUNGS):
        _emit_stale("compile host rejected every ladder configuration")
        return
    rung = _RUNGS[rung_i]
    if (not (rung["fused"] and rung["fused_encoder"])
            and _load_last_good() is not None):
        # entering the degraded rungs: a recorded full-config measurement
        # (labeled stale) beats a fresh measurement with kernels disabled
        _emit_stale("compile host cannot fit the fused program; "
                    "degraded-kernel rungs skipped in favor of the last "
                    "full-config measurement")
        return

    done = threading.Event()

    def _advance(reason: str):
        sys.stderr.write(f"bench: rung {rung_i} {rung} failed ({reason}); "
                         f"advancing\n")
        sys.stderr.flush()
        env = dict(os.environ, FLOWCOMPARE_BENCH_RUNG=str(rung_i + 1))
        os.execve(sys.executable, [sys.executable, _SCRIPT], env)

    def _watchdog_fire():
        if done.is_set():   # measurement finished just before the deadline
            return
        _advance(f"watchdog {rung['watchdog']}s")

    if rung["delay"]:
        time.sleep(rung["delay"])
    dog = threading.Timer(rung["watchdog"], _watchdog_fire)
    dog.daemon = True
    dog.start()
    try:
        main(rung["chunk"], fused=rung["fused"],
             fused_encoder=rung["fused_encoder"])
        done.set()
    except Exception as e:
        done.set()
        dog.cancel()
        _advance(repr(e)[:300])
    dog.cancel()


if __name__ == "__main__":
    _main_with_rungs()
