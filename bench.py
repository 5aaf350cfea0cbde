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
    # bounded wait if the TPU worker happens to be mid-restart (otherwise
    # backend init inside the first op below blocks with no timeout)
    if not _wait_for_chip():
        _emit_stale("TPU worker unreachable")
        return

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
    print(json.dumps(result))
    if (preset == "dulcet-universe" and fused and fused_encoder
            and "FLOWCOMPARE_BENCH_BATCH" not in os.environ):
        # record the measurement for the stale-fallback rung of future runs
        try:
            os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
            with open(_LAST_GOOD, "w") as f:
                json.dump(dict(result, recorded=time.strftime("%Y-%m-%d"),
                               fused=fused), f)
        except OSError:
            pass


def _emit_stale(why: str):
    """Last resort: print the most recent successful chip measurement,
    explicitly labeled stale, instead of failing the round's artifact."""
    for path in (_LAST_GOOD,
                 os.path.join(_ROOT, "save", "bench",
                              "bench_headline_transposed.json")):
        try:
            with open(path) as f:
                last = json.load(f)
            break
        except (OSError, ValueError):
            last = None
    if last is None:
        raise SystemExit(f"bench: {why} and no recorded measurement to fall "
                         "back on")
    out = {
        "metric": last["metric"] + f" [STALE: {why}; last recorded chip "
        f"measurement {last.get('recorded', 'of a prior run')}]",
        "value": last["value"],
        "unit": last["unit"],
        "vs_baseline": last["vs_baseline"],
        "stale": True,
    }
    print(json.dumps(out))


def _main_with_rungs():
    """Walk the _RUNGS ladder across fresh processes (re-exec on failure —
    a killed compile helper can leave the backend client unusable) with a
    wall-clock watchdog per rung (compile requests can HANG, not just
    fail). FLOWCOMPARE_BENCH_CHUNK pins a single manual configuration with
    no ladder."""
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
    if not (rung["fused"] and rung["fused_encoder"]):
        # entering the degraded rungs: a recorded full-config measurement
        # (labeled stale) beats a fresh measurement with kernels disabled
        try:
            with open(_LAST_GOOD) as f:
                json.load(f)
            _emit_stale("compile host cannot fit the fused program; "
                        "degraded-kernel rungs skipped in favor of the last "
                        "full-config measurement")
            return
        except (OSError, ValueError):
            pass

    def _advance(reason: str):
        sys.stderr.write(f"bench: rung {rung_i} {rung} failed ({reason}); "
                         f"advancing\n")
        sys.stderr.flush()
        env = dict(os.environ, FLOWCOMPARE_BENCH_RUNG=str(rung_i + 1))
        os.execve(sys.executable, [sys.executable, _SCRIPT], env)

    if rung["delay"]:
        time.sleep(rung["delay"])
    dog = threading.Timer(rung["watchdog"],
                          lambda: _advance(f"watchdog {rung['watchdog']}s"))
    dog.daemon = True
    dog.start()
    try:
        main(rung["chunk"], fused=rung["fused"],
             fused_encoder=rung["fused_encoder"])
    except Exception as e:
        dog.cancel()
        _advance(repr(e)[:300])
    dog.cancel()


if __name__ == "__main__":
    _main_with_rungs()
