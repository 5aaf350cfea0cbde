"""Same-worker A/B of megakernel trace-time flags.

Benchmarks combos of (_ROW_CHUNKS, _SOFTMAX_MAX) on the flagship
dulcet-universe eval workload (bench.py methodology: 10-batch chunks,
2 unique-input warmups, 3 timed chunks, float() sync per chunk), all in
ONE process so worker-to-worker throughput variance (~±4%) cancels.
Also records nats on a shared probe chunk so the softmax-clamp variant's
numerical parity is checked against the max-subtraction baseline.

Usage: python tools/ab_kernel_flags.py [--out save/bench/ab_kernel_flags.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CHUNK = 10
N_CHUNKS = 3

# Each combo maps flow_layer_pallas module attrs -> values. Override with
# --combos '[{"_ROW_CHUNKS": 2, "_GELU_DEG2": true}, ...]'.
COMBOS = [
    {"_ROW_CHUNKS": 2, "_SOFTMAX_MAX": True},   # current production
    {"_ROW_CHUNKS": 2, "_SOFTMAX_MAX": False},
    {"_ROW_CHUNKS": 4, "_SOFTMAX_MAX": True},
    {"_ROW_CHUNKS": 4, "_SOFTMAX_MAX": False},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ab_kernel_flags.json")
    ap.add_argument("--combos", default=None,
                    help="JSON list of {flag: value} dicts")
    args = ap.parse_args()
    combos = json.loads(args.combos) if args.combos else COMBOS

    # health check: tiny matmul before committing to ~100s compiles
    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    bsz = cfg["batch_size"]

    def make_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (CHUNK, bsz, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (CHUNK, bsz, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i),
                              (CHUNK, bsz, 1)),
        )

    results = []
    probe_nats = {}
    params = state = None
    for combo in combos:
        for flag, val in combo.items():
            assert hasattr(flp, flag), flag
            setattr(flp, flag, val)
        model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
        if params is None:
            params, state = model.init_params(jax.random.PRNGKey(0))

        @jax.jit
        def eval_chunk(params, state, batches, rng, _model=model):
            def body(i, xs):
                loss, _, nats, _ = fc.inner_loop(
                    _model, params, state, xs,
                    rng=jax.random.fold_in(rng, i), training=False)
                return i + 1, (loss, nats)
            _, (losses, nats) = jax.lax.scan(body, 0, batches)
            return losses, nats

        for w in range(2):  # compile + executable-load, UNIQUE inputs
            losses, _ = eval_chunk(params, state, make_chunk(100 + w), ks[3])
            float(losses[0])

        t0 = time.perf_counter()
        for i in range(N_CHUNKS):
            losses, nats = eval_chunk(params, state, make_chunk(i), ks[3])
            float(losses[0])
        dt = (time.perf_counter() - t0) / N_CHUNKS
        pps = CHUNK * bsz * cfg["sample_size"] / dt

        # shared probe chunk for cross-combo nats parity
        _, nats = eval_chunk(params, state, make_chunk(999), ks[3])
        mean_nats = float(jnp.mean(nats))
        probe_nats[str(combo)] = mean_nats

        rec = {**combo, "points_per_sec": round(pps, 1),
               "ms_per_batch": round(dt / CHUNK * 1000, 2),
               "probe_mean_nats": mean_nats}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]["probe_mean_nats"]
    for r in results:
        r["nats_delta_vs_prod"] = r["probe_mean_nats"] - base
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
