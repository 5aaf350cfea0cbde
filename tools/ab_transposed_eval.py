"""Chip A/B of the TRANSPOSED eval megakernel (_TRANSPOSED_EVAL).

The transposed layout puts features on sublanes so narrow-output matmuls
(q d=64, e@v 65, coupling-out/LU 300) stop padding to 128 lanes — a ~9%
padded-MAC cut of an MXU-bound kernel (see flow_layer_pallas flag note).
Same-worker A/B on the flagship dulcet-universe eval workload with the
fixed methodology (device-resident pre-built inputs, unique-input warmups,
float() sync), plus full-scale nats parity on a shared probe chunk.

Usage: python tools/ab_transposed_eval.py [--out save/bench/ab_transposed_eval.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CH = 10
REPS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ab_transposed_eval.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    B = cfg["batch_size"]
    Nc = cfg["n_samples_context"]
    Np = cfg["sample_size"]
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 4)

    def make_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i), (CH, B, Nc, 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i), (CH, B, Np, 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (CH, B, 1)),
        )

    rec = {}
    probe = {}
    for flag in (False, True):
        vname = "transposed" if flag else "prod"
        flp._TRANSPOSED_EVAL = flag

        def _eval_chunk(params, state, batches, rng):
            def body(i, xs):
                loss, _, nats, _ = fc.inner_loop(
                    model, params, state, xs,
                    rng=jax.random.fold_in(rng, i), training=False)
                return i + 1, (loss, nats)
            _, (losses, nats) = jax.lax.scan(body, 0, batches)
            return losses, nats
        # distinct name per variant — see the sampling-leg memoization note
        _eval_chunk.__name__ = _eval_chunk.__qualname__ = f"eval_{vname}"
        eval_chunk = jax.jit(_eval_chunk)

        warm = [make_chunk(1000 + w) for w in range(2)]
        chunks = [make_chunk(i) for i in range(REPS)]
        probe_chunk = make_chunk(999)
        jax.block_until_ready((warm, chunks, probe_chunk))
        for w in warm:
            losses, _ = eval_chunk(params, state, w, ks[3])
            float(losses[0])
        t0 = time.perf_counter()
        for c in chunks:
            losses, _ = eval_chunk(params, state, c, ks[3])
            float(losses[0])
        dt = (time.perf_counter() - t0) / REPS
        _, nats = eval_chunk(params, state, probe_chunk, ks[3])
        probe[vname] = float(jnp.mean(nats))
        pps = CH * B * Np / dt
        rec[vname] = {"points_per_sec": round(pps, 1),
                      "ms_per_batch": round(dt / CH * 1000, 3),
                      "probe_mean_nats": probe[vname]}
        print(f"{vname}: {pps:,.0f} pts/s, {dt / CH * 1000:.2f} ms/batch, "
              f"probe nats {probe[vname]:.5f}", flush=True)

    rec["nats_delta"] = probe["transposed"] - probe["prod"]
    print("nats delta:", rec["nats_delta"], flush=True)

    # sampling direction (reverse megakernel) both ways.
    # NB the jitted fn gets a DISTINCT NAME per variant: the tunnel memoizes
    # same-name same-input calls ACROSS different executables (MEASUREMENT
    # TRAP 3, CLAUDE.md) — a shared name here returns the first leg's
    # results for the second and fakes bit-exact parity.
    samp = {}
    for flag in (False, True):
        vname = "transposed" if flag else "prod"
        flp._TRANSPOSED_EVAL = flag

        def _sample(params, state, pts, extra, key):
            return fc.make_sample(model, params, state, key, Np, pts, extra)
        _sample.__name__ = _sample.__qualname__ = f"sample_{vname}"
        sample_one = jax.jit(_sample)

        def sample_args(i):
            return (params, state,
                    jax.random.normal(jax.random.fold_in(ks[0], i),
                                      (B, Nc, 6)),
                    jax.random.normal(jax.random.fold_in(ks[2], i), (B, 1)),
                    jax.random.fold_in(ks[3], i))

        warm = [sample_args(1000 + w) for w in range(2)]
        runs = [sample_args(i) for i in range(5)]
        jax.block_until_ready((warm, runs))
        for a in warm:
            float(jnp.sum(sample_one(*a).astype(jnp.float32)))
        t0 = time.perf_counter()
        for a in runs:
            float(jnp.sum(sample_one(*a).astype(jnp.float32)))
        samp[vname] = (time.perf_counter() - t0) / len(runs) * 1000
        print(f"sample {vname}: {samp[vname]:.2f} ms/batch", flush=True)
        # same probe key both ways -> parity up to bf16 chain rounding
        samp[vname + "_probe"] = sample_one(
            params, state, *sample_args(777)[2:])
    rec["sample_ms"] = {k: round(v, 3) for k, v in samp.items()
                        if isinstance(v, float)}
    dp = jnp.abs(samp["transposed_probe"] - samp["prod_probe"])
    rec["sample_parity_max_abs"] = float(jnp.max(dp))
    rec["sample_parity_mean_abs"] = float(jnp.mean(dp))
    print("sample parity max/mean:", rec["sample_parity_max_abs"],
          rec["sample_parity_mean_abs"], flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
