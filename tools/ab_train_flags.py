"""Same-worker A/B of the TRAINING megakernel trace-time flags.

Benchmarks combos of backward/forward kernel flags (_ROW_CHUNKS_BWD on
flow_layer_vjp_pallas; _GELU_FORM / _SOFTMAX_EXP2 / _CPL_IN_CONCAT on
flow_layer_pallas — the trainable path routes through the same fwd kernel
and the same _gelu) on the full-scale dulcet-universe train step
(tools/bench_train.py methodology: jitted fwd+bwd+clip+Adam step, B=20,
2 unique-input warmups, N timed steps, float() sync per step), all in ONE
process so worker-to-worker variance cancels. A shared probe batch records
the post-step loss per combo, so numerical drift between variants is
visible next to the timing.

Usage: python tools/ab_train_flags.py [--out save/bench/ab_train_flags.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_STEPS = 4

COMBOS = [
    {"_ROW_CHUNKS_BWD": 1, "_GELU_FORM": "sigmoid"},  # current production
    {"_ROW_CHUNKS_BWD": 2, "_GELU_FORM": "sigmoid"},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ab_train_flags.json")
    ap.add_argument("--steps", type=int, default=N_STEPS)
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
    from flowcompare_tpu.ops import flow_layer_vjp_pallas as fvp
    from flowcompare_tpu.train.trainer import init_train_state, make_train_step

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    cfg["folded_scan"] = True
    bsz = cfg["batch_size"]
    ks = jax.random.split(jax.random.PRNGKey(1), 3)

    def batch(i):  # unique inputs: the tunnel memoizes identical calls
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (bsz, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (bsz, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (bsz, 1)),
        )

    results = []
    for combo in combos:
        for flag, val in combo.items():
            # backward-kernel flags live on fvp (by _BWD suffix or by being
            # absent from flp, e.g. _K_SEG); shared fwd flags on flp
            mod = (fvp if hasattr(fvp, flag)
                   and (flag.endswith("_BWD") or not hasattr(flp, flag))
                   else flp)
            assert hasattr(mod, flag), flag
            setattr(mod, flag, val)
        model = fc.FlowCompareModel(cfg, fused_layers=True)
        state = init_train_state(model, jax.random.PRNGKey(0))
        step = make_train_step(model)

        # device-resident batches: eager fold_in+normal inside the timed
        # loop costs ~12-30 ms per op through the tunnel (see bench_train)
        warm = [batch(100 + w) for w in range(2)]
        timed = [batch(i) for i in range(args.steps)]
        jax.block_until_ready((warm, timed))
        try:
            for b in warm:  # compile + executable-load warmups
                state, m = step(state, b)
                float(m["loss"])
        except Exception as exc:  # compile OOM etc. — record, keep going
            rec = {**combo, "error": str(exc)[:500]}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            continue
        t0 = time.perf_counter()
        for b in timed:
            state, m = step(state, b)
            float(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps

        # shared probe batch: same params-trajectory seed per combo, so the
        # loss after identical steps exposes any numerical divergence
        _, pm = step(state, batch(999))
        rec = {**combo, "ms_per_step": round(1000 * dt, 1),
               "points_per_sec": round(bsz * cfg["sample_size"] / dt, 1),
               "probe_loss": float(pm["loss"])}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "probe_loss" in r]
    if ok:
        base = ok[0]["probe_loss"]
        for r in ok:
            r["probe_loss_delta_vs_prod"] = r["probe_loss"] - base
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
