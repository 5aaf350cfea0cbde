"""Chip parity + throughput for the SAMPLING megakernel
(ops/flow_layer_pallas.fused_flow_layers_inverse).

Runs make_sample at full dulcet-universe scale twice with the SAME key —
once through the reverse-scan path (fused_layers=False) and once through
the inverse megakernel — and reports elementwise agreement plus sampled
points/sec for both. The two paths share every fold (fold_stacks) except
the inverse tail, so disagreement localizes to the kernel.

All RNG keys are salted with a fresh per-run value and the two legs get
distinct jit names: the tunnel serves MEMOIZED results for repeated
(name, inputs) calls even across PROCESSES and DAYS, ignoring the compiled
program (MEASUREMENT TRAP 3, CLAUDE.md) — an unsalted rerun of this tool
reproduced a months-old parity triple bit-for-bit against a different
kernel.

Usage: python tools/test_sample_kernel_chip.py [--out save/bench/sample_kernel_parity.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 20
N_POINTS = 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--preset", default="dulcet-universe")
    args = ap.parse_args()
    if args.out is None:
        suffix = ("" if args.preset == "dulcet-universe"
                  else f"_{args.preset}")
        args.out = f"save/bench/sample_kernel_parity{suffix}.json"

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.model import make_sample
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = fc.get_config(args.preset)
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4

    salt = int(time.time() * 1e3) % (2 ** 31)
    print("salt:", salt, "_TRANSPOSED_EVAL:", flp._TRANSPOSED_EVAL,
          flush=True)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), salt), 2)
    extract_0 = jax.random.normal(ks[0], (B, cfg["n_samples_context"], 6))
    extra = jax.random.normal(ks[1], (B, 1))

    results = {"preset": args.preset}
    outputs = {}
    for fused in (False, True):
        flp._FUSE_SAMPLING = fused  # trace-time gate (default off until
        # this very tool records full-scale parity)
        model = fc.FlowCompareModel(cfg, remat=False, fused_layers=fused)
        params, state = model.init_params(jax.random.PRNGKey(0))

        # params/state/inputs must be ARGUMENTS, not closure constants: the
        # remote compile helper 413s on huge constant uploads (CLAUDE.md)
        def _fn(p, s, c0, ex, key, _m=model):
            return make_sample(_m, p, s, key, N_POINTS, c0, ex)
        tag = args.preset.split("-")[0]
        _fn.__name__ = _fn.__qualname__ = (
            f"sample_kernel_{tag}" if fused else f"sample_scan_{tag}")
        fn = jax.jit(_fn)
        for w in range(2):  # compile + executable-load, unique keys
            pts = fn(params, state, extract_0, extra,
                     jax.random.fold_in(jax.random.PRNGKey(100 + w), salt))
            float(pts[0, 0, 0])
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            pts = fn(params, state, extract_0, extra,
                     jax.random.fold_in(jax.random.PRNGKey(i), salt))
            float(pts[0, 0, 0])
        dt = (time.perf_counter() - t0) / reps
        name = "kernel" if fused else "scan"
        outputs[name] = fn(params, state, extract_0, extra,
                           jax.random.fold_in(jax.random.PRNGKey(0), salt))
        results[name] = {
            "ms_per_batch": round(dt * 1000, 2),
            "points_per_sec": round(B * N_POINTS / dt, 1),
        }
        print(name, results[name], flush=True)

    a, b = outputs["scan"], outputs["kernel"]
    diff = jnp.abs(a - b)
    scale = jnp.maximum(jnp.abs(a), 1.0)
    results["parity"] = {
        "max_abs_diff": float(jnp.max(diff)),
        "max_rel_diff": float(jnp.max(diff / scale)),
        "mean_abs_diff": float(jnp.mean(diff)),
    }
    print(json.dumps(results["parity"]), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
