"""Same-worker A/B of the backward megakernel's row chunking
(_ROW_CHUNKS_BWD): full-scale train-step ms at chunks=1 vs 2, plus grad
parity vs scan autodiff at chunks=2 (test_vjp_kernel_chip methodology,
L=7). One process so worker variance cancels.

Usage: python tools/ab_bwd_chunks.py [--out save/bench/ab_bwd_chunks.json]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ab_bwd_chunks.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    from flowcompare_tpu.ops import flow_layer_vjp_pallas as fvp
    import bench_train

    results = {}
    for chunks in (1, 2):
        fvp._ROW_CHUNKS_BWD = chunks
        rec = bench_train.measure("kernel", n_steps=5)
        results[f"train_ms_chunks{chunks}"] = rec["ms_per_step"]
        print(json.dumps({"chunks": chunks, **rec}), flush=True)

    # grad parity at chunks=2 (small depth, real widths)
    fvp._ROW_CHUNKS_BWD = 2
    import test_vjp_kernel_chip
    sys.argv = ["test_vjp_kernel_chip", "7"]
    test_vjp_kernel_chip.main()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
