"""Chip A/B: _UNROLL_EXTRACT (straight-line extraction sub-blocks) in the
edge_neighbor_max kernel, per stage shape + one-launch encoder timing.

The looped extraction serializes each sub-block's one-hot build (VPU) with
its gather matmul (MXU); unrolled, Mosaic can overlap them. The two forms
are numerically identical (same ops, same order per sub-block).

Usage: python tools/ab_enm_unroll.py [--out save/bench/ab_enm_unroll.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
CH = 10
B, N, K = 20, 1250, 40
STAGES = [("s1", 6, 64), ("s2", 64, 64), ("s3", 64, 128), ("s4", 128, 256)]


def timed(fn, make_args, reps=REPS):
    warm = [make_args(1000 + w) for w in range(2)]
    args = [make_args(i) for i in range(reps)]
    jax.block_until_ready((warm, args))
    for a in warm:
        float(jnp.asarray(fn(*a)).ravel()[0])
    t0 = time.perf_counter()
    for a in args:
        float(jnp.asarray(fn(*a)).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ab_enm_unroll.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    key = jax.random.PRNGKey(0)
    out = {}
    exact_ref = {}
    for unroll in (False, True):
        ep._UNROLL_EXTRACT = unroll
        ep.edge_neighbor_max.clear_cache()
        vname = "unroll" if unroll else "fori"
        row = {}
        for name, cq, cout in STAGES:
            def chunk(xs, us):
                def body(carry, xu):
                    x, u = xu
                    mx = ep.edge_neighbor_max(x, u, K)
                    return carry, jnp.sum(mx.astype(jnp.float32))
                _, sums = jax.lax.scan(body, 0.0, (xs, us))
                return jnp.sum(sums)
            chunk = jax.jit(chunk)

            def make_args(i, cq=cq, cout=cout):
                k1, k2 = jax.random.split(jax.random.fold_in(key, i))
                return (jax.random.normal(k1, (CH, B, N, cq), jnp.bfloat16),
                        jax.random.normal(k2, (CH, B, N, cout), jnp.bfloat16))

            # exactness vs the fori form on a fixed input
            xf = jax.random.normal(jax.random.fold_in(key, 777),
                                   (B, N, cq), jnp.bfloat16)
            uf = jax.random.normal(jax.random.fold_in(key, 888),
                                   (B, N, cout), jnp.bfloat16)
            got = np.asarray(ep.edge_neighbor_max(xf, uf, K))
            if not unroll:
                exact_ref[name] = got
            else:
                assert np.array_equal(got, exact_ref[name]), f"{name} mismatch"

            ms = 1000 * timed(chunk, make_args) / CH
            row[name] = round(ms, 3)
            print(f"{vname:8s} {name}: {ms:.3f} ms/batch", flush=True)
        row["total"] = round(sum(row[s] for s, _, _ in STAGES), 3)
        out[vname] = row

        # one-launch encoder with the same flag
        cfg = fc.get_config("dulcet-universe")
        cfg["compute_dtype"] = "bfloat16"
        model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
        params, state = model.init_params(jax.random.PRNGKey(0))

        def enc_chunk(params, state, ptss):
            def body(carry, pts):
                o, _ = model.embed(params, state, pts, training=False)
                return carry, jnp.sum(o.astype(jnp.float32))
            _, sums = jax.lax.scan(body, 0.0, ptss)
            return jnp.sum(sums)
        enc_chunk = jax.jit(enc_chunk)

        def enc_args(i):
            return (params, state,
                    jax.random.normal(jax.random.fold_in(key, 50 + i),
                                      (CH, B, cfg["n_samples_context"], 6)))

        enc_ms = 1000 * timed(enc_chunk, enc_args) / CH
        out[vname]["encoder_onelaunch"] = round(enc_ms, 3)
        print(f"{vname:8s} encoder(one-launch): {enc_ms:.3f} ms/batch",
              flush=True)

    ep._UNROLL_EXTRACT = True
    rec = {"ms_per_batch": out, "bit_exact": True,
           "shapes": {"B": B, "N": N, "K": K}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
