"""In-kernel ablation of ops/edgeconv_pallas.edge_neighbor_max (chip).

The encoder ablation (save/bench/ablate_encoder.json) pinned 16.8 of the
20.3 ms/batch encoder cost on the 4 edge_neighbor_max kernel launches.
This decomposes the kernel INTERNALLY via the trace-time _ABLATE knob —
each variant dead-codes one stage (outputs wrong, timing only):

  full      — production kernel
  bs8       — binary search 31 -> 8 iterations (times the count passes)
  noprefix  — both log-step prefix sums skipped (mask = d<=thresh)
  noextract — kernel returns after rank store (times the whole one-hot
              extraction: build + matmul + max)
  nomatmul  — extraction matmul replaced by a broadcast (times the
              (R_SUB*k, Npad) @ (Npad, Cout) MXU gathers; the one-hot
              build cost is nomatmul - noextract)

Timed per production stage shape (B=20, N=1250, k=40):
  s1 (6->64), s2 (64->64), s3 (64->128), s4 (128->256),
chunked 10-deep in one jit (scan over distinct inputs; tunnel rules).

Usage: python tools/ablate_enm.py [--out save/bench/ablate_enm.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    ap.add_argument("--out", default="save/bench/ablate_enm.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    from flowcompare_tpu.ops import edgeconv_pallas as ep

    key = jax.random.PRNGKey(0)
    # build cost = nomatmul - noextract; matmul cost = full - nomatmul
    variants = ["full", "bs8", "noprefix", "noextract", "nomatmul"]
    out = {}
    for variant in variants:
        ep._ABLATE = variant
        ep.edge_neighbor_max.clear_cache()
        row = {}
        for name, cq, cout in STAGES:
            # fresh fn object per (variant, stage) => fresh outer jit trace
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

            try:
                ms = 1000 * timed(chunk, make_args) / CH
            except Exception as exc:  # noqa: BLE001 — record & continue
                print(f"{variant:10s} {name}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
                row[name] = None
                continue
            row[name] = round(ms, 3)
            print(f"{variant:10s} {name}: {ms:.3f} ms/batch", flush=True)
        vals = [row[s] for s, _, _ in STAGES if row.get(s) is not None]
        row["total"] = round(sum(vals), 3) if len(vals) == len(STAGES) else None
        out[variant] = row
    ep._ABLATE = "full"

    deltas = {v: round(out["full"]["total"] - out[v]["total"], 3)
              for v in variants
              if v != "full" and out[v]["total"] is not None
              and out["full"]["total"] is not None}
    rec = {"ms_per_batch": out, "deltas_vs_full": deltas,
           "shapes": {"B": B, "N": N, "K": K,
                      "stages": [f"{n}:{cq}->{co}" for n, cq, co in STAGES]}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
