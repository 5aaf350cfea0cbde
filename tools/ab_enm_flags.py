"""Chip A/B of the edge_neighbor_max optimization flags.

Variants (trace-time flags in ops/edgeconv_pallas.py, cache-cleared between
traces):
  base      — round-2-entry kernel (two int32 prefix chains, int32 rank)
  pp        — _PACKED_PREFIX: one packed prefix chain + saturating-min slot
              ranks (exact; see kernel comment)
  pp_bf16   — + _BF16_RANK: bf16 rank scratch/one-hot build (2-per-lane)
  pp_bf16_rb640 / rb1280 — + _ROW_BLOCK 640 / 1280 (fewer grid steps)
  pp_bf16_rs64 — + _ROW_SUB 64 (fewer extraction loop iterations)
  xla_topk  — calibration: distance matmul + lax.top_k + gather + max in
              plain XLA (what the kernel replaced)

Also asserts on-chip BIT-EXACT equality of every kernel variant against
`base` on one random input set per stage shape.

Usage: python tools/ab_enm_flags.py [--out save/bench/ab_enm_flags.json]
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
    ap.add_argument("--out", default="save/bench/ab_enm_flags.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    from flowcompare_tpu.ops import edgeconv_pallas as ep
    from flowcompare_tpu.ops.knn import gather_neighbors, knn_self

    key = jax.random.PRNGKey(0)
    kernel_variants = {
        "base": dict(_PACKED_PREFIX=False, _BF16_RANK=False,
                     _ROW_BLOCK=256, _ROW_SUB=32),
        "pp": dict(_PACKED_PREFIX=True, _BF16_RANK=False,
                   _ROW_BLOCK=256, _ROW_SUB=32),
        "pp_bf16": dict(_PACKED_PREFIX=True, _BF16_RANK=True,
                        _ROW_BLOCK=256, _ROW_SUB=32),
        "pp_bf16_rb640": dict(_PACKED_PREFIX=True, _BF16_RANK=True,
                              _ROW_BLOCK=640, _ROW_SUB=32),
        "pp_bf16_rb1280": dict(_PACKED_PREFIX=True, _BF16_RANK=True,
                               _ROW_BLOCK=1280, _ROW_SUB=32),
        "pp_bf16_rs64": dict(_PACKED_PREFIX=True, _BF16_RANK=True,
                             _ROW_BLOCK=256, _ROW_SUB=64),
    }

    def set_flags(fl):
        for k, v in fl.items():
            setattr(ep, k, v)
        ep.edge_neighbor_max.clear_cache()

    # --- on-chip bit-exactness of every variant vs base, per stage shape
    print("exactness check vs base...", flush=True)
    fixed = {name: (jax.random.normal(jax.random.fold_in(key, 7000 + si),
                                      (B, N, cq), jnp.bfloat16),
                    jax.random.normal(jax.random.fold_in(key, 8000 + si),
                                      (B, N, cout), jnp.bfloat16))
             for si, (name, cq, cout) in enumerate(STAGES)}
    ref_out = {}
    set_flags(kernel_variants["base"])
    for name, _, _ in STAGES:
        x, u = fixed[name]
        ref_out[name] = np.asarray(ep.edge_neighbor_max(x, u, K))
    exact = {}
    for vname, fl in kernel_variants.items():
        if vname == "base":
            continue
        set_flags(fl)
        ok = True
        try:
            for name, _, _ in STAGES:
                x, u = fixed[name]
                got = np.asarray(ep.edge_neighbor_max(x, u, K))
                if not np.array_equal(got, ref_out[name]):
                    ok = False
                    nbad = int((got != ref_out[name]).sum())
                    print(f"  {vname} {name}: MISMATCH {nbad} elems",
                          flush=True)
        except Exception as exc:  # noqa: BLE001
            ok = f"compile-failed: {type(exc).__name__}"
        exact[vname] = ok
        print(f"  {vname}: "
              f"{'bit-exact' if ok is True else ok or 'MISMATCH'}",
              flush=True)

    # --- timing
    out = {}
    for vname, fl in kernel_variants.items():
        set_flags(fl)
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

            try:
                ms = 1000 * timed(chunk, make_args) / CH
            except Exception as exc:  # noqa: BLE001
                print(f"{vname:16s} {name}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                row[name] = None
                continue
            row[name] = round(ms, 3)
            print(f"{vname:16s} {name}: {ms:.3f} ms/batch", flush=True)
        vals = [row[s] for s, _, _ in STAGES if row.get(s) is not None]
        row["total"] = round(sum(vals), 3) if len(vals) == len(STAGES) else None
        out[vname] = row

    # --- XLA calibration path
    row = {}
    for name, cq, cout in STAGES:
        def chunk(xs, us):
            def body(carry, xu):
                x, u = xu
                idx = knn_self(x, K)
                mx = jnp.max(gather_neighbors(u, idx), axis=2)
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
        except Exception as exc:  # noqa: BLE001
            print(f"xla_topk {name}: FAILED {type(exc).__name__}", flush=True)
            row[name] = None
            continue
        row[name] = round(ms, 3)
        print(f"{'xla_topk':16s} {name}: {ms:.3f} ms/batch", flush=True)
    vals = [row[s] for s, _, _ in STAGES if row.get(s) is not None]
    row["total"] = round(sum(vals), 3) if len(vals) == len(STAGES) else None
    out["xla_topk"] = row

    # restore production flags
    set_flags(dict(_PACKED_PREFIX=True, _BF16_RANK=False,
                   _ROW_BLOCK=256, _ROW_SUB=32))

    rec = {"ms_per_batch": out, "bit_exact_vs_base": exact,
           "shapes": {"B": B, "N": N, "K": K,
                      "stages": [f"{n}:{cq}->{co}" for n, cq, co in STAGES]}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
