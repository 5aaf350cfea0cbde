"""Chip A/B of the TRANSPOSED kNN extraction (_TRANSPOSED_EXTRACT).

Row-major production extraction multiplies H (R_SUB*k, Npad) @ u (Npad,
cout) with N = cout = 64..256 output lanes (half the MXU lane tiles idle at
cout=64); the transposed form gathers u^T (cout, Npad) @ H^T (Npad, k*128)
at full lane width. Same arithmetic — interpret tests pin bit-exactness on
CPU (tests/test_pallas_kernels.py); this tool measures and re-checks it on
hardware:

  1. standalone edge_neighbor_max per encoder stage shape (bit-exact + ms)
  2. the one-launch DGCNN encoder (model.embed, chunked) both ways
  3. the full eval step (dulcet-universe, bf16)

Usage: python tools/ab_enm_transposed.py [--out save/bench/ab_enm_transposed.json]
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
    ap.add_argument("--out", default="save/bench/ab_enm_transposed.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    key = jax.random.PRNGKey(0)
    rec = {"standalone_ms": {}, "bit_exact": {}}

    # ---------------- standalone per-stage: bit-exactness then timing
    fixed = {name: (jax.random.normal(jax.random.fold_in(key, 7000 + si),
                                      (B, N, cq), jnp.bfloat16),
                    jax.random.normal(jax.random.fold_in(key, 8000 + si),
                                      (B, N, cout), jnp.bfloat16))
             for si, (name, cq, cout) in enumerate(STAGES)}
    outs = {}
    for flag in (False, True):
        ep._TRANSPOSED_EXTRACT = flag
        ep.edge_neighbor_max.clear_cache()
        outs[flag] = {name: np.asarray(ep.edge_neighbor_max(*fixed[name], K))
                      for name, _, _ in STAGES}
    for name, _, _ in STAGES:
        same = bool(np.array_equal(outs[False][name], outs[True][name]))
        rec["bit_exact"][name] = same
        print(f"exactness {name}: {'bit-exact' if same else 'MISMATCH'}",
              flush=True)

    for flag in (False, True):
        vname = "transposed" if flag else "prod"
        ep._TRANSPOSED_EXTRACT = flag
        ep.edge_neighbor_max.clear_cache()
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
                        jax.random.normal(k2, (CH, B, N, cout),
                                          jnp.bfloat16))

            try:
                ms = 1000 * timed(chunk, make_args) / CH
            except Exception as exc:  # noqa: BLE001
                print(f"{vname} {name}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                row[name] = None
                continue
            row[name] = round(ms, 3)
            print(f"{vname:10s} {name}: {ms:.3f} ms/batch", flush=True)
        vals = [row[s] for s, _, _ in STAGES if row.get(s) is not None]
        row["total"] = (round(sum(vals), 3) if len(vals) == len(STAGES)
                        else None)
        rec["standalone_ms"][vname] = row

    # ---------------- one-launch encoder + full eval step
    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    Nc = cfg["n_samples_context"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    fixed_pts = jax.random.normal(jax.random.PRNGKey(9), (B, Nc, 6))
    emb_out = {}

    for flag in (False, True):
        vname = "transposed" if flag else "prod"
        ep._TRANSPOSED_EXTRACT = flag
        ep.edge_neighbor_max.clear_cache()

        def enc_chunk(params, state, ptss):
            def body(carry, pts):
                out, _ = model.embed(params, state, pts, training=False)
                return carry, jnp.sum(out.astype(jnp.float32))
            _, sums = jax.lax.scan(body, 0.0, ptss)
            return jnp.sum(sums)
        enc_chunk = jax.jit(enc_chunk)

        def enc_args(i):
            return (params, state,
                    jax.random.normal(jax.random.fold_in(ks[0], i),
                                      (CH, B, Nc, 6)))

        def emb_one(params, state, pts):
            out, _ = model.embed(params, state, pts, training=False)
            return out
        emb_one = jax.jit(emb_one)
        emb_out[vname] = np.asarray(
            emb_one(params, state, fixed_pts), np.float32)

        def full(params, state, batch, rng):
            loss, _, nats, _ = fc.inner_loop(model, params, state, batch,
                                             rng=rng, training=False)
            return loss
        full = jax.jit(full)

        def full_args(i):
            return (params, state, (
                jax.random.normal(jax.random.fold_in(ks[0], i), (B, Nc, 6)),
                jax.random.normal(jax.random.fold_in(ks[1], i),
                                  (B, cfg["sample_size"], 6)),
                jax.random.normal(jax.random.fold_in(ks[2], i), (B, 1)),
            ), jax.random.fold_in(ks[3], i))

        enc_ms = 1000 * timed(enc_chunk, enc_args) / CH
        full_ms = 1000 * timed(full, full_args)
        rec[vname] = {"encoder_chunked_ms": round(enc_ms, 3),
                      "full_eval_ms": round(full_ms, 3)}
        print(f"{vname}: encoder {enc_ms:.3f} ms/batch, "
              f"full eval {full_ms:.3f} ms", flush=True)

    rec["emb_bit_exact"] = bool(
        np.array_equal(emb_out["prod"], emb_out["transposed"]))
    print("embed bit-exact:", rec["emb_bit_exact"], flush=True)

    ep._TRANSPOSED_EXTRACT = False
    ep.edge_neighbor_max.clear_cache()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
