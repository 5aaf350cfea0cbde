"""Chip A/B of the LOW-RANK kNN extraction (_EXTRACT_X).

u = x @ W_diff has rank <= cin, so on stages with cin < cout the one-hot
gather is cheaper run on the INPUT rows x_j (cin sublanes) with W_diff
applied to the gathered (cin, k*128) block afterwards:
    extract-u:  cout * Npad      per k*128-lane slot block
    extract-x:  cin * Npad + cout * pad(cin)
(s1 6->64 ~4.5x, s3 64->128 and s4 128->256 ~1.7x cheaper; s2 64->64 keeps
extract-u). Bit-exactness is pinned on CPU interpret
(tests/test_pallas_kernels.py::test_fused_dgcnn_one_launch_extract_x_matches);
this tool re-checks it on hardware and measures:

  1. the one-launch DGCNN encoder (model.embed, chunked) both ways
  2. the full eval step (dulcet-universe, bf16)

Usage: python tools/ab_extract_x.py [--out save/bench/ab_extract_x.json]
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
B = 20


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
    ap.add_argument("--out", default="save/bench/ab_extract_x.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    Nc = cfg["n_samples_context"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    fixed_pts = jax.random.normal(jax.random.PRNGKey(9), (B, Nc, 6))
    emb_out, rec = {}, {}

    for flag in (False, True):
        vname = "extract_x" if flag else "prod"
        ep._EXTRACT_X = flag

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
        np.array_equal(emb_out["prod"], emb_out["extract_x"]))
    print("embed bit-exact:", rec["emb_bit_exact"], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
