"""Measure the DGCNN encoder's share of the eval batch on chip.

The perf ledger's encoder figure (~8 ms/batch) predates the fused
augmenter and the tanh-GELU kernel flips; this probe retimes the pieces
under the current flags so eval follow-up work targets the real residual:
  (a) the jitted encoder alone (B, 1250, 6) -> (B, 1250, 64),
  (b) the full nats-eval step,
both with 2 unique-input warmups and float() syncs (tunnel rules).

Usage: python tools/probe_encoder_time.py [--out save/bench/encoder_time.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 8


def timed(fn, make_args, reps=REPS):
    # device-resident args: eager input generation inside the timed loop
    # costs ~12-30 ms per op through the tunnel (see bench.py)
    warm = [make_args(1000 + w) for w in range(2)]
    args = [make_args(i) for i in range(reps)]
    jax.block_until_ready((warm, args))
    for a in warm:
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda t: float(jnp.asarray(t).ravel()[0]), out)
    t0 = time.perf_counter()
    for a in args:
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda t: float(jnp.asarray(t).ravel()[0]), out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/encoder_time.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"

    import flowcompare_tpu as fc

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B = cfg["batch_size"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)

    @jax.jit
    def enc(params, state, pts):
        out, _ = model.embed(params, state, pts, training=False)
        return out

    def enc_args(i):
        return (params, state,
                jax.random.normal(jax.random.fold_in(ks[0], i),
                                  (B, cfg["n_samples_context"], 6)))

    @jax.jit
    def full(params, state, batch, rng):
        loss, _, nats, _ = fc.inner_loop(model, params, state, batch,
                                         rng=rng, training=False)
        return loss, nats

    def full_args(i):
        return (params, state, (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (B, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (B, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (B, 1)),
        ), jax.random.fold_in(ks[3], i))

    CH = 10

    @jax.jit
    def enc_chunk(params, state, ptss):
        def body(carry, pts):
            out, _ = model.embed(params, state, pts, training=False)
            return carry, jnp.sum(out)
        _, sums = jax.lax.scan(body, 0, ptss)
        return sums

    def enc_chunk_args(i):
        return (params, state,
                jax.random.normal(jax.random.fold_in(ks[1], i),
                                  (CH, B, cfg["n_samples_context"], 6)))

    enc_ms = 1000 * timed(enc, enc_args)
    full_ms = 1000 * timed(full, full_args)
    encc_ms = 1000 * timed(enc_chunk, enc_chunk_args) / CH
    rec = {"encoder_ms_per_batch": round(enc_ms, 2),
           "full_eval_ms_per_batch": round(full_ms, 2),
           "encoder_chunked_ms_per_batch": round(encc_ms, 2),
           "encoder_share": round(enc_ms / full_ms, 3),
           "note": "single-batch rows carry the full per-dispatch tunnel "
                   "overhead; encoder_chunked (scan of 10 in one jit) is "
                   "the honest device-time figure — compare against the "
                   "chunked eval batch time from bench.py"}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
