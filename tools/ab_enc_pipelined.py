"""Chip A/B of _PIPELINED_EXTRACT (block rb-1's extraction fused into
block rb's binary-search loop in the one-launch encoder) vs the sequential
default, plus an on-chip bit-exactness check of the full encoder output.

Usage: python tools/ab_enc_pipelined.py [--out save/bench/ab_enc_pipelined.json]
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
    ap.add_argument("--out", default="save/bench/ab_enc_pipelined.json")
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
    # fresh per-run salt + distinct jit names per variant: the tunnel can
    # serve memoized results for repeated (name, inputs) calls across
    # program variants and even processes (MEASUREMENT TRAP 3, CLAUDE.md)
    salt = int(time.time() * 1e3) % (2 ** 31)
    print("salt:", salt, flush=True)
    key = jax.random.fold_in(jax.random.PRNGKey(1), salt)
    rec = {}

    # bit-exactness on chip: same input, flag off vs on
    pts = jax.random.normal(jax.random.fold_in(key, 777), (B, Nc, 6))
    outs = {}
    for flag in (False, True):
        ep._PIPELINED_EXTRACT = flag

        def _emb(p, s, x):
            return model.embed(p, s, x, training=False)[0]
        _emb.__name__ = _emb.__qualname__ = f"emb_{int(flag)}"
        outs[flag] = np.asarray(jax.jit(_emb)(params, state, pts),
                                np.float32)
    exact = bool(np.array_equal(outs[False], outs[True]))
    rec["bit_exact"] = exact
    print(f"bit_exact: {exact}", flush=True)
    if not exact:
        diff = np.abs(outs[False] - outs[True])
        rec["max_abs_diff"] = float(diff.max())
        print(f"max_abs_diff: {diff.max():.3e}", flush=True)

    for flag in (False, True):
        ep._PIPELINED_EXTRACT = flag

        def enc_chunk(params, state, ptss):
            def body(carry, pts):
                out, _ = model.embed(params, state, pts, training=False)
                return carry, jnp.sum(out.astype(jnp.float32))
            _, sums = jax.lax.scan(body, 0.0, ptss)
            return jnp.sum(sums)
        enc_chunk.__name__ = enc_chunk.__qualname__ = (
            "enc_pipelined" if flag else "enc_sequential")
        enc_chunk = jax.jit(enc_chunk)

        def enc_args(i):
            return (params, state,
                    jax.random.normal(jax.random.fold_in(key, i),
                                      (CH, B, Nc, 6)))

        name = "pipelined" if flag else "sequential"
        try:
            ms = 1000 * timed(enc_chunk, enc_args) / CH
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)
            rec[name] = None
            continue
        rec[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms/batch", flush=True)

    ep._PIPELINED_EXTRACT = False
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
