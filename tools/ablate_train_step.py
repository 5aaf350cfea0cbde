"""Train-step time attribution: flow-core grad vs encoder/augmenter grad.

Times (on the TPU) value_and_grad of: (a) the full inner_loop, (b) only
model.log_prob with precomputed context/extra (flow core + fold chain),
(c) log_prob forward only. Writes save/bench/ablate_train.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, make_args, n_warm=2, n=3):
    """fn must return a SCALAR (host-sync via one float(); per-leaf
    block_until_ready costs a tunnel roundtrip PER LEAF — ~3s for a
    300-leaf grads pytree — and poisons the measurement)."""
    for w in range(n_warm):
        float(fn(*make_args(100 + w)))
    ts = []
    for i in range(n):
        a = make_args(i)
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(fused=True):
    import flowcompare_tpu as fc

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=fused)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B, N, NC = cfg["batch_size"], cfg["sample_size"], cfg["n_samples_context"]
    E = cfg["input_embedding_dim"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)

    def batch(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i), (B, NC, 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i), (B, N, 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (B, 1)),
        )

    out = {"fused": fused}

    @jax.jit
    def full_grad(params, b, rng):
        def loss(p):
            l, _, _, _ = fc.inner_loop(model, p, state, b, rng=rng,
                                       training=True)
            return l
        v, g = jax.value_and_grad(loss)(params)
        return v + 1e-30 * sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    out["full_step_grad_ms"] = round(1e3 * timeit(
        full_grad, lambda i: (params, batch(i), jax.random.fold_in(ks[3], i))), 1)

    # flow-core only: context precomputed OUTSIDE the grad
    def flow_args(i):
        kk = jax.random.fold_in(ks[3], i)
        x = jax.random.normal(kk, (B, N, 300))
        ctx = jax.random.normal(jax.random.fold_in(kk, 1), (B, NC, E)) * 0.5
        extra = jax.random.normal(jax.random.fold_in(kk, 2), (B, N, 1))
        return params, x, ctx, extra, kk

    @jax.jit
    def flow_grad(params, x, ctx, extra, rng):
        def loss(p):
            lp = model.log_prob(p, x[..., :6], ctx, extra, rng=rng)
            return jnp.mean(lp)
        v, g = jax.value_and_grad(loss)(params)
        return v + 1e-30 * sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    out["flow_grad_ms"] = round(1e3 * timeit(flow_grad, flow_args), 1)

    @jax.jit
    def flow_fwd(params, x, ctx, extra, rng):
        return jnp.mean(model.log_prob(params, x[..., :6], ctx, extra,
                                       rng=rng))

    out["flow_fwd_ms"] = round(1e3 * timeit(flow_fwd, flow_args), 1)

    print(json.dumps(out))
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/ablate_train.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(fused=(sys.argv[1] != "scan") if len(sys.argv) > 1 else True)
