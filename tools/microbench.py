"""Op-level micro-benchmarks.

Counterpart of the reference's kNN engine shoot-out (knn.py:91-116), grown
to cover the framework's hot primitives: kNN, FPS, 3-NN interpolation, the
fused edge-conv kernel, and the PAConv score assembly. Run on whatever
backend is attached:

    python tools/microbench.py [--batch 20] [--n 1250] [--k 40]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for i in range(warmup):
        r = fn(*args)
        jax.tree_util.tree_map(
            lambda a: float(a.ravel()[0]) if hasattr(a, "ravel") else a, r)
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(a.ravel()[0]) if hasattr(a, "ravel") else a, r)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--n", type=int, default=1250)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--c", type=int, default=256)
    args = ap.parse_args()

    from flowcompare_tpu.ops import (
        furthest_point_sampling, gather_neighbors, knn_self,
        paconv_assign_score, three_nn_interpolate)

    b, n, k, c = args.batch, args.n, args.k, args.c
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, c), jnp.bfloat16)
    xyz = jax.random.normal(key, (b, n, 3))
    feats = jax.random.normal(key, (b, n, c), jnp.bfloat16)

    knn = jax.jit(lambda x: knn_self(x, k))
    print(f"knn_self (B={b}, N={n}, C={c}, k={k}): "
          f"{timeit(knn, x) * 1e3:.2f} ms")

    gather = jax.jit(lambda x, i: gather_neighbors(x, i))
    idx = knn(x)
    print(f"gather_neighbors: {timeit(gather, feats, idx) * 1e3:.2f} ms")

    fps = jax.jit(lambda p: furthest_point_sampling(p, n // 4))
    print(f"furthest_point_sampling (m={n // 4}): "
          f"{timeit(fps, xyz) * 1e3:.2f} ms")

    interp = jax.jit(lambda u, kn, f: three_nn_interpolate(u, kn, f))
    print(f"three_nn_interpolate: "
          f"{timeit(interp, xyz, xyz[:, : n // 4], feats[:, : n // 4]) * 1e3:.2f} ms")

    m = 8
    bank = jax.random.normal(key, (2 * c, m * c), jnp.bfloat16) * 0.02
    grouped = jax.random.normal(key, (b, n // 4, 32, 2 * c), jnp.bfloat16)
    scores = jax.nn.softmax(
        jax.random.normal(key, (b, n // 4, 32, m)), axis=-1)
    assign = jax.jit(lambda g, bk, s: paconv_assign_score(g, bk, s, m))
    print(f"paconv_assign_score: "
          f"{timeit(assign, grouped, bank, scores) * 1e3:.2f} ms")

    if jax.default_backend() == "tpu":
        from flowcompare_tpu.ops.edgeconv_pallas import edge_neighbor_max
        fused = jax.jit(lambda x, u: edge_neighbor_max(x, u, k))
        print(f"edge_neighbor_max (fused kNN+max kernel): "
              f"{timeit(fused, x, feats) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
