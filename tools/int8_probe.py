"""Feasibility probe: int8 MXU matmuls in Pallas on this TPU.

Checks (a) that s8 x s8 -> s32 jnp.dot lowers through Mosaic, (b) its
throughput vs the same-shape bf16 matmul (expected ~2x on v5e), and (c)
accuracy of per-row dynamic activation quantization + per-column weight
quantization against the f32 product. Writes save/bench/int8_probe.json.

    PYTHONPATH=/root/.axon_site python tools/int8_probe.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 1024, 512, 512
REPS = 64  # chained matmuls per kernel invocation to swamp overheads


def _mm_kernel(x_ref, w_ref, o_ref, *, dtype):
    if dtype == "int8":
        x = x_ref[...]
        acc = jnp.zeros((M, N), jnp.int32)
        for _ in range(REPS):
            acc = acc + jnp.dot(x, w_ref[...],
                                preferred_element_type=jnp.int32)
            x = (acc % 127).astype(jnp.int8)[:, :K]
        o_ref[...] = acc
    else:
        x = x_ref[...]
        acc = jnp.zeros((M, N), jnp.float32)
        for _ in range(REPS):
            acc = acc + jnp.dot(x, w_ref[...],
                                preferred_element_type=jnp.float32)
            x = (acc * 1e-3).astype(jnp.bfloat16)[:, :K]
        o_ref[...] = acc


def bench(dtype):
    if dtype == "int8":
        x = jnp.ones((M, K), jnp.int8)
        w = jnp.ones((K, N), jnp.int8)
        out = jax.ShapeDtypeStruct((M, N), jnp.int32)
    else:
        x = jnp.ones((M, K), jnp.bfloat16)
        w = jnp.ones((K, N), jnp.bfloat16)
        out = jax.ShapeDtypeStruct((M, N), jnp.float32)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(_mm_kernel, dtype=dtype),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b))
    # unique warmups (tunnel memoizes bit-identical calls)
    for i in range(2):
        float(jnp.sum(fn(x + (i + 1 if dtype == "int8" else 0), w)))
    ts = []
    for i in range(3):
        xi = x + (i % 2 if dtype == "int8" else 0)
        t0 = time.perf_counter()
        float(jnp.sum(fn(xi, w)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[1]
    ops = 2.0 * M * K * N * REPS
    return {"ms": round(1e3 * dt, 3), "tops": round(ops / dt / 1e12, 1)}


def accuracy():
    """Per-row activation / per-col weight int8 quantization error."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    h = jax.random.normal(k1, (M, K), jnp.float32) * 1.7
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.05
    ref = h @ w
    sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    wq = jnp.round(w / sw).astype(jnp.int8)
    sh = jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0
    hq = jnp.round(h / sh).astype(jnp.int8)
    prod = jnp.dot(hq, wq, preferred_element_type=jnp.int32)
    approx = prod.astype(jnp.float32) * sh * sw
    rel = float(jnp.linalg.norm(approx - ref) / jnp.linalg.norm(ref))
    bf = (h.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)).astype(jnp.float32)
    rel_bf16 = float(jnp.linalg.norm(bf - ref) / jnp.linalg.norm(ref))
    return {"int8_rel_err": round(rel, 5), "bf16_rel_err": round(rel_bf16, 5)}


def main():
    out = {}
    try:
        out["bf16"] = bench("bf16")
        out["int8"] = bench("int8")
        out["speedup"] = round(out["bf16"]["ms"] / out["int8"]["ms"], 2)
    except Exception as e:  # lowering may reject int8 dots on this gen
        out["error"] = repr(e)[:500]
    out.update(accuracy())
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/int8_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
