"""int8 vs bf16 MXU throughput, measured by the REPS-slope method: time a
chained-matmul kernel at two loop counts and divide the delta by the extra
matmuls — immune to the ~25ms tunnel dispatch floor that swamped probe v1.

    PYTHONPATH=/root/.axon_site python tools/int8_probe2.py
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

M, K = 1024, 512  # square chain: N == K


def _mm_kernel(x_ref, w_ref, o_ref, *, dtype, reps):
    w = w_ref[...]
    if dtype == "int8":
        def body(_, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.int32)
            return ((y & 63) - 32).astype(jnp.int8)
        x = jax.lax.fori_loop(0, reps, body, x_ref[...], unroll=False)
        o_ref[...] = x.astype(jnp.int32)
    else:
        def body(_, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (y * 1e-3).astype(jnp.bfloat16)
        x = jax.lax.fori_loop(0, reps, body, x_ref[...], unroll=False)
        o_ref[...] = x.astype(jnp.float32)


def timed(dtype, reps):
    if dtype == "int8":
        x = jnp.ones((M, K), jnp.int8)
        w = jnp.ones((K, K), jnp.int8)
        out = jax.ShapeDtypeStruct((M, K), jnp.int32)
    else:
        x = jnp.ones((M, K), jnp.bfloat16)
        w = jnp.ones((K, K), jnp.bfloat16)
        out = jax.ShapeDtypeStruct((M, K), jnp.float32)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(_mm_kernel, dtype=dtype, reps=reps),
        out_shape=out)(a, b))
    for i in range(2):  # unique warmups (tunnel memoizes identical calls)
        float(jnp.sum(fn(x + (i + 1 if dtype == "int8" else i + 1), w)))
    ts = []
    for i in range(3):
        xi = x + (i % 2 if dtype == "int8" else i % 2)
        t0 = time.perf_counter()
        float(jnp.sum(fn(xi, w)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[1]


def main():
    out = {}
    r1, r2 = 256, 4096
    for dtype in ("bf16", "int8"):
        t1 = timed(dtype, r1)
        t2 = timed(dtype, r2)
        per_mm = (t2 - t1) / (r2 - r1)
        tops = 2.0 * M * K * K / per_mm / 1e12
        out[dtype] = {"t_r256_ms": round(1e3 * t1, 2),
                      "t_r4096_ms": round(1e3 * t2, 2),
                      "us_per_matmul": round(1e6 * per_mm, 2),
                      "tops": round(tops, 1)}
    out["speedup"] = round(out["bf16"]["us_per_matmul"]
                           / out["int8"]["us_per_matmul"], 2)
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/int8_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
