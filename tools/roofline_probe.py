"""Measured MXU ceilings on this chip/tunnel: XLA vs Pallas, several shapes.

Distinguishes 'the chip is slow' from 'XLA-generated matmul loops are slow'
— the decider for whether the training backward needs a Pallas kernel.
Writes save/bench/roofline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return float(jnp.sum(x))


def timeit(fn, make_args, n_warm=2, n=3):
    for w in range(n_warm):
        _sync(fn(*make_args(100 + w)))
    ts = []
    for i in range(n):
        a = make_args(i)
        t0 = time.perf_counter()
        _sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def xla_scan(m, k, reps, reuse_w):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k)).astype(jnp.bfloat16)
    shape = (k, k) if reuse_w else (reps, k, k)
    ws = (jax.random.normal(jax.random.PRNGKey(1), shape).astype(jnp.bfloat16)
          * (1.0 / k ** 0.5))

    @jax.jit
    def run(a, ws):
        def body(h, i):
            w = ws if reuse_w else ws[i]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            return h.astype(jnp.bfloat16), None
        h, _ = jax.lax.scan(body, a, jnp.arange(reps))
        return jnp.sum(h.astype(jnp.float32))

    dt = timeit(run, lambda i: (a * (1.0 + i * 1e-6), ws))
    return 2 * m * k * k * reps / dt / 1e12


def pallas_chain(m, k, reps):
    """reps matmuls chained inside ONE pallas kernel (weights streamed)."""
    def kern(a_ref, w_ref, o_ref, h_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_ref[...] = a_ref[...]
        h = jnp.dot(h_ref[...], w_ref[0],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h_ref[...] = h

        @pl.when(i == reps - 1)
        def _():
            o_ref[...] = h

    a = jax.random.normal(jax.random.PRNGKey(0), (m, k)).astype(jnp.bfloat16)
    ws = (jax.random.normal(jax.random.PRNGKey(1), (reps, k, k)).astype(
        jnp.bfloat16) * (1.0 / k ** 0.5))

    @jax.jit
    def run(a, ws):
        out = pl.pallas_call(
            kern,
            grid=(reps,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, k), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, ws)
        return jnp.sum(out.astype(jnp.float32))

    dt = timeit(run, lambda i: (a * (1.0 + i * 1e-6), ws))
    return 2 * m * k * k * reps / dt / 1e12


def main():
    out = {}
    out["xla_scan_1024x512_streamW"] = round(xla_scan(1024, 512, 400, False), 1)
    out["xla_scan_1024x512_reuseW"] = round(xla_scan(1024, 512, 400, True), 1)
    out["xla_scan_8192x2048_reuseW"] = round(xla_scan(8192, 2048, 50, True), 1)
    out["xla_scan_8192x2048_streamW"] = round(xla_scan(8192, 2048, 50, False), 1)
    out["pallas_chain_1024x512"] = round(pallas_chain(1024, 512, 400), 1)
    out["pallas_chain_8192x512"] = round(pallas_chain(8192, 512, 400), 1)
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
