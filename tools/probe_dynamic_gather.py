"""Probe Mosaic's tpu.dynamic_gather throughput + dtype support (chip).

Motivation: the edge_neighbor_max extraction (one-hot build + MXU matmul)
costs ~15.6 of 26.7 ms/batch standalone (save/bench/ab_enm_flags.json). A
gather-based extraction — binary-search slot inversion over the monotone
selected-count prefix, then a hardware row gather — replaces both, IF
`jnp.take_along_axis` inside a Pallas kernel lowers to tpu.dynamic_gather
(jax/_src/pallas/mosaic/lowering.py:2500-2524 supports exactly the 2D
batched forms) and runs at ~VPU-pass speed.

Measures, per (256, 1280) block x 100 grid steps x REPS:
  lane_gather_i32 — out[i,j] = x[i, idx[i,j]]  (int32, axis=1)
  lane_gather_f32 — same, f32 operand
  sub_gather_bf16 — out[i,j] = x[idx[i,j], j]  (bf16 operand, axis=0)
  baseline_add    — same shapes, idx+x adds only (pass-cost yardstick)

Usage: python tools/probe_dynamic_gather.py
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

R, W = 256, 1280
LOOPS = 16   # gathers chained per kernel invocation
REPS = 5
GRID = 100


def _mk_kernel(mode):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[0]
        idx = idx_ref[0]

        def body(_, carry):
            if mode == "lane_gather":
                y = jnp.take_along_axis(x, carry, axis=1)
                return (y.astype(jnp.int32) if y.dtype != jnp.int32
                        else y) % W
            if mode == "lane_gather_val":
                # gather a VALUE array at fixed idx, fold result into carry
                y = jnp.take_along_axis(x, idx, axis=1)
                return carry + y.astype(carry.dtype)
            if mode == "sub_gather":
                y = jnp.take_along_axis(x, idx, axis=0)
                return carry + y.astype(carry.dtype)
            return carry + x.astype(carry.dtype)  # baseline_add

        if mode == "lane_gather":
            init = idx
        elif mode == "sub_gather":
            init = jnp.zeros(x.shape, jnp.float32)
        elif mode == "lane_gather_val":
            init = jnp.zeros(x.shape, jnp.float32)
        else:
            init = jnp.zeros(x.shape, jnp.float32)
        out = jax.lax.fori_loop(0, LOOPS, body, init)
        o_ref[0] = out.astype(o_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "xdt"))
def run(x, idx, mode, xdt):
    del xdt
    return pl.pallas_call(
        _mk_kernel(mode),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, R, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, idx)


def main():
    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    key = jax.random.PRNGKey(0)
    results = {}
    cases = [
        ("lane_gather_i32", "lane_gather", jnp.int32, (GRID, R, W)),
        ("lane_gather_f32", "lane_gather_val", jnp.float32, (GRID, R, W)),
        ("sub_gather_bf16", "sub_gather", jnp.bfloat16, (GRID, R, W)),
        ("baseline_add", "baseline_add", jnp.float32, (GRID, R, W)),
    ]
    for name, mode, xdt, shp in cases:
        def make(i):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            if xdt == jnp.int32:
                x = jax.random.randint(k1, shp, 0, W, jnp.int32)
            else:
                x = jax.random.normal(k1, shp, xdt)
            lim = W if mode != "sub_gather" else R
            idx = jax.random.randint(k2, (GRID, R, W), 0, lim, jnp.int32)
            return x, idx

        try:
            warm = [make(100 + w) for w in range(2)]
            args = [make(i) for i in range(REPS)]
            jax.block_until_ready((warm, args))
            for a in warm:
                float(run(a[0], a[1], mode, str(xdt)).ravel()[0])
            t0 = time.perf_counter()
            for a in args:
                float(run(a[0], a[1], mode, str(xdt)).ravel()[0])
            ms = 1000 * (time.perf_counter() - t0) / REPS
            per_pass_us = 1000 * ms / (GRID * LOOPS)
            results[name] = {"ms_total": round(ms, 3),
                             "us_per_gather_block": round(per_pass_us, 3)}
            print(f"{name}: {ms:.2f} ms ({per_pass_us:.3f} us per "
                  f"(256,1280) op)", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)

    out = "save/bench/probe_dynamic_gather.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
