"""Farthest-point sampling as a single Pallas TPU kernel.

The XLA formulation (ops/fps.py) is a lax.fori_loop of m iterations, each
a tiny (B, N) distance update + argmax — correct, but on the hosted TPU it
costs ~4.5 ms/batch of the PAConv preset's eval (save/bench/
ablate_paconv.json: m=312+78+19 iterations of loop overhead for microscopic
VPU work). This kernel runs the WHOLE greedy selection for one batch item
inside VMEM: coordinates live transposed (coords on sublanes, points on
lanes), each iteration is a one-hot centroid extract + fused
square-distance + running-min + cross-lane argmax, and the selected index
is written straight into the output block. No HBM traffic between
iterations, no per-iteration XLA loop machinery.

Numerics match ops/fps.furthest_point_sampling BIT-EXACTLY by
construction: distances are f32 with the same reduction order
((x²+y²)+z²), the running min is the same, and argmax tie-breaking picks
the first (lowest-index) maximum exactly like jnp.argmax
(tests/test_fps_kernel.py asserts equality on CPU interpret + random
clouds; chip equality is asserted by tools/ab_paconv_opt.py).

Replaces `pointops_cuda.furthestsampling`
(lib/pointops/src/sampling/sampling_cuda_kernel.cu:59-196) — the CUDA
kernel is the same greedy loop with a block-parallel argmax reduction; the
TPU version keeps the cloud VMEM-resident instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128


def _kernel(xt_ref, idx_ref, *, n: int, m: int, npad: int, mpad: int):
    """xt_ref: (1, 8, npad) f32 — rows 0..2 = x,y,z, rows 3..7 zero,
    lanes >= n zero. idx_ref: (1, 1, mpad) int32 out (Mosaic block rule:
    the last two dims must be (whole-dim, 128-multiple))."""
    xt = xt_ref[0]                                        # (8, npad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    valid = lane < n
    # padded lanes must never win the argmax
    min_d0 = jnp.where(valid, jnp.inf, -jnp.inf)          # (1, npad)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, mpad), 1)

    def body(i, carry):
        min_d, far, idxv = carry
        # record the incoming pick into slot i (one-hot accumulate: no
        # dynamic lane-indexed stores needed)
        idxv = idxv + jnp.where(slot == i, far, 0)
        onehot = (lane == far).astype(jnp.float32)        # (1, npad)
        c = jnp.sum(xt * onehot, axis=1, keepdims=True)   # (8, 1)
        diff = xt - c                                     # pad rows: 0 - 0
        d = jnp.sum(diff * diff, axis=0, keepdims=True)   # (1, npad) f32
        min_d = jnp.minimum(min_d, d)
        maxv = jnp.max(min_d)
        # first-index tie-break == jnp.argmax
        far = jnp.min(jnp.where(min_d == maxv, lane, npad)).astype(jnp.int32)
        return min_d, far, idxv

    _, _, idxv = jax.lax.fori_loop(
        0, m, body, (min_d0, jnp.int32(0), jnp.zeros((1, mpad), jnp.int32)))
    idx_ref[0] = idxv


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def fps_pallas(xyz: jnp.ndarray, m: int, *, interpret: bool = False
               ) -> jnp.ndarray:
    """xyz: (B, N, D>=3) -> int32 (B, m); first pick is index 0 (the
    deterministic-start contract of ops/fps.furthest_point_sampling)."""
    b, n, _ = xyz.shape
    npad = -(-n // _LANES) * _LANES
    mpad = -(-m // _LANES) * _LANES
    xt = jnp.swapaxes(xyz[..., :3].astype(jnp.float32), 1, 2)  # (B, 3, N)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, npad - n)))          # (B, 8, npad)
    kern = functools.partial(_kernel, n=n, m=m, npad=npad, mpad=mpad)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 8, npad), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, mpad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, mpad), jnp.int32),
        interpret=interpret,
    )(xt)
    return out[:, 0, :m]
