"""Farthest-point sampling as a single batch-parallel Pallas TPU kernel.

The XLA formulation (ops/fps.py) is a lax.fori_loop of m iterations, each
a tiny (B, N) distance update + argmax — correct, but it costs ~4.5
ms/batch of the PAConv preset's eval (save/bench/ablate_paconv.json) in
per-iteration loop machinery. This kernel runs the WHOLE greedy selection
in ONE grid step with the batch laid out on sublanes and points on lanes:
every iteration advances ALL items together — a broadcast one-hot
centroid extract, fused squared-distance, running-min, and per-row
(cross-lane) first-index argmax, all on (Bpad, Npad) VPU tiles resident
in VMEM. Indices accumulate in a (Bpad, mpad) carry via slot-masked
selects (no dynamic lane stores — see the Mosaic pitfalls note in the
kernel body).

A first (round-4) version ran one ITEM per grid step; grid steps are
sequential on the TensorCore, so it serialized the batch and measured
SLOWER than the XLA loop (36.7 vs 35.8 ms/batch encoder,
save/bench/ab_paconv_opt.json) — batch parallelism must live INSIDE the
step on TPU, not across grid steps.

Numerics match ops/fps.furthest_point_sampling BIT-EXACTLY by
construction: f32 distances with the same reduction order
((dx²+dy²)+dz²), the same running min, and argmax tie-breaking that picks
the first (lowest-index) maximum exactly like jnp.argmax
(tests/test_fps_kernel.py asserts index equality on CPU interpret;
tools/ab_paconv_opt.py records embedding parity on chip).

Replaces `pointops_cuda.furthestsampling`
(lib/pointops/src/sampling/sampling_cuda_kernel.cu:59-196) — the CUDA
kernel is the same greedy loop with a block-parallel argmax; the TPU
version keeps the cloud VMEM-resident and vectorizes over the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
_SUBLANES = 8


def _kernel(xt_ref, idx_ref, *, n: int, m: int, npad: int, mpad: int):
    """xt_ref: (3, Bpad, npad) f32 coordinate planes (pad lanes/rows zero).
    idx_ref: (Bpad, mpad) int32 out."""
    X = xt_ref[0]                                          # (Bpad, npad)
    Y = xt_ref[1]
    Z = xt_ref[2]
    bpad = X.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bpad, npad), 1)
    # padded lanes must never win the per-row argmax
    min_d0 = jnp.where(lane < n, jnp.inf, -jnp.inf)

    slot = jax.lax.broadcasted_iota(jnp.int32, (bpad, mpad), 1)

    def body(i, carry):
        min_d, far, idxv = carry
        # record the incoming pick of every item into slot i
        idxv = jnp.where(slot == i,
                         jnp.broadcast_to(far, (bpad, mpad)), idxv)
        mask = (lane == far).astype(jnp.float32)           # (Bpad, npad)
        cx = jnp.sum(X * mask, axis=1, keepdims=True)      # (Bpad, 1)
        cy = jnp.sum(Y * mask, axis=1, keepdims=True)
        cz = jnp.sum(Z * mask, axis=1, keepdims=True)
        dx = X - cx
        dy = Y - cy
        dz = Z - cz
        # same f32 reduction order as the XLA path's sum over the last
        # axis: (dx^2 + dy^2) + dz^2
        d = (dx * dx + dy * dy) + dz * dz
        min_d = jnp.minimum(min_d, d)
        maxv = jnp.max(min_d, axis=1, keepdims=True)
        # first-index tie-break == jnp.argmax
        far = jnp.min(jnp.where(min_d == maxv, lane, npad), axis=1,
                      keepdims=True).astype(jnp.int32)
        return min_d, far, idxv

    far0 = jnp.zeros((bpad, 1), jnp.int32)
    # Mosaic pitfalls bisected on chip (2026-08-21, v5e), all producing
    # "invalid relayout {0,0} -> {*,0}" or alignment errors:
    #   * jnp.zeros init for the accumulator carry: laid out
    #     sublane-replicated; the loop value varies per sublane and the
    #     back-edge relayout is unsupported;
    #   * iota-derived zero inits: constant-folded back to replicated;
    #   * dynamic minor-dim stores (idx_ref[:, pl.ds(i, 1)] = far):
    #     lane offsets must be statically 128-aligned.
    # RUNTIME-data-derived zeros (X * 0 is not foldable under float
    # semantics — NaN/inf) keep the init in the sublane-varying layout
    # the loop value has.
    idxv0 = (X[:, :mpad] * 0.0).astype(jnp.int32)
    _, _, idxv = jax.lax.fori_loop(0, m, body, (min_d0, far0, idxv0))
    idx_ref[...] = idxv


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def fps_pallas(xyz: jnp.ndarray, m: int, *, interpret: bool = False
               ) -> jnp.ndarray:
    """xyz: (B, N, D>=3; only xyz used) -> int32 (B, m); first pick is
    index 0 (the deterministic-start contract of
    ops/fps.furthest_point_sampling)."""
    b, n, _ = xyz.shape
    npad = -(-n // _LANES) * _LANES
    mpad = -(-m // _LANES) * _LANES
    bpad = -(-b // _SUBLANES) * _SUBLANES
    xt = jnp.moveaxis(xyz[..., :3].astype(jnp.float32), -1, 0)  # (3, B, N)
    xt = jnp.pad(xt, ((0, 0), (0, bpad - b), (0, npad - n)))
    kern = functools.partial(_kernel, n=n, m=m, npad=npad, mpad=mpad)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((3, bpad, npad), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((bpad, mpad), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bpad, mpad), jnp.int32),
        interpret=interpret,
    )(xt)
    return out[:b, :m]
