"""Farthest-point sampling as a fixed-trip-count lax.fori_loop.

Replaces `pointops_cuda.furthestsampling`
(lib/pointops/src/sampling/sampling_cuda_kernel.cu:59-196) and the
torch_cluster/torch_geometric `fps` used by the dataloaders
(dataloaders/ams_voxel_loader.py:298-327, random_start=False there — the
deterministic start at index 0 is load-bearing for eval reproducibility and
matched here).

Each iteration is one (B, N) distance update + masked argmax — pure VPU
work with a static trip count `m`, so the whole op jit-compiles into a
single fused loop. O(m*N) like the CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# On TPU the greedy loop runs as ONE Pallas kernel (VMEM-resident cloud,
# no per-iteration XLA loop machinery): bit-exact vs the XLA path
# (tests/test_fps_kernel.py) and ~an order cheaper on the hosted chip
# (the XLA loop costs ~4.5 ms/batch of PAConv eval,
# save/bench/ablate_paconv.json). Trace-time flag for A/B tooling.
_USE_KERNEL = __import__("os").environ.get("FLOWCOMPARE_FPS_KERNEL", "1") == "1"


def furthest_point_sampling(xyz: jnp.ndarray, m: int) -> jnp.ndarray:
    """xyz: (B, N, 3-or-D) -> int32 (B, m) indices; first pick is index 0.

    Index selection only — not differentiable; callers stop_gradient the
    input (the reference's CUDA furthestsampling has no backward either).
    """
    b, n, _ = xyz.shape
    if _USE_KERNEL and xyz.shape[-1] == 3 and jax.default_backend() == "tpu":
        from .fps_pallas import fps_pallas
        return fps_pallas(xyz, m)
    xyzf = xyz.astype(jnp.float32)

    def body(i, carry):
        idx, min_d, farthest = carry
        idx = idx.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyzf, farthest[:, None, None], axis=1)
        d = jnp.sum((xyzf - centroid) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        return idx, min_d, jnp.argmax(min_d, axis=-1).astype(jnp.int32)

    idx0 = jnp.zeros((b, m), jnp.int32)
    min_d0 = jnp.full((b, n), jnp.inf, jnp.float32)
    far0 = jnp.zeros((b,), jnp.int32)
    idx, _, _ = jax.lax.fori_loop(0, m, body, (idx0, min_d0, far0))
    return idx


def fps_subsample(points: jnp.ndarray, m: int) -> jnp.ndarray:
    """Convenience: FPS-select m rows of (B, N, D) points."""
    idx = furthest_point_sampling(points[..., :3], m)
    return jnp.take_along_axis(points, idx[..., None], axis=1)
