"""Neighborhood class-histogram aggregation.

Parity ops for `pointops_cuda.labelstat_ballrange / labelstat_idx /
labelstat_and_ballquery` (lib/pointops/src/labelstat/labelstat_cuda_kernel.cu
:6-172) — dead in the reference's live path (PAConv-repo leftovers) but part
of the op-family inventory. One-hot + matmul/gather turns the whole family
into MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import ball_query, pairwise_sqdist


def labelstat_idx(label_stat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Sum per-point class histograms over given neighbour indices.

    label_stat: (B, N, nclass); idx: (B, M, K) -> (B, M, nclass)."""
    b, m, k = idx.shape
    flat = idx.reshape(b, m * k)
    gathered = jnp.take_along_axis(label_stat, flat[..., None], axis=1)
    return gathered.reshape(b, m, k, -1).sum(axis=2)


def labelstat_ballrange(xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                        label_stat: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Sum class histograms of ALL points within `radius` of each query
    (labelstat_ballrange_cuda_kernel: no sample cap)."""
    d2 = pairwise_sqdist(new_xyz, xyz)
    in_ball = (d2 < radius * radius).astype(label_stat.dtype)
    return jnp.einsum("bmn,bnc->bmc", in_ball, label_stat)


def labelstat_and_ballquery(xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                            label_stat: jnp.ndarray, radius: float,
                            nsample: int):
    """Ball query + histogram over the selected samples (fused CUDA pair)."""
    idx = ball_query(radius, nsample, xyz, new_xyz)
    return labelstat_idx(label_stat, idx), idx
