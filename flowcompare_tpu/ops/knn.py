"""k-nearest-neighbour search as batched MXU work.

Replaces three native paths of the reference with one jit-able primitive:
  * the dense cdist+topk kNN engine (`knn.py:55-78`) and the KeOps engine
    (`knn.py:6-53`),
  * `pointops_cuda.knnquery_heap` (`lib/pointops/src/knnquery_heap/*`), whose
    heap-ordered output guarantees neighbour 0 is the query itself when the
    query set equals the point set — the PAConv kernels rely on that
    ordering, which lax.top_k reproduces (exact-zero self distance sorts
    first, ties break by index),
  * `pointops_cuda.ballquery` (`lib/pointops/src/ballquery/*`): radius query
    keeping the first `nsample` hits, padding with the first hit.

The -2<x,y> + |x|^2 + |y|^2 expansion turns the distance matrix into one
batched matmul — for the reference's workloads (<= a few thousand points)
that is the speed-of-light TPU implementation; a Pallas tiled variant only
pays off once the (N, M) matrix stops fitting in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Trace-time top-k lowering for knn_indices: "topk" (lax.top_k, sort-based)
# or "approx" (lax.approx_max_k at recall 1.0 — exact membership via the
# TPU PartialReduce op). Default "approx": chip A/B -1.0 ms/batch on the
# PAConv encoder with identical membership (save/bench/ab_paconv_opt.json;
# membership equality: tests/test_paconv_forms.py). NOTE knn_self (DGCNN)
# does NOT route through this flag — the fused kernels' bit-exactness
# contract is against lax.top_k tie order.
# Env override for A/B tooling: FLOWCOMPARE_TOPK_IMPL.
import os as _os

_TOPK_IMPL = _os.environ.get("FLOWCOMPARE_TOPK_IMPL", "approx")


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances. x: (..., N, D), y: (..., M, D) -> (..., N, M)."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    inner = jnp.einsum("...nd,...md->...nm", xf, yf,
                       preferred_element_type=jnp.float32)
    xx = jnp.sum(xf * xf, axis=-1)[..., :, None]
    yy = jnp.sum(yf * yf, axis=-1)[..., None, :]
    return xx - 2.0 * inner + yy


def knn_indices(query: jnp.ndarray, points: jnp.ndarray, k: int,
                self_idx: jnp.ndarray | None = None,
                impl: str | None = None) -> jnp.ndarray:
    """Indices of the k nearest `points` for each `query` point.

    query: (..., M, D), points: (..., N, D) -> int32 (..., M, k), nearest
    first (self-first when query is points — the knnquery_heap contract).
    When k > N the tail is padded with index 0, matching the CUDA heap's
    untouched slots (knnquery_heap_cuda_kernel.cu:68-72).

    `self_idx` (..., M) int: the known index of each query point within
    `points`, when the queries ARE points (e.g. FPS-sampled centers). On
    TPU the MXU rounds the f32 distance-matmul operands to bf16, so the
    self distance is NOT exactly zero and self-first can be violated by
    rounding noise; passing the known index pins slot 0 to self exactly
    (the knnquery_heap contract PAConv's center-feature slot depends on)
    while leaving all other ranks untouched.
    """
    n = points.shape[-2]
    neg_dist = -pairwise_sqdist(query, points)
    if self_idx is not None:
        is_self = (jnp.arange(n, dtype=self_idx.dtype)
                   == self_idx[..., None])                   # (..., M, N)
        neg_dist = jnp.where(is_self, jnp.inf, neg_dist)
    if (impl or _TOPK_IMPL) == "approx":
        # TPU PartialReduce lowering; recall_target=1.0 makes it EXACT
        # top-k membership (tie ORDER may differ from lax.top_k — callers
        # that depend on slot order beyond self-first must not flip this)
        _, idx = jax.lax.approx_max_k(neg_dist, min(k, n),
                                      recall_target=1.0,
                                      aggregate_to_topk=True)
    else:
        _, idx = jax.lax.top_k(neg_dist, min(k, n))
    if k > n:
        pad = jnp.zeros(idx.shape[:-1] + (k - n,), idx.dtype)
        idx = jnp.concatenate([idx, pad], axis=-1)
    return idx


def knn_self(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Self-kNN over the point axis (DGCNN's dynamic graph, pytorch_gcn.py:13-20).

    NOTE: self-first is exact on CPU (the expansion's diagonal cancels to
    exactly 0) but only approximate on TPU, where bf16 MXU rounding leaves
    O(|x|^2 * 2^-9) diagonal noise. Deliberately NOT pinned here: DGCNN
    max-pools over the neighbour set (slot order is irrelevant, only
    membership matters) and the fused EdgeConv/DGCNN kernels share these
    exact selection semantics — pinning only the gather path would break
    their validated fused-vs-gather bit-exactness on chip. PAConv, whose
    slot-0 contract IS load-bearing, pins via knn_indices(self_idx=...).

    Pinned to the lax.top_k lowering regardless of _TOPK_IMPL: the fused
    DGCNN kernels' bit-exactness contract is against top_k's index-ordered
    tie-breaking (docs/kernels.md), which approx_max_k does not promise.
    FLOWCOMPARE_KNN_SELF_TOPK=approx is an explicit opt-out for the
    DEGRADED-host XLA-encoder bench rung only (no fused kernel compiles
    there, so no parity contract binds; membership stays exact at
    recall=1.0, only tie order can differ).
    """
    return knn_indices(x, x, k,
                       impl=_os.environ.get("FLOWCOMPARE_KNN_SELF_TOPK",
                                            "topk"))


# "take" (XLA gather) or "onehot" (one-hot @ features on the MXU — the
# same trick the fused DGCNN kernel uses for its in-kernel gathers).
# The one-hot path is BIT-EXACT for FINITE features in BOTH dtypes: bf16
# trivially (1.0 * v is exact, zero terms vanish exactly), f32 via
# Precision.HIGHEST (bf16x3 splits, see gather_neighbors). Default
# "onehot" by chip A/B: 20.25 vs 23.43 ms/batch on the good-surf encoder
# (save/bench/ab_paconv_opt2.json, same-worker, parity exact by
# construction).
# PRECONDITION: features must be FINITE. The one-hot matmul computes each
# row as sum(onehot * features), so a single non-finite value anywhere in
# `features` poisons every output row (0.0 * inf = NaN enters the sum),
# where take_along_axis would return only the stored rows. This system
# demonstrably produces non-finite intermediates in OOD conditions
# (CLAUDE.md MEASUREMENT TRAP 4) — but only downstream of the encoders in
# flow log-prob space; encoder-side gathers operate on coordinates/features
# that are finite by construction. Callers gathering potentially-NaN data
# must pass through jnp.take_along_axis or set FLOWCOMPARE_GATHER_IMPL=take.
_GATHER_IMPL = _os.environ.get("FLOWCOMPARE_GATHER_IMPL", "onehot")


def gather_neighbors(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbour features.

    features: (B, N, C), idx: (B, M, K) -> (B, M, K, C). XLA gather replaces
    `pointops_cuda.grouping` (+ its scatter-add backward, which autodiff
    derives for free).
    """
    b, m, k = idx.shape
    flat = idx.reshape(b, m * k)
    if _GATHER_IMPL == "onehot" and features.dtype in (jnp.bfloat16,
                                                       jnp.float32):
        n = features.shape[1]
        onehot = (flat[..., None] == jnp.arange(n, dtype=flat.dtype)
                  ).astype(features.dtype)                 # (B, M*K, N)
        # exact row copy for BOTH dtypes: bf16 trivially (1.0 * v); f32 via
        # HIGHEST precision — the bf16x3 splits of v are non-overlapping
        # mantissa segments, each times 1.0 is exact, and their f32 sum
        # reconstructs v exactly
        out = jnp.matmul(onehot, features,
                         precision=(None if features.dtype == jnp.bfloat16
                                    else jax.lax.Precision.HIGHEST))
        return out.reshape(b, m, k, features.shape[-1])
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(b, m, k, features.shape[-1])


@jax.custom_vjp
def gather_neighbors_mm(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """gather_neighbors with a SCATTER-FREE backward.

    Forward is identical (XLA gather). The custom VJP computes
    du = onehot(idx)^T @ dg as an MXU matmul per batch item (lax.map keeps
    the (M*K, N) one-hot off HBM at batch scale) instead of autodiff's
    scatter-add. Repeated indices (ball_query's first-hit padding)
    accumulate exactly like the scatter-add / the CUDA grouping backward.

    Motivation: on the hosted TPU backend, XLA silently miscompiles chained
    multi-stage backwards containing scatters (see CLAUDE.md; every
    isolated op is correct — the fusion of the composed chain is not).
    The scatter-free EdgeConv train kernel (ops/edgeconv_vjp_pallas.py)
    demonstrated correct chip gradients by eliminating scatters; this
    applies the same property to every PAConv train-path gather without a
    megakernel. CPU gradients are bit-comparable to the scatter path
    (tests/test_paconv_mm_grad.py); chip validation is a round-3 item.
    """
    return gather_neighbors(features, idx)


def _gather_mm_fwd(features, idx):
    return gather_neighbors(features, idx), \
        (idx, features.shape[1], jnp.zeros((), features.dtype))


def _gather_mm_bwd(res, dg):
    idx, n, tok = res
    b, m, k = idx.shape
    c = dg.shape[-1]

    def per_item(args):
        idx_i, dg_i = args
        flat = idx_i.reshape(m * k)
        onehot = (flat[:, None] == jnp.arange(n, dtype=flat.dtype)[None, :]
                  ).astype(jnp.float32)
        # contract the M*K axis on the MXU: (N, C) = onehot^T @ dg, f32
        # accumulation matching the scatter-add's
        return jax.lax.dot_general(
            onehot, dg_i.reshape(m * k, c).astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    du = jax.lax.map(per_item, (idx, dg))
    return du.astype(tok.dtype), None


gather_neighbors_mm.defvjp(_gather_mm_fwd, _gather_mm_bwd)


def ball_query(radius: float, nsample: int, points: jnp.ndarray,
               query: jnp.ndarray) -> jnp.ndarray:
    """First `nsample` points within `radius` of each query, padded with the
    first hit (ballquery_cuda_kernel.cu:47 contract).

    Implemented as: rank points by (out-of-ball, index) and take the first
    nsample — identical membership to the scan order of the CUDA kernel.
    """
    d2 = pairwise_sqdist(query, points)
    n = points.shape[-2]
    in_ball = d2 < radius * radius
    order = jnp.arange(n, dtype=jnp.float32)
    # Sort key: in-ball points keep their index, out-of-ball pushed to +inf.
    key = jnp.where(in_ball, order, jnp.inf)
    _, idx = jax.lax.top_k(-key, nsample)
    has_any = jnp.any(in_ball, axis=-1, keepdims=True)
    first = idx[..., :1]
    taken_in_ball = jnp.take_along_axis(in_ball, idx, axis=-1)
    idx = jnp.where(taken_in_ball, idx, first)
    idx = jnp.where(has_any, idx, 0)
    return idx.astype(jnp.int32)


def three_nn_interpolate(unknown_xyz: jnp.ndarray, known_xyz: jnp.ndarray,
                         known_feats: jnp.ndarray,
                         eps: float = 1e-8,
                         mm_backward: bool = False) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN interpolation.

    Replaces `pointops_cuda.nearestneighbor` + `interpolation`
    (lib/pointops/src/interpolation/*). NOTE the reference weights by
    1/(d^2 + eps): the CUDA kernel returns SQUARED distances
    (interpolation_cuda_kernel.cu:5-54 `dist2`) and the FP module reciprocates
    them directly (pointnet2_paconv_modules.py:225-227) — matched exactly.
    unknown (B, n, 3), known (B, m, 3), known_feats (B, m, C) -> (B, n, C).
    """
    m = known_xyz.shape[-2]
    d2 = pairwise_sqdist(unknown_xyz, known_xyz)
    neg, idx = jax.lax.top_k(-d2, min(3, m))
    if m < 3:
        # CUDA kernel pads its best-3 slots with dist 1e40 / idx 0 when m < 3
        pad_n = 3 - m
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad_n,), idx.dtype)], axis=-1)
        neg = jnp.concatenate(
            [neg, jnp.full(neg.shape[:-1] + (pad_n,), -1e20, neg.dtype)], axis=-1)
    recip = 1.0 / (jnp.maximum(-neg, 0.0) + eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    gather = gather_neighbors_mm if mm_backward else gather_neighbors
    gathered = gather(known_feats, idx)
    return jnp.einsum("bnk,bnkc->bnc", weight, gathered,
                      preferred_element_type=jnp.float32).astype(known_feats.dtype)


def nearest_neighbor_gather(query_xyz: jnp.ndarray, points_xyz: jnp.ndarray,
                            feats: jnp.ndarray) -> jnp.ndarray:
    """1-NN feature redistribution (pointops featuredistribute/featuregather).

    Pinned to the lax.top_k lowering regardless of _TOPK_IMPL: at k=1 the
    approx path buys nothing, and top_k's index-ordered tie-breaking matches
    the reference CUDA first-min scan for equidistant points
    (featuredistribute_cuda_kernel.cu argmin semantics) — keeping this path
    deterministic under the global approx default.
    """
    idx = knn_indices(query_xyz, points_xyz, 1, impl="topk")[..., 0]
    return jnp.take_along_axis(feats, idx[..., None], axis=1)
