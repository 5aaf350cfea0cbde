"""Fused set-abstraction grouping (PAConv eval path) as a Pallas TPU kernel.

The XLA formulation of one SA level's grouping (encoders/paconv.py
_sa_level) runs kNN (distance matmul + top-k) and then materialises a
(B, M*K, N) one-hot in HBM for the MXU gathers (ops/knn.gather_neighbors)
— at level 1 of good-surf that is ~625 MB of one-hot traffic per batch,
and grouping/kNN is ~9.5 ms of the 15.6 ms encoder
(save/bench/ablate_paconv_final.json). This kernel is the reference's
fused grouping pipeline (knnquery_heap_cuda_kernel.cu:52-88 +
grouping_cuda_kernel.cu) rebuilt with the edge-conv kernel machinery
(ops/edgeconv_pallas.py): per batch item,

  * one (M, Npad) distance block on the MXU,
  * the exact k-th-smallest threshold per row by binary search over f32
    bit patterns with index-ordered tie-breaking (lax.top_k semantics),
    slot 0 PINNED to the center itself (`self_cols` — the knnquery_heap
    contract `_apply_paconv_layer`'s center slot depends on),
  * per sub-block, a (R_SUB*k, Npad) selection one-hot whose MXU matmuls
    gather the neighbours' xyz rows (f32, HIGHEST precision — exact row
    copy via non-overlapping bf16x3 splits) and feature rows (bf16,
    exact by construction), entirely in VMEM,
  * the center-relative xyz diff computed in f32 before the cast to the
    feature dtype (the same catastrophic-cancellation policy as the XLA
    path).

Output is the (B, M, K, 3+C) grouped block `_sa_level` feeds the PAConv
layers: [..., :3] = grouped_xyz - center (feats dtype), [..., 3:] =
grouped feats. Eval-only (the training path keeps the autodiff-able
scatter-free gather formulation); selection semantics match
knn_indices(impl="topk", self_idx=...) + gather_neighbors exactly.

Deliberately ROLLED and row-major (fori_loop sub-blocks, no transposed
slot passes): structurally the shape of the TRAIN edge-conv kernel, the
one kNN-family program the degraded remote compile helper still accepts
(CLAUDE.md 2026-08-20) — compile-friendliness is worth more than the last
millisecond here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .edgeconv_pallas import _knn_select_ranks

_ROW_SUB = 8        # centers per extraction sub-block (H is R_SUB*k x Npad)
_PAD_FAR = 1e4      # pad coordinate far from every real point


def _sa_group_kernel(newxyz_ref, idx_ref, xyz_ref, feats_ref, out_ref,
                     rank_ref, *, k: int, n_real: int):
    xb = newxyz_ref[0]                           # (M, 3) f32 centers
    xf = xyz_ref[0]                              # (Npad, 3) f32 cloud
    feats = feats_ref[0]                         # (Npad, C)
    m = xb.shape[0]
    npad = xf.shape[0]
    cdt = feats.dtype

    self_cols = idx_ref[0, 0].reshape(m, 1)      # (M, 1) int32
    ranks = _knn_select_ranks(xb, xf, None, k=k, self_cols=self_cols)
    # _knn_select_ranks assigns slots in INDEX order (slot order is
    # irrelevant to DGCNN's max-pool); PAConv's center contract needs the
    # self column at slot 0. Rotate: self -> rank 1, every selected column
    # whose index-ordered rank was below self's shifts up by one. Slots
    # 1..k-1 end up holding the non-self neighbours in ascending index
    # order — a permutation of the XLA path's distance order, invariant to
    # everything downstream (per-slot ScoreNet + max aggregation).
    col = jax.lax.broadcasted_iota(jnp.int32, ranks.shape, 1)
    is_self = col == self_cols
    self_rank = jnp.sum(jnp.where(is_self, ranks, 0), axis=1, keepdims=True)
    # store via a VMEM scratch so sub-blocks can be read back with pl.ds
    # (lax.dynamic_slice on a VALUE has no Pallas TPU lowering — chip
    # compile error 2026-08-21, invisible in interpret mode)
    rank_ref[:, :] = jnp.where(is_self, 1,
                               jnp.where((ranks > 0) & (ranks < self_rank),
                                         ranks + 1, ranks))

    n_sub = m // _ROW_SUB
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (_ROW_SUB, k, npad), 1) + 1

    def sub_body(si, _):
        rows = pl.ds(si * _ROW_SUB, _ROW_SUB)
        rk = rank_ref[rows, :]                   # (R_SUB, Npad) int32
        onehot = (rk[:, None, :] == t_iota)      # (R_SUB, k, Npad) bool
        if k > n_real:
            # k > N pad contract (knnquery_heap's untouched slots /
            # ops/knn.knn_indices tail): with fewer real points than
            # slots, the selection necessarily admits far-pad columns
            # into the trailing ranks — mask them out and gather point 0
            # there instead
            col3 = jax.lax.broadcasted_iota(jnp.int32,
                                            (_ROW_SUB, k, npad), 2)
            onehot = ((onehot & (col3 < n_real))
                      | ((t_iota > n_real) & (col3 == 0)))
        h = onehot.reshape(_ROW_SUB * k, npad)
        # exact f32 row copy: HIGHEST = bf16x3 passes, each non-overlapping
        # mantissa segment times 1.0 is exact and the f32 sum reconstructs
        g_xyz = jnp.dot(h.astype(jnp.float32), xf,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        # Mosaic requires a 32-bit matmul accumulator (a bf16
        # preferred_element_type verifies in interpret mode but fails
        # tpu.matmul verification on chip — caught 2026-08-21); the
        # one-hot rows copy exact bf16-representable values, so f32
        # accumulate + downcast is bit-identical to a bf16 gather
        g_feat = jnp.dot(h.astype(cdt) if cdt == jnp.bfloat16
                         else h.astype(jnp.float32), feats,
                         precision=(None if cdt == jnp.bfloat16
                                    else jax.lax.Precision.HIGHEST),
                         preferred_element_type=jnp.float32).astype(cdt)
        xb_sub = newxyz_ref[0, rows]             # (R_SUB, 3) f32
        diff = (g_xyz.reshape(_ROW_SUB, k, 3)
                - xb_sub[:, None, :]).astype(cdt)
        out_ref[0, rows] = jnp.concatenate(
            [diff, g_feat.reshape(_ROW_SUB, k, feats.shape[-1])], axis=-1)
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def sa_group_fused(new_xyz: jnp.ndarray, idx: jnp.ndarray,
                   xyz: jnp.ndarray, feats: jnp.ndarray, k: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused FPS-center kNN grouping for one SA level.

    new_xyz: (B, M, 3) f32 centers (= xyz gathered at idx), idx: (B, M)
    int32 center indices, xyz: (B, N, 3) f32, feats: (B, N, C).
    Returns (B, M, k, 3 + C) in feats.dtype: center-relative xyz diff
    (computed f32, cast) concatenated with the gathered features —
    exactly `_sa_level`'s grouped tensor. M is padded to a multiple of 8
    internally (repeating center 0) and sliced back, so every SA level
    (M = 312 / 78 / 19 / 4 at the shipped configs) can use it.

    SLOT ORDER: slot 0 is the center itself (the knnquery_heap contract);
    slots 1..k-1 hold the remaining k-1 nearest neighbours (exact
    membership, lax.top_k tie admission) in ascending INDEX order rather
    than distance order — everything downstream of the grouping
    (per-slot ScoreNet, weight-bank conv, max aggregation) is invariant
    to slot order past slot 0, so the SA level's OUTPUT is bit-identical.
    """
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    c = feats.shape[-1]
    assert idx.dtype == jnp.int32
    mpad = -(-m // _ROW_SUB) * _ROW_SUB
    if mpad != m:
        # pad centers by repeating center 0 (their output rows are sliced
        # off below; repeating a REAL center keeps every row's arithmetic
        # finite and in-distribution)
        reps = mpad - m
        new_xyz = jnp.concatenate(
            [new_xyz, jnp.broadcast_to(new_xyz[:, :1], (b, reps, 3))], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[:, :1], (b, reps))], axis=1)
    npad = -(-n // 128) * 128
    if npad != n:
        pad = jnp.full((b, npad - n, 3), _PAD_FAR, xyz.dtype)
        xyz = jnp.concatenate([xyz, pad], axis=1)
        feats = jnp.concatenate(
            [feats, jnp.zeros((b, npad - n, c), feats.dtype)], axis=1)
    grid = (b,)
    out = pl.pallas_call(
        functools.partial(_sa_group_kernel, k=k, n_real=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, mpad, 3), lambda i: (i, 0, 0)),
            # idx rides as (1, 1, mpad): a (1, mpad) block would put a
            # non-8-divisible dim in the sublane slot (Mosaic tiling rule:
            # last two block dims must be 8/128-divisible or equal the
            # array's) — caught on chip 2026-08-21, invisible in interpret
            pl.BlockSpec((1, 1, mpad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, npad, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, npad, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, mpad, k, 3 + c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, mpad, k, 3 + c), feats.dtype),
        scratch_shapes=[pltpu.VMEM((mpad, npad), jnp.int32)],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), idx[:, None, :],
      xyz.astype(jnp.float32), feats)
    return out[:, :m] if mpad != m else out
