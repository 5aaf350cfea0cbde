"""PAConv PointNet++ (SSG) conditioning encoder — TPU-native.

Reference: `models/scene_seg_PAConv/model/pointnet2/pointnet2_paconv_seg.py`
plus `paconv.py` / `pointnet2_paconv_modules.py`. Four set-abstraction
levels (FPS -> kNN grouping -> PAConv weight-bank convolution -> max agg),
four feature-propagation levels (3-NN inverse-distance interpolation + skip
concat + shared MLP), and a residual out-MLP head.

The CUDA kernels (furthestsampling, knnquery_heap, grouping, interpolation,
assign_score_withk) are replaced by the jit-able primitives in ops/ — see
ops/fps.py, ops/knn.py, ops/paconv_ops.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.batchnorm import apply_batchnorm, init_batchnorm
from ..core.initializers import xavier_normal
from ..core.mlp import apply_mlp, gelu, init_mlp
from ..ops.fps import furthest_point_sampling
from ..ops.knn import (gather_neighbors, gather_neighbors_mm, knn_indices,
                       three_nn_interpolate)
from ..ops.paconv_ops import paconv_assign_score

SA_MLPS = lambda c: [[c, 32, 32, 64], [64, 64, 64, 128],
                     [128, 128, 128, 256], [256, 256, 256, 512]]
FP_MLPS = lambda c: [[128 + c, 128, 128, 128], [256 + 64, 256, 128],
                     [256 + 128, 256, 256], [512 + 256, 256, 256]]
NSAMPLE = 32

# Fused SA-grouping kernel (ops/sa_group_pallas.py) on the eval path:
# replaces kNN + HBM one-hot gathers with one Pallas launch per level.
# Eval-only (training keeps the autodiff-able scatter-free gathers);
# single-device TPU only, like the other fused kernels. Tests force the
# kernel on CPU via interpret mode.
_FUSED_GROUPING = True
_FORCE_FUSED_GROUPING_INTERPRET = False
SCORENET_HIDDEN = [16]
M_KERNELS = 8


def _init_scorenet(key, in_dim: int, m: int):
    """ScoreNet (paconv.py:12-54): Conv2d(1x1)+BN+ReLU chain, last layer has
    bias and no BN, softmax over the m kernels."""
    dims = [in_dim] + list(SCORENET_HIDDEN) + [m]
    layers, states = [], []
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        last = i == len(dims) - 2
        lin = xavier_normal(keys[i], dims[i], dims[i + 1], bias=last)
        bn_p, bn_s = (None, None) if last else init_batchnorm(dims[i + 1])
        layers.append({"lin": lin, "bn": bn_p})
        states.append(bn_s)
    return {"layers": layers}, {"layers": states}


def _apply_scorenet(params, state, xyz_feat, *, training):
    """xyz_feat: (B, N, K, in_dim) -> scores (B, N, K, m), softmaxed.

    Runs at the input's dtype (weights cast at use — the bf16 eval policy);
    the softmax is computed in f32 and cast back."""
    h = xyz_feat
    dt = h.dtype
    new_states = []
    n_layers = len(params["layers"])
    for i, (layer, bn_state) in enumerate(zip(params["layers"], state["layers"])):
        h = h @ layer["lin"]["w"].astype(dt)
        if "b" in layer["lin"]:
            h = h + layer["lin"]["b"].astype(dt)
        if i < n_layers - 1:
            h, bn_state = apply_batchnorm(layer["bn"], bn_state, h, training=training)
            h = jax.nn.relu(h).astype(dt)
        new_states.append(bn_state)
    scores = jax.nn.softmax(h.astype(jnp.float32), axis=-1).astype(dt)
    return scores, {"layers": new_states}


def _init_paconv_layer(key, in_dim: int, out_dim: int, *, bn: bool = True):
    k_score, k_bank = jax.random.split(key)
    score_p, score_s = _init_scorenet(k_score, 3, M_KERNELS)
    # weight bank: kaiming-normal on (m, 2*in, out) — torch's fan_in for a
    # 3D tensor is size(1) * size(2) — reshaped to (2*in, m*out).
    import math
    std = math.sqrt(2.0 / (in_dim * 2 * out_dim))
    bank = std * jax.random.normal(k_bank, (M_KERNELS, in_dim * 2, out_dim))
    bank = jnp.transpose(bank, (1, 0, 2)).reshape(in_dim * 2, M_KERNELS * out_dim)
    params = {"scorenet": score_p, "weightbank": bank}
    state = {"scorenet": score_s}
    if bn:
        params["bn"], state["bn"] = init_batchnorm(out_dim)
    return params, state


def _apply_paconv_layer(params, state, feats, grouped_xyz_diff, *, training):
    """One PAConv layer on grouped neighbourhoods.

    feats: (B, N1, K, C) grouped input features; grouped_xyz_diff:
    (B, N1, K, 3) neighbour positions relative to the centre. Returns
    ((B, N1, K, O), new_state). score_input='identity' (the default config),
    kernel_input='neighbor'.
    """
    center = feats[:, :, :1, :]
    in_feat = jnp.concatenate((feats - center, feats), axis=-1)  # (B,N1,K,2C)
    scores, score_state = _apply_scorenet(
        params["scorenet"], state["scorenet"],
        grouped_xyz_diff.astype(feats.dtype), training=training)
    out = paconv_assign_score(
        in_feat, params["weightbank"].astype(in_feat.dtype), scores,
        M_KERNELS)
    new_state = {"scorenet": score_state}
    if "bn" in params:
        out, new_state["bn"] = apply_batchnorm(
            params["bn"], state["bn"], out, training=training)
        out = jax.nn.relu(out).astype(in_feat.dtype)
    return out, new_state


def _init_shared_mlp(key, dims, *, bn: bool = True):
    layers, states = [], []
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        lin = xavier_normal(keys[i], dims[i], dims[i + 1], bias=not bn)
        bn_p, bn_s = init_batchnorm(dims[i + 1]) if bn else (None, None)
        layers.append({"lin": lin, "bn": bn_p})
        states.append(bn_s)
    return {"layers": layers}, {"layers": states}


def _apply_shared_mlp(params, state, h, *, training):
    dt = h.dtype
    new_states = []
    for layer, bn_state in zip(params["layers"], state["layers"]):
        h = h @ layer["lin"]["w"].astype(dt)
        if "b" in layer["lin"]:
            h = h + layer["lin"]["b"].astype(dt)
        if layer["bn"] is not None:
            h, bn_state = apply_batchnorm(layer["bn"], bn_state, h, training=training)
        h = jax.nn.relu(h).astype(dt)
        new_states.append(bn_state)
    return h, {"layers": new_states}


def init_pointnet2_paconv(key: jax.Array, *, c: int = 3, k: int = 64,
                          out_mlp_dims=(512, 512, 512)) -> Tuple[dict, dict]:
    """c = non-xyz feature channels (3 for rgb); k = output embedding dim."""
    sa_specs = SA_MLPS(c)
    fp_specs = FP_MLPS(c)
    keys = jax.random.split(key, 9)
    params: dict = {"sa": [], "fp": []}
    state: dict = {"sa": [], "fp": []}
    for i, spec in enumerate(sa_specs):
        spec = list(spec)
        spec[0] += 3  # use_xyz: grouped_xyz_diff concat (modules.py:99-100)
        lkeys = jax.random.split(keys[i], len(spec) - 1)
        lp, ls = [], []
        for j in range(len(spec) - 1):
            p, s = _init_paconv_layer(lkeys[j], spec[j], spec[j + 1])
            lp.append(p)
            ls.append(s)
        params["sa"].append(lp)
        state["sa"].append(ls)
    for i, spec in enumerate(fp_specs):
        p, s = _init_shared_mlp(keys[4 + i], spec)
        params["fp"].append(p)
        state["fp"].append(s)
    params["out_mlp"] = init_mlp(keys[8], 128, list(out_mlp_dims), k)
    return params, state


def _sa_level(params, state, xyz, feats, *, training):
    """One set-abstraction level: FPS to N/4 centres, kNN group, PAConv
    chain with max aggregation (pointnet2_paconv_modules.py:20-61).

    In training the gathers use the scatter-free matmul backward
    (ops/knn.gather_neighbors_mm): the hosted TPU backend miscompiles
    chained scatter backwards (CLAUDE.md), and eliminating scatters is the
    property that made the fused EdgeConv train kernel's chip gradients
    correct. stop_gradient on the kNN/FPS inputs is exact (integer index
    selection, same as torch autograd through top_k) and keeps dead
    top_k-transpose scatters out of the backward graph."""
    npoint = xyz.shape[1] // 4
    xyz_sg = jax.lax.stop_gradient(xyz)
    idx = furthest_point_sampling(xyz_sg, npoint)
    gather = gather_neighbors_mm if training else gather_neighbors
    new_xyz = gather(xyz, idx[..., None])[:, :, 0]
    on_tpu = (jax.default_backend() == "tpu" and jax.device_count() == 1)
    if (_FUSED_GROUPING and not training
            and (on_tpu or _FORCE_FUSED_GROUPING_INTERPRET)):
        # Fused grouping kernel (ops/sa_group_pallas.py): dist matmul +
        # exact selection + one-hot MXU gathers in one launch — no
        # (B, M*K, N) one-hot in HBM. Same membership and self-first
        # contract as the gather path; slots 1..k-1 are index-ordered
        # instead of distance-ordered, which everything below (per-slot
        # ScoreNet, weight bank, max aggregation) is invariant to.
        from ..ops.sa_group_pallas import sa_group_fused
        h = sa_group_fused(new_xyz, idx, xyz, feats, NSAMPLE,
                           interpret=_FORCE_FUSED_GROUPING_INTERPRET)
        grouped_xyz_diff = h[..., :3]
    else:
        # self_idx pins neighbour slot 0 to the center itself (knnquery_heap
        # contract; the PAConv op's center-feature slot depends on it) even
        # under the TPU MXU's bf16 distance-rounding noise
        knn_idx = knn_indices(jax.lax.stop_gradient(new_xyz), xyz_sg, NSAMPLE,
                              self_idx=idx)
        if feats.dtype == xyz.dtype:
            # ONE gather for xyz+feats (half the index traffic of two)
            grouped = gather(jnp.concatenate((xyz, feats), axis=-1), knn_idx)
            grouped_xyz, grouped_feats = grouped[..., :3], grouped[..., 3:]
        else:
            # bf16 eval policy: features gather at bf16 (half the bytes);
            # geometry stays f32 — the centre-relative diff below would
            # catastrophically cancel at bf16
            grouped_xyz = gather(xyz, knn_idx)
            grouped_feats = gather(feats, knn_idx)
        grouped_xyz_diff = (grouped_xyz - new_xyz[:, :, None, :]
                            ).astype(feats.dtype)
        h = jnp.concatenate((grouped_xyz_diff, grouped_feats), axis=-1)
    new_states = []
    for lp, ls in zip(params, state):
        h, ns = _apply_paconv_layer(lp, ls, h, grouped_xyz_diff, training=training)
        new_states.append(ns)
    return new_xyz, jnp.max(h, axis=2), new_states


def apply_pointnet2_paconv(params, state, pointcloud, *, training: bool = False,
                           dtype=None):
    """pointcloud: (B, N, 3 + c) -> ((B, N, k), new_state).

    dtype: optional compute dtype (bf16 eval policy, mirroring the DGCNN
    encoder): features, conv/scorenet/MLP matmuls and their activations run
    at `dtype`; GEOMETRY stays f32 — FPS picks and kNN membership must not
    move under bf16 coordinate rounding (the reference's CUDA ops are f32),
    and BN statistics stay f32 via core/batchnorm. dtype=None (training,
    golden parity) is the unchanged f32 path."""
    xyz = pointcloud[..., :3]
    feats = pointcloud[..., 3:]
    if dtype is not None:
        feats = feats.astype(dtype)
    l_xyz, l_feats = [xyz], [feats]
    new_state = {"sa": [], "fp": [None] * 4}
    for i in range(4):
        nx, nf, ns = _sa_level(params["sa"][i], state["sa"][i],
                               l_xyz[i], l_feats[i], training=training)
        l_xyz.append(nx)
        l_feats.append(nf)
        new_state["sa"].append(ns)
    for i in range(-1, -5, -1):
        interp = three_nn_interpolate(l_xyz[i - 1], l_xyz[i], l_feats[i],
                                      mm_backward=training)
        skip = l_feats[i - 1]
        interp = interp.astype(l_feats[i].dtype)
        h = jnp.concatenate([interp, skip], axis=-1) if skip.shape[-1] else interp
        h, ns = _apply_shared_mlp(params["fp"][i], state["fp"][i], h,
                                  training=training)
        l_feats[i - 1] = h
        new_state["fp"][i] = ns
    out = apply_mlp(params["out_mlp"], l_feats[0], gelu, dtype=dtype)
    return out, new_state
