"""DGCNN conditioning encoders (per-point and global).

Reference: `models/pytorch_gcn.py:50-188` (FlowCompare, itself derived from
WangYueFt/dgcnn). Four EdgeConv stages on a dynamic feature-space kNN graph,
skip-concat, a fused point MLP, then either a per-point residual MLP head or
global max+avg pooling.

TPU design: everything is channels-last (B, N, K, C) so each "Conv2d(k=1)"
is a plain matmul on the MXU; the kNN graph is one batched distance matmul
+ top_k per stage (ops/knn.py). BatchNorm running statistics are explicit
state threaded through the call (core/batchnorm.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.batchnorm import apply_batchnorm, init_batchnorm
from ..core.initializers import apply_linear, torch_linear
from ..core.mlp import apply_mlp, gelu, init_mlp
from ..ops.knn import gather_neighbors, knn_self


def edge_features(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, N, C) -> (B, N, K, 2C) with channels (neighbor - x, x).

    Matches get_graph_feature (pytorch_gcn.py:23-47): the kNN graph is built
    in the current feature space, features are (xj - xi, xi).

    stop_gradient on the kNN input is semantically exact (top_k indices
    are integers, so no gradient exists through the selection — torch
    autograd behaves the same) and keeps XLA from materialising a dead
    top_k-transpose scatter in the backward graph.

    NOTE: this gather formulation's CHAINED backward is miscompiled on the
    axon TPU backend (see CLAUDE.md) — on chip, training must go through
    the fused kernel path (ops/edgeconv_vjp_pallas.py), which apply_dgcnn
    selects automatically.
    """
    idx = knn_self(jax.lax.stop_gradient(x), k)
    neighbors = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate((neighbors - center, center), axis=-1)


# Testing hook: route apply_dgcnn's TRAIN path through the fused kernel in
# Pallas interpret mode on CPU (tools/test_edgeconv_train_chip.py --cpu-
# control uses it to separate chip effects from formulation/bf16 noise).
_FORCE_FUSED_TRAIN_INTERPRET = False

# Testing hook: take the fused EVAL paths on CPU, in Pallas interpret mode
# (tests/test_pallas_kernels.py covers the per-stage fused path and the
# one-launch megakernel against the gather formulation this way).
_FORCE_FUSED_EVAL_INTERPRET = False

# Fused EVAL encoder as ONE Pallas launch (ops/dgcnn_pallas.py: all four
# EdgeConv stages + conv5 + per-point head in VMEM per item) instead of the
# per-stage kernels + XLA glue. Trace-time flag for chip A/B.
_ONE_LAUNCH = True

# one-time warning latch: multi-device TPU training fell back to gather
_MULTIDEVICE_TRAIN_WARNED: list = []


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def _init_conv_bn(key, in_dim, out_dim):
    params = {"conv": torch_linear(key, in_dim, out_dim, bias=False)}
    bn_params, bn_state = init_batchnorm(out_dim)
    params["bn"] = bn_params
    return params, bn_state


def _conv_bn_leaky(params, state, x, training):
    y = apply_linear(params["conv"], x)
    y, new_state = apply_batchnorm(params["bn"], state, y, training=training)
    return _leaky(y), new_state


_EDGE_DIMS = [(None, 64), (64, 64), (64, 128), (128, 256)]


def _global_pool(h: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, 2C): max ++ mean over points (DGCNNembedderGlobal's
    adaptive max+avg pooling; mean in f32)."""
    return jnp.concatenate(
        [jnp.max(h, axis=1),
         jnp.mean(h.astype(jnp.float32), axis=1).astype(h.dtype)], axis=-1)


def init_dgcnn(key: jax.Array, *, input_dim: int = 6, emb_dim: int,
               out_mlp_dims, n_neighbors: int = 20,
               global_pool: bool = False) -> Tuple[dict, dict]:
    """Params+state for DGCNNembedder (global_pool=False) / DGCNNembedderGlobal."""
    del n_neighbors  # static config, not a parameter
    keys = jax.random.split(key, 6)
    params, state = {}, {}
    in0 = input_dim * 2
    dims = [(in0, 64)] + [(c * 2, o) for (c, o) in _EDGE_DIMS[1:]]
    for i, (cin, cout) in enumerate(dims, start=1):
        p, s = _init_conv_bn(keys[i - 1], cin, cout)
        params[f"conv{i}"], state[f"bn{i}"] = p, s
    p5, s5 = _init_conv_bn(keys[4], 512, 512)
    params["conv5"], state["bn5"] = p5, s5
    head_in = 512 * 2 if global_pool else 512
    params["out_mlp"] = init_mlp(keys[5], head_in, out_mlp_dims, emb_dim)
    return params, state


def _fused_edge_stage(params, state, h, n_neighbors, *, bn_eps=1e-5):
    """Eval-mode EdgeConv via the Pallas kernel (ops/edgeconv_pallas.py).

    Decomposes conv([xj-xi, xi] @ W) into u_j + c_i, folds the BN slope sign
    into u so a single masked-max suffices, then applies the (monotone)
    BN affine + LeakyReLU to the reduced value. Mathematically identical to
    the gather path (bf16 rounding of u/c aside)."""
    from ..ops.edgeconv_pallas import edge_neighbor_max
    w = params["conv"]["w"]                       # (2C, Cout)
    c_in = h.shape[-1]
    w_diff, w_self = w[:c_in], w[c_in:]
    u = h @ w_diff
    c = h @ (w_self - w_diff)
    mean, var = state["mean"], state["var"]
    inv = jax.lax.rsqrt(var + bn_eps)
    slope = params["bn"]["scale"] * inv
    sign = jnp.where(slope >= 0, 1.0, -1.0).astype(u.dtype)
    mx = edge_neighbor_max(h, u * sign, n_neighbors)
    z = (sign * mx).astype(jnp.float32) + c.astype(jnp.float32)
    y = (z - mean) * inv * params["bn"]["scale"] + params["bn"]["bias"]
    return _leaky(y).astype(h.dtype)


def _fused_edge_stage_train(params, state, h, n_neighbors, *,
                            momentum=0.1, bn_eps=1e-5, interpret=False):
    """Train-mode EdgeConv via the differentiable fused kNN reduction
    (ops/edgeconv_vjp_pallas.py) — scatter-free forward AND backward.

    BatchNorm batch statistics over the full (B, N, K, C) edge tensor are
    reconstructed exactly from per-row neighbour sums: with z_ij = u_j + c_i,
    sum z = sum(s1) + k*sum(c) and sum z^2 = sum(s2 + 2*c*s1 + k*c^2). The
    per-channel BN affine is monotone, so max_k act(bn(z)) = act(bn(mx or mn
    by slope sign)); gradients through stats, max and the u/c matmuls are
    ordinary autodiff around the custom-VJP kernel. Matches the gather path
    (edge_features + _conv_bn_leaky + max) to compute-dtype rounding."""
    from ..ops.edgeconv_vjp_pallas import edge_knn_reduce
    w = params["conv"]["w"]
    c_in = h.shape[-1]
    w_diff, w_self = w[:c_in], w[c_in:]
    u = h @ w_diff
    c = h @ (w_self - w_diff)
    mx, mn, s1, s2 = edge_knn_reduce(h, u, n_neighbors, interpret=interpret)
    cf = c.astype(jnp.float32)
    k = float(n_neighbors)
    n_edges = h.shape[0] * h.shape[1] * k
    mean = (jnp.sum(s1, (0, 1)) + k * jnp.sum(cf, (0, 1))) / n_edges
    ez2 = (jnp.sum(s2, (0, 1)) + 2.0 * jnp.sum(cf * s1, (0, 1))
           + k * jnp.sum(cf * cf, (0, 1))) / n_edges
    var = jnp.maximum(ez2 - mean * mean, 0.0)
    gamma = params["bn"]["scale"].astype(jnp.float32)
    beta = params["bn"]["bias"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + bn_eps)
    zsel = jnp.where(gamma >= 0, mx, mn) + cf
    y = (zsel - mean) * inv * gamma + beta
    unbiased = var * (n_edges / max(n_edges - 1.0, 1.0))
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mean,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    return _leaky(y).astype(h.dtype), new_state


def apply_dgcnn(params: dict, state: dict, x: jnp.ndarray, *,
                n_neighbors: int = 20, training: bool = False,
                global_pool: bool = False, dtype=None, fused: bool = False):
    """x: (B, N, input_dim) -> ((B, N, emb_dim) or (B, emb_dim), new_state).

    dtype: optional compute dtype (bf16) — conv matmuls and the kNN distance
    matmul run at MXU rate; BatchNorm statistics stay f32.
    fused: Pallas edge-conv paths — eval (edgeconv_pallas) and, on a
    compiled TPU backend, the differentiable train kernel
    (edgeconv_vjp_pallas)."""
    new_state = {}
    feats = []
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        x = x.astype(dtype)
    # compiled-Pallas paths need a real TPU backend; on CPU fall back to the
    # gather formulation (same math) instead of failing to lower. They are
    # also SINGLE-DEVICE programs: under a multi-device mesh the kernels
    # have never been compiled inside SPMD, so fall back there too (same
    # contract as the flow megakernel — model._can_fuse_layers,
    # docs/kernels.md).
    on_tpu = (jax.default_backend() == "tpu" and jax.device_count() == 1)
    use_fused = fused and not training and (
        on_tpu or _FORCE_FUSED_EVAL_INTERPRET)
    use_fused_train = fused and training and (
        on_tpu or _FORCE_FUSED_TRAIN_INTERPRET)
    if (fused and training and not use_fused_train
            and jax.default_backend() == "tpu" and jax.device_count() > 1
            and not _MULTIDEVICE_TRAIN_WARNED):
        # Falling back to the gather formulation for TRAINING is only safe
        # where autodiff is trustworthy. On the hosted axon backend the
        # gather path's chained backward is silently miscompiled
        # (CLAUDE.md) — that backend is single-chip, so this branch cannot
        # trigger there, but warn loudly anyway: multi-chip training has
        # no validated fused-encoder path yet and gradient correctness now
        # rests on the platform's XLA autodiff being sound.
        _MULTIDEVICE_TRAIN_WARNED.append(True)
        import warnings
        warnings.warn(
            "DGCNN fused TRAIN kernels are single-device only; multi-device "
            f"({jax.device_count()} devices) training falls back to the XLA "
            "gather formulation. Its autodiff is correct on standard TPU "
            "toolchains but was observed miscompiled on the hosted axon "
            "backend — validate gradients against a single-device step "
            "(tests/test_train.py mesh-parity pattern) before trusting a "
            "long run (docs/kernels.md).")
    if use_fused and _ONE_LAUNCH:
        from ..ops.dgcnn_pallas import fused_dgcnn_encoder
        new_state = {f"bn{i}": state[f"bn{i}"] for i in range(1, 6)}
        interp = _FORCE_FUSED_EVAL_INTERPRET
        if global_pool:
            trunk = fused_dgcnn_encoder(x, params, state, k=n_neighbors,
                                        head=False, interpret=interp)
            return apply_mlp(params["out_mlp"], _global_pool(trunk),
                             gelu), new_state
        out = fused_dgcnn_encoder(x, params, state, k=n_neighbors, head=True,
                                  interpret=interp)
        return out, new_state
    h = x
    for i in range(1, 5):
        if use_fused:
            h = _fused_edge_stage(params[f"conv{i}"], state[f"bn{i}"], h,
                                  n_neighbors)
            new_state[f"bn{i}"] = state[f"bn{i}"]
        elif use_fused_train:
            h, new_state[f"bn{i}"] = _fused_edge_stage_train(
                params[f"conv{i}"], state[f"bn{i}"], h, n_neighbors,
                interpret=_FORCE_FUSED_TRAIN_INTERPRET)
        else:
            e = edge_features(h, n_neighbors)
            e, new_state[f"bn{i}"] = _conv_bn_leaky(
                params[f"conv{i}"], state[f"bn{i}"], e, training)
            h = jnp.max(e, axis=2)
        feats.append(h)
    h = jnp.concatenate(feats, axis=-1)  # (B, N, 512)
    h, new_state["bn5"] = _conv_bn_leaky(params["conv5"], state["bn5"], h, training)
    if global_pool:
        h = _global_pool(h)
    out = apply_mlp(params["out_mlp"], h, gelu)
    return out, new_state
