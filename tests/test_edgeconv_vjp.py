"""Parity tests for the differentiable fused EdgeConv kNN reduction
(ops/edgeconv_vjp_pallas.py), interpret mode on CPU.

Reference semantics: the gather formulation of encoders/dgcnn.py
(edge_features + conv + train-mode BatchNorm + LeakyReLU + max over k),
which itself mirrors /root/reference/models/pytorch_gcn.py:23-47 + BN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.core.batchnorm import init_batchnorm
from flowcompare_tpu.encoders.dgcnn import (
    _conv_bn_leaky, _fused_edge_stage_train, edge_features)
from flowcompare_tpu.ops.edgeconv_vjp_pallas import edge_knn_reduce
from flowcompare_tpu.ops.knn import gather_neighbors, knn_self

B, N, CQ, C, K = 2, 300, 6, 64, 13


def _ref_reduce(x, u, k):
    """Gather-based reference for edge_knn_reduce."""
    idx = knn_self(x, k)
    sel = gather_neighbors(u, idx).astype(jnp.float32)   # (B, N, K, C)
    return (jnp.max(sel, 2), jnp.min(sel, 2), jnp.sum(sel, 2),
            jnp.sum(sel * sel, 2))


@pytest.fixture(scope="module")
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, N, CQ), jnp.float32)
    u = jax.random.normal(k2, (B, N, C), jnp.float32)
    return x, u


def test_forward_matches_gather(data):
    x, u = data
    outs = edge_knn_reduce(x, u, K, interpret=True)
    refs = _ref_reduce(x.astype(jnp.bfloat16), u.astype(jnp.bfloat16), K)
    for got, ref, name in zip(outs, refs, ["mx", "mn", "s1", "s2"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2, err_msg=name)


def test_gradient_matches_gather(data):
    x, u = data
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    cots = (jax.random.normal(k1, (B, N, C)), jax.random.normal(k2, (B, N, C)),
            jax.random.normal(k3, (B, N, C)), jax.random.normal(k4, (B, N, C)))

    def loss_kernel(u_):
        outs = edge_knn_reduce(x, u_, K, interpret=True)
        return sum(jnp.vdot(o, c) for o, c in zip(outs, cots))

    def loss_ref(u_):
        outs = _ref_reduce(x.astype(jnp.bfloat16), u_, K)
        return sum(jnp.vdot(o, c) for o, c in zip(outs, cots))

    du_k = jax.grad(loss_kernel)(u)
    du_r = jax.grad(loss_ref)(u)
    rel = float(jnp.linalg.norm(du_k - du_r) / jnp.linalg.norm(du_r))
    assert rel < 2e-2, rel
    # the kNN selection is integer-valued: x gets zero gradient by design
    def loss_x(x_):
        outs = edge_knn_reduce(x_, u, K, interpret=True)
        return sum(jnp.vdot(o, c) for o, c in zip(outs, cots))

    dx = jax.grad(loss_x)(x)
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_train_stage_matches_gather_path(data):
    x, _ = data
    key = jax.random.PRNGKey(3)
    from flowcompare_tpu.core.initializers import torch_linear
    params = {"conv": torch_linear(key, 2 * CQ, C, bias=False)}
    bn_params, bn_state = init_batchnorm(C)
    params["bn"] = bn_params
    # make some BN slopes negative to exercise the min path
    params["bn"]["scale"] = params["bn"]["scale"].at[::3].set(-1.0)

    h = x.astype(jnp.bfloat16)
    got, new_state = _fused_edge_stage_train(params, bn_state, h, K,
                                             interpret=True)

    e = edge_features(h, K)
    y, ref_state = _conv_bn_leaky(params, bn_state, e, training=True)
    ref = jnp.max(y, axis=2)

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)
    for kk in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(new_state[kk]),
                                   np.asarray(ref_state[kk]),
                                   rtol=2e-2, atol=2e-2, err_msg=kk)


def test_train_stage_gradients_match(data):
    x, _ = data
    key = jax.random.PRNGKey(5)
    from flowcompare_tpu.core.initializers import torch_linear
    params = {"conv": torch_linear(key, 2 * CQ, C, bias=False)}
    bn_params, bn_state = init_batchnorm(C)
    params["bn"] = bn_params
    h = x.astype(jnp.bfloat16)
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, N, C))

    def loss_fused(p, h_):
        out, _ = _fused_edge_stage_train(p, bn_state, h_, K, interpret=True)
        return jnp.vdot(out.astype(jnp.float32), cot)

    def loss_ref(p, h_):
        e = edge_features(h_, K)
        y, _ = _conv_bn_leaky(p, bn_state, e, training=True)
        return jnp.vdot(jnp.max(y, axis=2).astype(jnp.float32), cot)

    gp_f, gh_f = jax.grad(loss_fused, argnums=(0, 1))(params, h)
    gp_r, gh_r = jax.grad(loss_ref, argnums=(0, 1))(params, h)

    for leaf_f, leaf_r, path in (
            (gp_f["conv"]["w"], gp_r["conv"]["w"], "conv.w"),
            (gp_f["bn"]["scale"], gp_r["bn"]["scale"], "bn.scale"),
            (gp_f["bn"]["bias"], gp_r["bn"]["bias"], "bn.bias"),
            (gh_f, gh_r, "h")):
        a = np.asarray(leaf_f, np.float32)
        b = np.asarray(leaf_r, np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        # max-tie subgradients differ by convention: bf16 rounding makes
        # neighbour ties common, jnp.max's VJP splits gradient evenly among
        # them while the kernel routes to the first occurrence (torch.max
        # convention) — both are valid subgradients, so the comparison
        # carries a few % of legitimate tie noise on top of bf16 rounding.
        assert rel < 8e-2, (path, rel)
