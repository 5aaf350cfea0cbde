"""Scatter-free gather backward (ops/knn.gather_neighbors_mm) and its use
in the PAConv training path.

The matmul backward must be numerically interchangeable with autodiff's
scatter-add backward (CPU is ground truth); on the hosted TPU backend the
scatter-free form is the one with trustworthy chained gradients (see
CLAUDE.md — chip validation itself is a chip-tool concern, these tests pin
the semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.encoders import paconv
from flowcompare_tpu.ops import knn


def test_gather_mm_grad_matches_scatter_with_duplicates():
    kx, ki, kc = jax.random.split(jax.random.PRNGKey(0), 3)
    B, N, M, K, C = 2, 37, 19, 8, 5
    u = jax.random.normal(kx, (B, N, C))
    # duplicates on purpose — ball_query pads with the first hit repeated
    idx = jax.random.randint(ki, (B, M, K), 0, N)
    cot = jax.random.normal(kc, (B, M, K, C))

    g_mm = jax.grad(lambda f: jnp.vdot(knn.gather_neighbors_mm(f, idx), cot))(u)
    g_sc = jax.grad(lambda f: jnp.vdot(knn.gather_neighbors(f, idx), cot))(u)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_sc),
                               rtol=1e-5, atol=1e-5)


def test_gather_mm_forward_identical():
    kx, ki = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.normal(kx, (2, 20, 4))
    idx = jax.random.randint(ki, (2, 10, 3), 0, 20)
    np.testing.assert_array_equal(
        np.asarray(knn.gather_neighbors_mm(u, idx)),
        np.asarray(knn.gather_neighbors(u, idx)))


def test_three_nn_mm_backward_matches():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    unknown = jax.random.normal(k1, (2, 24, 3))
    known = jax.random.normal(k2, (2, 9, 3))
    feats = jax.random.normal(k3, (2, 9, 6))

    def loss(f, mm):
        return jnp.sum(knn.three_nn_interpolate(unknown, known, f,
                                                mm_backward=mm) ** 2)

    g_mm = jax.grad(loss)(feats, True)
    g_sc = jax.grad(loss)(feats, False)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_sc),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_paconv_training_grads_scatter_free_path_matches(monkeypatch):
    """Full PAConv encoder training step: the scatter-free path (what
    training=True now uses) must reproduce the scatter-backward gradients
    on CPU."""
    key = jax.random.PRNGKey(3)
    params, state = paconv.init_pointnet2_paconv(key, c=3, k=16)
    pc = jax.random.normal(jax.random.fold_in(key, 1), (2, 256, 6))

    def loss(p):
        out, _ = paconv.apply_pointnet2_paconv(p, state, pc, training=True)
        return jnp.sum(out * out)

    g_mm = jax.grad(loss)(params)

    # force the scatter backward on the SAME graph
    monkeypatch.setattr(paconv, "gather_neighbors_mm", knn.gather_neighbors)
    monkeypatch.setattr(knn, "gather_neighbors_mm", knn.gather_neighbors)
    g_sc = jax.grad(loss)(params)

    # norm-relative: the two backwards sum identical f32 terms in different
    # orders (matmul tree reduction vs scatter sequence); elementwise atol
    # trips on reorder noise of tiny elements. Measured agreement 1e-6.
    for a, b in zip(jax.tree_util.tree_leaves(g_mm),
                    jax.tree_util.tree_leaves(g_sc)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel < 1e-4, rel
