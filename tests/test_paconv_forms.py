"""The three paconv_assign_score formulations and the two knn top-k
lowerings must be algebraically interchangeable (they are trace-time
perf flags, not semantic knobs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.ops import knn as knn_mod
from flowcompare_tpu.ops import paconv_ops as pco


def _ref_assign_score(feat, bank, scores, m):
    """Direct numpy transcription of the contraction
    out[b,n,k,o] = sum_m s[b,n,k,m] * (f[b,n,k,:] @ W[:, m, o])."""
    b, n, k, c2 = feat.shape
    w = bank.reshape(c2, m, -1)
    cand = np.einsum("bnkc,cmo->bnkmo", feat, w)
    return np.einsum("bnkm,bnkmo->bnko", scores, cand)


@pytest.mark.parametrize("form", ["einsum", "concat", "per_m"])
def test_assign_score_forms_match_reference(form):
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    m, c2, o = 8, 12, 32
    feat = jax.random.normal(k1, (2, 5, 7, c2))
    bank = jax.random.normal(k2, (c2, m * o)) * 0.1
    scores = jax.nn.softmax(jax.random.normal(k3, (2, 5, 7, m)), axis=-1)
    ref = _ref_assign_score(np.asarray(feat), np.asarray(bank),
                            np.asarray(scores), m)
    prev = pco._FORM
    try:
        pco._FORM = form
        got = pco.paconv_assign_score(feat, bank, scores, m)
    finally:
        pco._FORM = prev
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_topk_impls_same_membership_and_self_first():
    key = jax.random.PRNGKey(7)
    pts = jax.random.normal(key, (3, 60, 3))
    q_idx = jnp.tile(jnp.arange(0, 60, 4)[None], (3, 1))
    q = jnp.take_along_axis(pts, q_idx[..., None], axis=1)
    prev = knn_mod._TOPK_IMPL
    try:
        knn_mod._TOPK_IMPL = "topk"
        a = knn_mod.knn_indices(q, pts, 8, self_idx=q_idx)
        knn_mod._TOPK_IMPL = "approx"
        b = knn_mod.knn_indices(q, pts, 8, self_idx=q_idx)
    finally:
        knn_mod._TOPK_IMPL = prev
    # slot 0 pinned to self by both
    np.testing.assert_array_equal(np.asarray(a[..., 0]), np.asarray(q_idx))
    np.testing.assert_array_equal(np.asarray(b[..., 0]), np.asarray(q_idx))
    # identical neighbour MEMBERSHIP (order may differ between lowerings)
    np.testing.assert_array_equal(np.sort(np.asarray(a), axis=-1),
                                  np.sort(np.asarray(b), axis=-1))


def test_paconv_bf16_eval_policy_close_to_f32():
    """The bf16 eval policy (features/matmuls bf16, geometry + BN stats
    f32) must track the f32 encoder within bf16 noise, with IDENTICAL
    FPS/kNN topology (geometry stays f32 by design)."""
    from flowcompare_tpu.encoders.paconv import (apply_pointnet2_paconv,
                                                 init_pointnet2_paconv)

    key = jax.random.PRNGKey(11)
    params, state = init_pointnet2_paconv(key, c=3, k=32,
                                          out_mlp_dims=(64, 64))
    pc = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 6))
    f32, _ = apply_pointnet2_paconv(params, state, pc, training=False)
    bf16, _ = apply_pointnet2_paconv(params, state, pc, training=False,
                                     dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    a = np.asarray(f32, np.float32)
    b = np.asarray(bf16, np.float32)
    denom = max(1e-6, float(np.max(np.abs(a))))
    assert float(np.max(np.abs(a - b))) / denom < 0.08


def test_gather_onehot_matches_take_for_bf16():
    """The one-hot MXU gather must be a BIT-EXACT row copy for BOTH bf16
    (1.0 * v exact) and f32 features (Precision.HIGHEST bf16x3 — each
    non-overlapping mantissa segment times 1.0 is exact and the f32 sum
    reconstructs v exactly; there is no f32 take_along_axis fallback)."""
    key = jax.random.PRNGKey(17)
    feats = jax.random.normal(key, (2, 40, 16)).astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 6, 4), 0, 40)
    prev = knn_mod._GATHER_IMPL
    try:
        knn_mod._GATHER_IMPL = "take"
        a = knn_mod.gather_neighbors(feats, idx)
        knn_mod._GATHER_IMPL = "onehot"
        b = knn_mod.gather_neighbors(feats, idx)
        c = knn_mod.gather_neighbors(feats.astype(jnp.float32), idx)
    finally:
        knn_mod._GATHER_IMPL = prev
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(c, np.float32))


def test_knn_self_pinned_to_topk(monkeypatch):
    """knn_self must NEVER route through approx_max_k (the fused DGCNN
    kernels' bit-exactness contract is against lax.top_k tie order) even
    when the module default is 'approx'."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 30, 3))
    monkeypatch.setattr(knn_mod, "_TOPK_IMPL", "approx")

    def _boom(*a, **k):
        raise AssertionError("knn_self routed through approx_max_k")
    monkeypatch.setattr(jax.lax, "approx_max_k", _boom)
    idx = knn_mod.knn_self(x, 5)
    assert idx.shape == (1, 30, 5)
