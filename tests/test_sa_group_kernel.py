"""Fused SA-grouping kernel (ops/sa_group_pallas.py) vs the XLA reference
formulation — CPU interpret mode (one-grid-step-per-item kernel, no
aliased-block re-reads, so interpret is exact here)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.ops import knn as knn_mod
from flowcompare_tpu.ops.knn import gather_neighbors, knn_indices
from flowcompare_tpu.ops.sa_group_pallas import sa_group_fused


def _xla_reference(new_xyz, idx, xyz, feats, k):
    """_sa_level's grouping exactly (encoders/paconv.py:185-199), pinned
    to the deterministic top_k/take path — with slots 1..k-1 re-sorted to
    ascending index order, the fused kernel's documented slot convention
    (same membership + self slot 0; everything downstream of the grouping
    is slot-permutation-invariant past slot 0)."""
    knn_idx = knn_indices(new_xyz, xyz, k, self_idx=idx, impl="topk")
    knn_idx = jnp.concatenate(
        [knn_idx[..., :1], jnp.sort(knn_idx[..., 1:], axis=-1)], axis=-1)
    prev = knn_mod._GATHER_IMPL
    try:
        knn_mod._GATHER_IMPL = "take"
        grouped_xyz = gather_neighbors(xyz, knn_idx)
        grouped_feats = gather_neighbors(feats, knn_idx)
    finally:
        knn_mod._GATHER_IMPL = prev
    diff = (grouped_xyz - new_xyz[:, :, None, :]).astype(feats.dtype)
    return jnp.concatenate([diff, grouped_feats], axis=-1)


def _setup(b=2, n=200, m=48, c=5, dtype=jnp.bfloat16, seed=0):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    xyz = jax.random.normal(k0, (b, n, 3), jnp.float32)
    feats = jax.random.normal(k1, (b, n, c), jnp.float32).astype(dtype)
    # distinct center indices per item (FPS output is a permutation prefix)
    idx = jnp.stack([jax.random.permutation(jax.random.fold_in(k2, i), n)[:m]
                     for i in range(b)]).astype(jnp.int32)
    new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    return new_xyz, idx, xyz, feats


def test_sa_group_fused_matches_xla_bf16():
    new_xyz, idx, xyz, feats = _setup(dtype=jnp.bfloat16)
    k = 16
    ref = _xla_reference(new_xyz, idx, xyz, feats, k)
    out = sa_group_fused(new_xyz, idx, xyz, feats, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_sa_group_fused_matches_xla_f32():
    new_xyz, idx, xyz, feats = _setup(dtype=jnp.float32, seed=3)
    k = 16
    ref = _xla_reference(new_xyz, idx, xyz, feats, k)
    out = sa_group_fused(new_xyz, idx, xyz, feats, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sa_group_fused_slot0_is_center():
    """knnquery_heap contract: slot 0 = the center itself even under
    distance noise — _apply_paconv_layer's center slot depends on it."""
    new_xyz, idx, xyz, feats = _setup(dtype=jnp.bfloat16, seed=7)
    out = sa_group_fused(new_xyz, idx, xyz, feats, 8, interpret=True)
    # xyz diff of slot 0 must be exactly 0, feats must be the center's own
    np.testing.assert_array_equal(np.asarray(out[:, :, 0, :3]), 0.0)
    center_feats = jnp.take_along_axis(feats, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out[:, :, 0, 3:], np.float32),
                                  np.asarray(center_feats, np.float32))


def test_sa_group_fused_duplicate_points_tie_order():
    """Duplicated coordinates exercise index-ordered tie admission."""
    k0, k1 = jax.random.split(jax.random.PRNGKey(11))
    n, b, m, c = 160, 1, 16, 4
    base = jax.random.normal(k0, (b, n // 2, 3), jnp.float32)
    xyz = jnp.concatenate([base, base], axis=1)     # every point duplicated
    feats = jax.random.normal(k1, (b, n, c), jnp.float32).astype(jnp.bfloat16)
    idx = jnp.arange(m, dtype=jnp.int32)[None, :]
    new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
    ref = _xla_reference(new_xyz, idx, xyz, feats, 12)
    out = sa_group_fused(new_xyz, idx, xyz, feats, 12, interpret=True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_sa_group_fused_nondivisible_n_padding():
    """N not a multiple of 128 exercises the far-pad path; pads must never
    be selected."""
    new_xyz, idx, xyz, feats = _setup(n=130, m=16, seed=5)
    ref = _xla_reference(new_xyz, idx, xyz, feats, 8)
    out = sa_group_fused(new_xyz, idx, xyz, feats, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_paconv_encoder_fused_grouping_parity():
    """Whole PAConv encoder with the fused grouping kernel (forced via
    interpret) vs the XLA gather path: the SA level outputs must be
    bit-identical despite the kernel's different slot order (max
    aggregation + per-slot ops are slot-permutation-invariant)."""
    from flowcompare_tpu.encoders import paconv

    key = jax.random.PRNGKey(2)
    params, state = paconv.init_pointnet2_paconv(
        key, c=3, k=32, out_mlp_dims=(64, 64))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 6), jnp.float32)

    out_ref, _ = paconv.apply_pointnet2_paconv(params, state, x,
                                               training=False,
                                               dtype=jnp.bfloat16)
    prev = paconv._FORCE_FUSED_GROUPING_INTERPRET
    try:
        paconv._FORCE_FUSED_GROUPING_INTERPRET = True
        out_fused, _ = paconv.apply_pointnet2_paconv(params, state, x,
                                                     training=False,
                                                     dtype=jnp.bfloat16)
    finally:
        paconv._FORCE_FUSED_GROUPING_INTERPRET = prev
    np.testing.assert_array_equal(np.asarray(out_fused, np.float32),
                                  np.asarray(out_ref, np.float32))


def test_sa_group_fused_k_exceeds_n():
    """k > N pads trailing slots with point 0 (knnquery_heap untouched-slot
    contract, ops/knn.knn_indices tail)."""
    new_xyz, idx, xyz, feats = _setup(n=12, m=8, seed=9)
    ref = _xla_reference(new_xyz, idx, xyz, feats, 16)
    out = sa_group_fused(new_xyz, idx, xyz, feats, 16, interpret=True)
    # multiset comparison per (b, m): slot order of pads differs by design
    a = np.sort(np.asarray(out, np.float32).reshape(2, 8, 16, -1), axis=2)
    b = np.sort(np.asarray(ref, np.float32).reshape(2, 8, 16, -1), axis=2)
    np.testing.assert_array_equal(a, b)
    # slot 0 still the center
    np.testing.assert_array_equal(np.asarray(out[:, :, 0, :3]), 0.0)
