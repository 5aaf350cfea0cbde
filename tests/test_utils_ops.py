"""Utility + op coverage: voxelize, expm, hsv, MAD, EarlyStop, labelstat,
ball query."""

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.ops import (
    all_voxel_centers,
    ball_query,
    labelstat_ballrange,
    labelstat_idx,
    voxel_occupancy,
    voxelize,
)
from flowcompare_tpu.utils import (
    EarlyStop,
    expm,
    is_valid,
    mean_except_batch,
    rgb_to_hsv,
    sum_except_batch,
)


def test_voxelize_grid_semantics():
    pts = jnp.asarray([[0.1, 0.1, 0.1], [1.5, 0.2, 0.3], [0.2, 1.7, 3.5]])
    idx, centers = voxelize(pts, size=[1.0, 1.0, 2.0],
                            start=[0.0, 0.0, 0.0], end=[2.0, 2.0, 4.0],
                            return_centers=True)
    # grid steps: (3, 3, 3); axis-0 fastest
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 3 + 9])
    np.testing.assert_allclose(np.asarray(centers)[0], [0.5, 0.5, 1.0])
    occ = voxel_occupancy(idx, 27)
    assert int(occ.sum()) == 3 and int(occ[0]) == 1


def test_all_voxel_centers_count():
    c = all_voxel_centers([0, 0, 0], [2, 2, 4], [1.0, 1.0, 2.0])
    assert c.shape == (27, 3)


def test_all_voxel_centers_matches_voxelize_ordering():
    """centers[voxelize(p)] must be the containing cell's center — the two
    functions share one index layout (axis 0 fastest, utils.py:443)."""
    size = [1.0, 1.0, 2.0]
    lo, hi = [0.0, 0.0, 0.0], [2.0, 2.0, 4.0]
    pts = jnp.asarray([[1.5, 0.1, 0.1], [0.1, 1.6, 3.9], [2.4, 2.4, 5.9]])
    idx, own_centers = voxelize(pts, size=size, start=lo, end=hi,
                                return_centers=True)
    table = all_voxel_centers(lo, hi, size)
    np.testing.assert_allclose(np.asarray(table)[np.asarray(idx)],
                               np.asarray(own_centers), atol=1e-6)


def test_knn_self_idx_pins_slot0():
    """knn_indices(self_idx=...) pins neighbour 0 to the known self index
    (knnquery_heap contract) even when rounding noise makes another point
    rank closer — simulated by perturbing the queries off their points."""
    from flowcompare_tpu.ops.knn import knn_indices

    key = jax.random.PRNGKey(3)
    pts = jax.random.normal(key, (2, 32, 3))
    # queries = the points, nudged so some OTHER point can be nearer
    noise = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 3))
    query = pts + noise
    self_idx = jnp.broadcast_to(jnp.arange(32), (2, 32))
    idx = knn_indices(query, pts, 4, self_idx=self_idx)
    np.testing.assert_array_equal(np.asarray(idx[..., 0]),
                                  np.asarray(self_idx))
    # unpinned, at least one slot 0 differs (the perturbation is large
    # enough that some query's nearest point is not itself)
    free = knn_indices(query, pts, 4)
    assert (np.asarray(free[..., 0]) != np.asarray(self_idx)).any()
    # ranks other than the pinned slot keep their relative order
    rest_pinned = np.asarray(idx[..., 1:])
    rest_free = np.asarray(free)
    for b in range(2):
        for m in range(32):
            expect = [j for j in rest_free[b, m] if j != self_idx[b, m]][:3]
            np.testing.assert_array_equal(rest_pinned[b, m], expect)


def test_expm_algos_agree():
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (4, 4))
    np.testing.assert_allclose(np.asarray(expm(x, 1e-8, "torch")),
                               np.asarray(expm(x, 1e-8, "original")),
                               atol=1e-5)


def test_rgb_to_hsv_known_values():
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]])
    hsv = np.asarray(rgb_to_hsv(rgb))
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(hsv[1, 0], 1 / 3, atol=1e-5)
    np.testing.assert_allclose(hsv[2], [0.0, 0.0, 0.5], atol=1e-3)


def test_early_stop_and_validity():
    es = EarlyStop(patience=2)
    assert not any(es(1.0) for _ in range(2))
    assert [es(1.0) for _ in range(3)][-1]  # 3rd bad step > patience 2
    assert is_valid(jnp.ones(3))
    assert not is_valid(jnp.asarray([1.0, jnp.nan]))
    assert float(sum_except_batch(jnp.ones((2, 3, 4)), 1)[0]) == 12
    assert float(mean_except_batch(jnp.ones((2, 3, 4)), 2)[0, 0]) == 1


def test_labelstat_and_ballquery():
    xyz = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0], [5.0, 0, 0]]])
    labels = jnp.asarray([[[1.0, 0], [0, 1], [1, 0]]])
    hist = labelstat_ballrange(xyz, xyz[:, :1], labels, radius=1.0)
    np.testing.assert_allclose(np.asarray(hist)[0, 0], [1, 1])
    idx = ball_query(1.0, 2, xyz, xyz[:, :1])
    assert set(np.asarray(idx)[0, 0].tolist()) == {0, 1}
    h2 = labelstat_idx(labels, idx)
    np.testing.assert_allclose(np.asarray(h2)[0, 0], [1, 1])
    # no point in ball for far query -> padded with index 0
    idx_far = ball_query(0.5, 2, xyz, jnp.asarray([[[10.0, 0, 0]]]))
    np.testing.assert_array_equal(np.asarray(idx_far)[0, 0], [0, 0])
