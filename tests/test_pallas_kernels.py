"""Pallas kernel correctness on CPU via interpret mode.

The same kernels run compiled on TPU (exercised by bench.py and the chip
smoke scripts); interpret mode checks the logic against the pure-XLA
reference paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.ops.edgeconv_pallas import edge_neighbor_max
from flowcompare_tpu.ops.knn import gather_neighbors, knn_self


def test_edge_neighbor_max_matches_gather_path():
    B, N, K, Cq, Cout = 2, 200, 12, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, Cq), jnp.bfloat16)
    u = jax.random.normal(jax.random.PRNGKey(1), (B, N, Cout), jnp.bfloat16)
    idx = knn_self(x, K)
    ref = jnp.max(gather_neighbors(u, idx), axis=2)
    mx = edge_neighbor_max(x, u, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(ref))


def test_edge_neighbor_max_with_duplicate_points():
    """Exact-tie handling: duplicated points produce distance ties; the
    selected SET may differ from top_k in tie order but max values match."""
    B, N, K, Cq, Cout = 1, 96, 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(2), (B, N // 2, Cq), jnp.bfloat16)
    x = jnp.concatenate([x, x], axis=1)  # every point duplicated
    u = jax.random.normal(jax.random.PRNGKey(3), (B, N // 2, Cout), jnp.bfloat16)
    u = jnp.concatenate([u, u], axis=1)
    idx = knn_self(x, K)
    ref = jnp.max(gather_neighbors(u, idx), axis=2)
    mx = edge_neighbor_max(x, u, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(ref))
