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


def test_fused_dgcnn_encoder_matches_per_stage_path():
    """Whole-encoder megakernel (ops/dgcnn_pallas) vs the per-stage fused
    path, both in interpret mode, per-point and global-trunk modes. The
    expected agreement is one bf16 ulp — the same envelope as the
    per-stage path vs the gather formulation."""
    import functools

    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep
    from flowcompare_tpu.ops.dgcnn_pallas import fused_dgcnn_encoder

    B, N, K = 2, 200, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 6))
    orig_enm, orig_flag = ep.edge_neighbor_max, dg._ONE_LAUNCH
    ep.edge_neighbor_max = functools.partial(orig_enm, interpret=True)
    dg._ONE_LAUNCH = False
    try:
        params, state = dg.init_dgcnn(
            jax.random.PRNGKey(0), input_dim=6, emb_dim=16,
            out_mlp_dims=[32, 32], global_pool=False)
        ref, _ = dg.apply_dgcnn(params, state, x, n_neighbors=K,
                                training=False, dtype=jnp.bfloat16,
                                fused=True)
        p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
        got = fused_dgcnn_encoder(x.astype(jnp.bfloat16), p16, state, k=K,
                                  head=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-3)

        params_g, state_g = dg.init_dgcnn(
            jax.random.PRNGKey(2), input_dim=6, emb_dim=16,
            out_mlp_dims=[32, 32], global_pool=True)
        ref_g, _ = dg.apply_dgcnn(params_g, state_g, x, n_neighbors=K,
                                  training=False, dtype=jnp.bfloat16,
                                  fused=True, global_pool=True)
        pg16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                      params_g)
        trunk = fused_dgcnn_encoder(x.astype(jnp.bfloat16), pg16, state_g,
                                    k=K, head=False, interpret=True)
        from flowcompare_tpu.core.mlp import apply_mlp, gelu
        pooled = jnp.concatenate(
            [jnp.max(trunk, axis=1),
             jnp.mean(trunk.astype(jnp.float32), axis=1).astype(trunk.dtype)],
            axis=-1)
        got_g = apply_mlp(pg16["out_mlp"], pooled, gelu)
        np.testing.assert_allclose(np.asarray(got_g, np.float32),
                                   np.asarray(ref_g, np.float32), atol=2e-3)
    finally:
        ep.edge_neighbor_max = orig_enm
        dg._ONE_LAUNCH = orig_flag


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
