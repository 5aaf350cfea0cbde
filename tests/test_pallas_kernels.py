"""Pallas kernel correctness on CPU via interpret mode.

The same kernels run compiled on TPU (exercised by bench.py and the chip
smoke scripts); interpret mode checks the logic against the pure-XLA
reference paths.
"""

import os

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
    """All three eval encoder formulations agree, per-point AND global:
    gather (pure XLA reference) vs per-stage fused (_ONE_LAUNCH=False, via
    the interpret-forced edge_neighbor_max) vs the whole-encoder megakernel
    (_ONE_LAUNCH=True through apply_dgcnn, interpret via
    _FORCE_FUSED_EVAL_INTERPRET). Expected agreement is ~one bf16 ulp."""
    import functools

    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N, K = 2, 200, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 6))
    orig_enm, orig_ol = ep.edge_neighbor_max, dg._ONE_LAUNCH
    ep.edge_neighbor_max = functools.partial(orig_enm, interpret=True)
    dg._FORCE_FUSED_EVAL_INTERPRET = True
    try:
        for gp, seed in ((False, 0), (True, 2)):
            params, state = dg.init_dgcnn(
                jax.random.PRNGKey(seed), input_dim=6, emb_dim=16,
                out_mlp_dims=[32, 32], global_pool=gp)

            def run(fused):
                out, _ = dg.apply_dgcnn(params, state, x, n_neighbors=K,
                                        training=False, dtype=jnp.bfloat16,
                                        fused=fused, global_pool=gp)
                return np.asarray(out, np.float32)

            gather = run(False)
            dg._ONE_LAUNCH = False
            per_stage = run(True)
            dg._ONE_LAUNCH = True
            one_launch = run(True)
            np.testing.assert_allclose(per_stage, gather, atol=2e-3)
            np.testing.assert_allclose(one_launch, per_stage, atol=2e-3)
    finally:
        ep.edge_neighbor_max = orig_enm
        dg._ONE_LAUNCH = orig_ol
        dg._FORCE_FUSED_EVAL_INTERPRET = False


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


def test_edge_neighbor_max_transposed_extract_matches():
    """_TRANSPOSED_EXTRACT is the same gather/max arithmetic with the
    select+extract chain built transposed — output must equal the
    production (row-major) kernel exactly (same products, same f32
    accumulations, same tie semantics)."""
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N, K, Cq, Cout = 2, 200, 12, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, Cq), jnp.bfloat16)
    u = jax.random.normal(jax.random.PRNGKey(1), (B, N, Cout), jnp.bfloat16)
    orig = ep._TRANSPOSED_EXTRACT
    try:
        ep._TRANSPOSED_EXTRACT = False        # flag is trace-time
        ep.edge_neighbor_max.clear_cache()
        ref = edge_neighbor_max(x, u, K, interpret=True)
        ep._TRANSPOSED_EXTRACT = True
        ep.edge_neighbor_max.clear_cache()
        mx = ep.edge_neighbor_max(x, u, K, interpret=True)
    finally:
        ep._TRANSPOSED_EXTRACT = orig
        ep.edge_neighbor_max.clear_cache()
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(ref))


def test_edge_neighbor_max_transposed_extract_duplicates():
    """Tie-breaking parity of the transposed select: duplicated points force
    distance ties; the admitted set must match the row-major kernel (both
    follow lax.top_k index-order semantics)."""
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N, K, Cq, Cout = 1, 96, 8, 8, 16
    base = jax.random.normal(jax.random.PRNGKey(2), (B, N // 2, Cq),
                             jnp.bfloat16)
    x = jnp.concatenate([base, base], axis=1)        # every point duplicated
    u = jax.random.normal(jax.random.PRNGKey(3), (B, N, Cout), jnp.bfloat16)
    orig = ep._TRANSPOSED_EXTRACT
    try:
        ep._TRANSPOSED_EXTRACT = False        # flag is trace-time
        ep.edge_neighbor_max.clear_cache()
        ref = edge_neighbor_max(x, u, K, interpret=True)
        ep._TRANSPOSED_EXTRACT = True
        ep.edge_neighbor_max.clear_cache()
        mx = ep.edge_neighbor_max(x, u, K, interpret=True)
    finally:
        ep._TRANSPOSED_EXTRACT = orig
        ep.edge_neighbor_max.clear_cache()
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(ref))


def test_fused_dgcnn_one_launch_extract_x_matches():
    """_EXTRACT_X (low-rank extraction: gather the neighbours' input rows,
    apply W_diff after) must be bit-identical to direct extract-u within the
    transposed one-launch encoder: the one-hot gather returns exact bf16
    rows, the deferred conv contracts the same bf16 pairs over the same cin
    order, and bf16 rounding is monotone (round∘max == max∘round)."""
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N, K = 2, 200, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 6))
    orig_t, orig_x = ep._TRANSPOSED_EXTRACT, ep._EXTRACT_X
    dg._FORCE_FUSED_EVAL_INTERPRET = True
    try:
        ep._TRANSPOSED_EXTRACT = True
        for gp, seed in ((False, 0), (True, 2)):
            params, state = dg.init_dgcnn(
                jax.random.PRNGKey(seed), input_dim=6, emb_dim=16,
                out_mlp_dims=[32, 32], global_pool=gp)

            def run():
                out, _ = dg.apply_dgcnn(params, state, x, n_neighbors=K,
                                        training=False, dtype=jnp.bfloat16,
                                        fused=True, global_pool=gp)
                return np.asarray(out, np.float32)

            ep._EXTRACT_X = False
            base = run()
            ep._EXTRACT_X = True
            lowrank = run()
            np.testing.assert_array_equal(lowrank, base)
    finally:
        ep._TRANSPOSED_EXTRACT = orig_t
        ep._EXTRACT_X = orig_x
        dg._FORCE_FUSED_EVAL_INTERPRET = False


def test_fused_dgcnn_one_launch_pipelined_matches():
    """_PIPELINED_EXTRACT (block rb-1's extraction fused into block rb's
    binary-search loop) must be bit-identical to the sequential form: the
    same per-slot one-hot dots run in the same contraction order, and the
    bf16 running max equals f32-max-then-round by monotonicity. N=520 gives
    3 row-blocks (2 fused + 1 unfused tail); k=33 > 31 exercises the
    multi-slot-per-iteration path with a masked dead slot."""
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N = 2, 520
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 6))
    orig = ep._PIPELINED_EXTRACT
    dg._FORCE_FUSED_EVAL_INTERPRET = True
    try:
        for gp, kk, seed in ((False, 12, 0), (True, 33, 2)):
            params, state = dg.init_dgcnn(
                jax.random.PRNGKey(seed), input_dim=6, emb_dim=16,
                out_mlp_dims=[32, 32], global_pool=gp)

            def run():
                out, _ = dg.apply_dgcnn(params, state, x, n_neighbors=kk,
                                        training=False, dtype=jnp.bfloat16,
                                        fused=True, global_pool=gp)
                return np.asarray(out, np.float32)

            ep._PIPELINED_EXTRACT = False
            base = run()
            ep._PIPELINED_EXTRACT = True
            pipelined = run()
            np.testing.assert_array_equal(pipelined, base)
    finally:
        ep._PIPELINED_EXTRACT = orig
        dg._FORCE_FUSED_EVAL_INTERPRET = False


def test_fused_dgcnn_one_launch_transposed_matches():
    """The one-launch encoder megakernel with _TRANSPOSED_EXTRACT must be
    bit-identical to its row-major form (same gather arithmetic; only the
    extraction layout changes), per-point and global-pool."""
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    B, N, K = 2, 200, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 6))
    orig = ep._TRANSPOSED_EXTRACT
    dg._FORCE_FUSED_EVAL_INTERPRET = True
    try:
        for gp, seed in ((False, 0), (True, 2)):
            params, state = dg.init_dgcnn(
                jax.random.PRNGKey(seed), input_dim=6, emb_dim=16,
                out_mlp_dims=[32, 32], global_pool=gp)

            def run():
                out, _ = dg.apply_dgcnn(params, state, x, n_neighbors=K,
                                        training=False, dtype=jnp.bfloat16,
                                        fused=True, global_pool=gp)
                return np.asarray(out, np.float32)

            ep._TRANSPOSED_EXTRACT = False
            base = run()
            ep._TRANSPOSED_EXTRACT = True
            transposed = run()
            np.testing.assert_array_equal(transposed, base)
    finally:
        ep._TRANSPOSED_EXTRACT = orig
        dg._FORCE_FUSED_EVAL_INTERPRET = False


def test_fused_dgcnn_exact_row_block_multiple():
    """N an exact _ROW_BLOCK multiple (npad == n): the pad-row restore must
    be skipped, not emit a zero-size dynamic-slice store (regression: traced
    'Out of bound slice' crash for any N divisible by 256)."""
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    N = ep._ROW_BLOCK            # npad == n exactly
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N, 6))
    params, state = dg.init_dgcnn(jax.random.PRNGKey(0), input_dim=6,
                                  emb_dim=16, out_mlp_dims=[32, 32])
    dg._FORCE_FUSED_EVAL_INTERPRET = True
    try:
        def run(fused):
            out, _ = dg.apply_dgcnn(params, state, x, n_neighbors=12,
                                    training=False, dtype=jnp.bfloat16,
                                    fused=fused)
            return np.asarray(out, np.float32)

        np.testing.assert_allclose(run(True), run(False), atol=2e-3)
    finally:
        dg._FORCE_FUSED_EVAL_INTERPRET = False


def test_fused_dgcnn_rejects_k_ge_n():
    """k >= n must fail loudly (pad rows would silently enter every top-k),
    matching the per-stage kernel's guard."""
    import pytest

    from flowcompare_tpu.ops import dgcnn_pallas as dp

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 30, 6))
    with pytest.raises(AssertionError, match="k < n"):
        dp._run(x, None, 40, True, True)


def test_fused_flow_kernel_under_shard_map_interpret_parity():
    """EXECUTION-level multi-device fused-kernel validation (VERDICT r3
    item 4): the actual flow megakernel body (interpret mode, one-layer
    grid — the scope where interpret is exact) runs under
    model._batchwise's shard_map on the 8-device CPU mesh, and every
    per-item output must match the direct (unsharded) kernel call
    bit-for-bit. A mis-sharded operand (e.g. a folded weight stack sharded
    over batch, or the batch axis replicated) cannot produce per-item
    parity, so this fails loudly on any wrapper regression."""
    import functools
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_flow_layer_kernel import _one_layer_fixture

    from flowcompare_tpu.ops import flow_layer_pallas as flp
    from flowcompare_tpu.train import make_mesh

    cfg, model, params, f1, s1, _, _, _ = _one_layer_fixture()
    assert jax.device_count() >= 8, "conftest provides 8 CPU devices"
    mesh = make_mesh(n_data=8, n_model=1)

    B, N = 8, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(ks[0], (B, N, cfg["latent_dim"]), jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg["n_samples_context"],
                                    f1["wkv"].shape[1]), jnp.float32)
    extra = jax.random.normal(ks[2], (B, N, 1), jnp.float32)
    ldj0 = jnp.zeros((B, N), jnp.float32)

    kernel = functools.partial(flp.fused_flow_layers, interpret=True)
    # direct single-device call = per-item ground truth
    z_ref, l_ref = kernel(x, ldj0, ctx, extra, f1)

    sharded = model.with_options(fused_layers=True, fused_mesh=mesh)
    z_sm, l_sm = sharded._batchwise(kernel, (x, ldj0, ctx, extra), (f1,))
    np.testing.assert_array_equal(np.asarray(z_sm), np.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(l_sm), np.asarray(l_ref))

    # inverse (sampling) megakernel through the same wrapper
    inv1 = flp.fold_stacks_inverse(s1, f1)
    inv_kernel = functools.partial(flp.fused_flow_layers_inverse,
                                   interpret=True)
    xr_ref = inv_kernel(z_ref, ctx, extra, inv1)
    xr_sm = sharded._batchwise(inv_kernel, (z_ref, ctx, extra), (inv1,))
    np.testing.assert_array_equal(np.asarray(xr_sm), np.asarray(xr_ref))

    # wrong-divisibility loud failure (B=8 with a 3-item slice would be
    # silent corruption if the check regressed)
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        sharded._batchwise(kernel, (x[:6], ldj0[:6], ctx[:6], extra[:6]),
                           (f1,))
