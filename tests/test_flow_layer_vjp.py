"""Tests for the differentiable flow-layer megakernel
(ops/flow_layer_vjp_pallas). The Pallas kernels themselves are TPU-only
(carry aliasing breaks in interpret mode) — their gradient parity vs the
scan path runs when a chip is attached (see also
tools/test_vjp_kernel_chip.py and save/bench/vjp_parity.json for the
recorded chip numbers). CPU covers the pure plumbing: flatten/unflatten
structure, segment picking, and that the custom-vjp primal (eval path)
is what log_prob uses.
"""

import jax
import jax.numpy as jnp
import pytest

import flowcompare_tpu as fc
from flowcompare_tpu.core.mlp import gelu
from flowcompare_tpu.ops import flow_layer_pallas as flp
from flowcompare_tpu.ops import flow_layer_vjp_pallas as fvp


def test_pick_segment_divides():
    for L, expect in [(116, 4), (8, 4), (6, 3), (7, 1), (12, 4), (9, 3)]:
        k = fvp._pick_segment(L)
        assert L % k == 0 and k == expect


def _toy_folded(has_attn=True, L=4):
    key = jax.random.PRNGKey(0)
    cfg = fc.get_config("dulcet-universe" if has_attn else "helpful-sponge")
    cfg["n_flow_layers"] = L - 1  # +1 appended final block
    model = fc.FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(key)
    layers = model._prepare_layers(params["layers"])
    stacks = flp.build_layer_stacks(model, layers)
    stacks = flp.append_final_block(stacks, params["final_block"],
                                    cfg["latent_dim"])
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2,
                             extra_dim=1 if has_attn else 0)
    return folded


@pytest.mark.slow
def test_flatten_unflatten_structure_roundtrip():
    folded = _toy_folded(has_attn=True)
    arrs = {k: v for k, v in folded.items() if k != "n_cpl"}
    n_cpl = folded["n_cpl"]
    flat = fvp._flatten_folded(arrs, n_cpl, True)
    # pretend-grads: reuse the arrays; unflatten must reproduce the exact
    # pytree structure (custom_vjp requires cotangent treedef == primal)
    grads = fvp._unflatten_grads(flat, arrs, n_cpl, True)
    assert (jax.tree_util.tree_structure(grads)
            == jax.tree_util.tree_structure(arrs))
    for (a, g) in zip(jax.tree_util.tree_leaves(arrs),
                      jax.tree_util.tree_leaves(grads)):
        assert a.shape == g.shape


@pytest.mark.slow
def test_trainable_primal_matches_scan_core_cpu():
    """The custom-vjp PRIMAL routes through the eval megakernel, which is
    TPU-only; on CPU this test instead checks the layer math used by the
    backward (f32 version of _layer_fwd_math composed over layers) against
    folded_scan_core — the backward recomputes forward with exactly this
    function, so agreement here pins the recompute semantics."""
    folded = _toy_folded(has_attn=True)
    n_cpl = folded["n_cpl"]
    B, N, LAT, NC, E = 2, 256, 300, 320, 64
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (B, N, LAT))
    ldj = jnp.zeros((B, N))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, NC, E)) * 0.5
    extra = jax.random.normal(jax.random.fold_in(k, 2), (B, N, 1))

    z_ref, ldj_ref = flp.folded_scan_core(
        x, ldj, ctx, extra, folded, nonlin=gelu, dtype=jnp.bfloat16,
        remat=False)

    L = folded["lu_ldj_f"].shape[0]
    arrs = {kk: v for kk, v in folded.items() if kk != "n_cpl"}
    flat = fvp._flatten_folded(arrs, n_cpl, True)

    def one_item(xb, ctxb, extrab):
        h = xb
        acc = jnp.zeros((N, 1))
        for layer in range(L):
            wk = {
                "cpl_in_xe": flat["cpl_in_xe"][layer],
                "cpl_in_c": flat["cpl_in_c"][layer],
                "cpl_in_b": flat["cpl_in_b"][layer],
                "cpl_rest": [(flat["cpl_w%d" % i][layer],
                              flat["cpl_b%d" % i][layer])
                             for i in range(n_cpl - 1)],
                "lu_w_f": flat["lu_w_f"][layer],
                "lu_b": flat["lu_b"][layer],
                "pre": [(flat["pre_w%d" % i][layer],
                         flat["pre_b%d" % i][layer]) for i in range(4)],
                "wq_f": flat["wq_f"][layer], "bq_f": flat["bq_f"][layer],
                "wkv": flat["wkv"][layer],
            }
            h, dl = fvp._layer_fwd_math(
                wk, h, ctxb, extrab, n_pre=4, n_cpl=n_cpl, has_attn=True,
                has_extra=True, split=LAT // 2, eps_affine=1e-8)
            acc = acc + dl + flat["lu_ldj_f"][layer]  # (1,1) broadcasts
        return h, acc[:, 0]

    z, l = jax.vmap(one_item)(x, ctx, extra)
    assert jnp.allclose(z, z_ref, atol=2e-2, rtol=2e-2), float(
        jnp.max(jnp.abs(z - z_ref)))
    assert jnp.allclose(l, ldj_ref, atol=0.05, rtol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas megakernel compiles on TPU only")
def test_trainable_grads_match_scan_autodiff_tpu():
    folded = _toy_folded(has_attn=True, L=6)
    n_cpl = folded["n_cpl"]
    arrs = {kk: v for kk, v in folded.items() if kk != "n_cpl"}
    B, N, NC, E, LAT = 2, 1024, 1250, 64, 300
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (B, N, LAT))
    ldj = jnp.zeros((B, N))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, NC, E)) * 0.5
    extra = jax.random.normal(jax.random.fold_in(k, 2), (B, N, 1))

    def loss_fused(x, ctx, extra, arrs):
        z, l = fvp.fused_flow_layers_trainable(
            x, ldj, ctx, extra, {**arrs, "n_cpl": n_cpl})
        return jnp.sum(z * z) * 1e-3 + jnp.sum(l) * 1e-3

    def loss_scan(x, ctx, extra, arrs):
        z, l = flp.folded_scan_core(
            x, ldj, ctx, extra, {**arrs, "n_cpl": n_cpl}, nonlin=gelu,
            dtype=jnp.bfloat16, remat=False)
        return jnp.sum(z * z) * 1e-3 + jnp.sum(l) * 1e-3

    gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3)))
    gs = jax.jit(jax.value_and_grad(loss_scan, argnums=(0, 1, 2, 3)))
    vf, grads_f = gf(x, ctx, extra, arrs)
    vs, grads_s = gs(x, ctx, extra, arrs)

    def rel(a, b):
        return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12))

    assert abs(float(vf - vs)) / abs(float(vs)) < 1e-3
    for lf, ls in zip(jax.tree_util.tree_leaves(grads_f),
                      jax.tree_util.tree_leaves(grads_s)):
        assert rel(lf, ls) < 0.02


@pytest.mark.slow
def test_identity_padding_layers_are_identity():
    """The trainable path pads stacks to a _K_SEG multiple (K=1
    segmentation faults the TPU runtime); each pad layer must pass
    (x, ldj) through unchanged up to one bf16 rounding of the carry."""
    folded = _toy_folded(has_attn=True, L=5)  # 5 -> pad 3
    n_cpl = folded["n_cpl"]
    arrs = {kk: v for kk, v in folded.items() if kk != "n_cpl"}
    L = arrs["lu_ldj_f"].shape[0]
    lat = arrs["lu_w_f"].shape[-1]
    padded = fvp._pad_identity_layers(arrs, 3, lat)
    for kk, v in padded.items():
        if v is None:
            continue
        leaves = [w for pair in v for w in pair] if isinstance(v, list) else [v]
        orig = arrs[kk]
        oleaves = ([w for pair in orig for w in pair]
                   if isinstance(orig, list) else [orig])
        for p, o in zip(leaves, oleaves):
            assert p.shape[0] == L + 3 and p.shape[1:] == o.shape[1:], kk

    flat = fvp._flatten_folded(padded, n_cpl, True)
    N = 64
    k = jax.random.PRNGKey(4)
    x = jax.random.normal(k, (N, 300))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (96, 64)) * 0.5
    extra = jax.random.normal(jax.random.fold_in(k, 2), (N, 1))
    n_pre = len(padded["pre"])
    for layer in range(L, L + 3):
        wk = {
            "cpl_in_xe": flat["cpl_in_xe"][layer],
            "cpl_in_c": flat["cpl_in_c"][layer],
            "cpl_in_b": flat["cpl_in_b"][layer],
            "cpl_rest": [(flat["cpl_w%d" % i][layer],
                          flat["cpl_b%d" % i][layer])
                         for i in range(n_cpl - 1)],
            "lu_w_f": flat["lu_w_f"][layer], "lu_b": flat["lu_b"][layer],
            "pre": [(flat["pre_w%d" % i][layer], flat["pre_b%d" % i][layer])
                    for i in range(n_pre)],
            "wq_f": flat["wq_f"][layer], "bq_f": flat["bq_f"][layer],
            "wkv": flat["wkv"][layer],
        }
        z, dl = fvp._layer_fwd_math(
            wk, x, ctx, extra, n_pre=n_pre, n_cpl=n_cpl, has_attn=True,
            has_extra=True, split=150, eps_affine=1e-8)
        assert jnp.allclose(z, x.astype(jnp.bfloat16).astype(jnp.float32),
                            atol=1e-6)
        assert jnp.allclose(dl, 0.0, atol=1e-6)
        assert float(flat["lu_ldj_f"][layer][0, 0]) == 0.0


def test_backward_kernel_single_grid_step_interpret():
    """Full backward-megakernel body on CPU: at (L=4=one segment, B=1, one
    query block) the grid has a SINGLE step, so no aliased block is ever
    revisited and interpret mode is exact. Dense saves are built from
    1-layer folded_scan slices (bf16, like the forward kernel's saves
    output); every gradient the kernel returns must match jax.vjp of the
    bf16 folded scan — the same contract the chip-side vjp-parity tool
    checks at full scale (save/bench/vjp_parity.json, ~0.5%)."""
    import numpy as np

    cfg = fc.get_config("dulcet-universe")
    cfg.update(dict(
        input_dim=4, latent_dim=8, cif_latent_dim=8, n_flow_layers=4,
        hidden_dims=[16, 16], net_augmenter_dist_hidden_dims=[16, 16],
        pre_attention_mlp_hidden_dims=[8, 8],
        hidden_dims_embedder_out=[16, 16], attn_dim=12, attn_input_dim=8,
        input_embedding_dim=4, cross_dim_head=8, input_embedder="idenity",
        sample_size=16, n_samples_context=24, n_neighbors=4))
    cfg = fc.configs.derive(cfg)
    model = fc.FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prep = model._prepare_layers(params["layers"])
    stacks = flp.append_final_block(
        flp.build_layer_stacks(model, prep), params["final_block"],
        cfg["latent_dim"])
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2,
                             extra_dim=1)
    L = folded["lu_ldj_f"].shape[0]
    assert L == 4 and fvp._pick_segment(L) == 4  # exactly one segment
    arrs = {k: v for k, v in folded.items() if k != "n_cpl"}
    n_cpl = folded["n_cpl"]

    B, N, LAT = 1, 16, cfg["latent_dim"]
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (B, N, LAT), jnp.float32)
    ctx = jax.random.normal(
        ks[1], (B, cfg["n_samples_context"], folded["wkv"].shape[1]),
        jnp.float32)
    extra = jax.random.normal(ks[2], (B, N, 1), jnp.float32)
    ldj0 = jnp.zeros((B, N), jnp.float32)
    dz = jax.random.normal(ks[3], (B, N, LAT), jnp.float32)
    dldj = jax.random.normal(ks[4], (B, N), jnp.float32)

    def slice_l(v, l):
        if v is None or isinstance(v, int):
            return v
        if isinstance(v, list):
            return [(w[l:l + 1], b[l:l + 1]) for w, b in v]
        return v[l:l + 1]

    carries = []
    h, acc = x, ldj0
    for l in range(L):
        carries.append(h)
        fl = {k: slice_l(v, l) for k, v in folded.items()}
        h, acc = flp.folded_scan_core(h, acc, ctx, extra, fl, nonlin=gelu,
                                      dtype=jnp.bfloat16, remat=False)
    saves = jnp.stack(carries, 0).astype(jnp.bfloat16)

    def f(x, ctx, extra, arrs):
        return flp.folded_scan_core(x, ldj0, ctx, extra,
                                    {**arrs, "n_cpl": n_cpl}, nonlin=gelu,
                                    dtype=jnp.bfloat16, remat=False)

    _, vjp = jax.vjp(f, x, ctx, extra, arrs)
    dx_ref, dctx_ref, dextra_ref, darrs_ref = vjp((dz, dldj))

    dx, dctx, dextra, dflat = fvp.flow_layers_bwd(
        saves, dz, dldj, ctx, extra, arrs, n_cpl, interpret=True)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)

    assert rel(dx, dx_ref) < 0.03
    assert rel(dctx, dctx_ref) < 0.03
    assert rel(dextra, dextra_ref) < 0.03
    flat_ref = fvp._flatten_folded(darrs_ref, n_cpl, True)
    for k, g in dflat.items():
        assert rel(g, flat_ref[k]) < 0.05, k

    # The Python-unrolled layer loop is a pure scheduling change: it must
    # reproduce the default kernel's gradients BIT-EXACTLY.
    base = (np.asarray(dx), np.asarray(dctx), np.asarray(dextra),
            {k: np.asarray(v) for k, v in dflat.items()})
    defaults = (fvp._UNROLL_BWD, fvp._BF16_RESIDUALS)
    try:
        fvp._UNROLL_BWD = True
        dx_v, dctx_v, dextra_v, dflat_v = fvp.flow_layers_bwd(
            saves, dz, dldj, ctx, extra, arrs, n_cpl, interpret=True)
        assert np.array_equal(np.asarray(dx_v), base[0])
        assert np.array_equal(np.asarray(dctx_v), base[1])
        assert np.array_equal(np.asarray(dextra_v), base[2])
        for k, g in dflat_v.items():
            assert np.array_equal(np.asarray(g), base[3][k]), k
        fvp._UNROLL_BWD = False

        # bf16 residuals change the transpose's arithmetic only by roundings
        # the forward itself applies before its bf16 matmuls — gradients
        # must still match the f32-residual autodiff reference within the
        # same tolerance band as the default kernel.
        fvp._BF16_RESIDUALS = True
        dx_v, dctx_v, dextra_v, dflat_v = fvp.flow_layers_bwd(
            saves, dz, dldj, ctx, extra, arrs, n_cpl, interpret=True)
        assert rel(dx_v, dx_ref) < 0.03
        assert rel(dctx_v, dctx_ref) < 0.03
        assert rel(dextra_v, dextra_ref) < 0.03
        for k, g in dflat_v.items():
            assert rel(g, flat_ref[k]) < 0.05, k
    finally:
        fvp._UNROLL_BWD, fvp._BF16_RESIDUALS = defaults
