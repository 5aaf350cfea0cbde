"""Fused flow-layer megakernel: structural checks on CPU, numerical parity
on TPU only.

The kernel's layer-carry aliasing relies on the TPU's sequential grid
execution; interpret mode re-reads stale inputs, so CPU tests only cover
the stack assembly and the fallback gating. The numerical check against the
scan path (nats identical to 5 decimals, unbiased per-point lp diff) runs
whenever a TPU backend is attached — see also bench.py, which exercises the
kernel every round on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.configs import derive
from flowcompare_tpu.model import FlowCompareModel, inner_loop

from test_model import tiny_config, _batch


def _bf16_cfg(**over):
    cfg = tiny_config(**over)
    cfg["compute_dtype"] = "bfloat16"
    return derive(cfg)


def test_fused_gate_requires_tpu_and_shape():
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg, fused_layers=True)
    # conftest forces the CPU backend -> gate must refuse (and fall back)
    assert not model._can_fuse_layers()
    params, state = model.init_params(jax.random.PRNGKey(0))
    loss, _, _, _ = inner_loop(model, params, state, _batch(cfg),
                               rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_build_layer_stacks_shapes():
    from flowcompare_tpu.ops.flow_layer_pallas import build_layer_stacks
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prepared = model._prepare_layers(params["layers"])
    stacks = build_layer_stacks(model, prepared)
    L = cfg["n_flow_layers"] - 1
    lat = cfg["latent_dim"]
    assert stacks["lu_w"].shape == (L, lat, lat)
    assert stacks["lu_ldj"].shape == (L,)
    assert stacks["wq"].shape[0] == L
    assert stacks["pre"][0][0].shape[1] == lat // 2
    # coupling MLP input: x1 + extra + attn
    assert stacks["cpl"][0][0].shape[1] == lat // 2 + 1 + cfg["attn_dim"]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="megakernel parity needs compiled TPU execution")
def test_fused_layers_match_scan_on_tpu():
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(1)
    _, lp_scan, nats_s, _ = inner_loop(model, params, state, batch, rng=rng)
    fused = model.with_options(fused_layers=True)
    _, lp_fused, nats_f, _ = inner_loop(fused, params, state, batch, rng=rng)
    assert abs(float(nats_s) - float(nats_f)) < 5e-3


def _emulate_folded_kernel(x, ldj, ctx, extra, st, split, eps_affine=1e-8):
    """Faithful f32 emulation of ops/flow_layer_pallas._kernel on the
    FOLDED stacks — validates the fold_stacks algebra on CPU, where the
    Pallas kernel itself can't run (carry aliasing needs the TPU grid)."""
    from flowcompare_tpu.ops.flow_layer_pallas import _gelu

    def mlp_from(h, pairs, l, first_done=False, n_total=None):
        n = n_total if n_total is not None else len(pairs)
        off = 1 if first_done else 0
        if not first_done:
            h = _gelu(h @ pairs[0][0][l] + pairs[0][1][l])
        residual = h
        for k, idx in enumerate(range(1, n - 1)):
            w, b = pairs[k + 1 - off]
            if (idx - 1) % 2 == 0:
                residual = h
                h = _gelu(h @ w[l] + b[l])
            else:
                h = _gelu(residual + h @ w[l] + b[l])
        w, b = pairs[n - 1 - off]
        return h @ w[l] + b[l]

    L = st["lu_ldj_f"].shape[0]
    for l in range(L):
        x1, x2 = x[..., :split], x[..., split:]
        x1e = jnp.concatenate([x1, extra], -1) if extra is not None else x1
        q_in = mlp_from(x1, st["pre"], l)
        mean = q_in.mean(-1, keepdims=True)
        var = (q_in * q_in).mean(-1, keepdims=True) - mean * mean
        qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
        q = qn @ st["wq_f"][l] + st["bq_f"][l][0]
        kv = ctx @ st["wkv"][l]
        d = q.shape[-1]
        k, v = kv[..., :d], kv[..., d:]
        s = jnp.einsum("bnd,bmd->bnm", q, k)
        e = jnp.exp(s - s.max(-1, keepdims=True))
        a = jnp.einsum("bnm,bmd->bnd", e, v) / e.sum(-1, keepdims=True)
        acc = (x1e @ st["cpl_in_xe"][l] + a @ st["cpl_in_c"][l]
               + st["cpl_in_b"][l][0])
        stt = mlp_from(_gelu(acc), st["cpl_rest"], l, first_done=True,
                       n_total=st["n_cpl"])
        half = stt.shape[-1] // 2
        sc = (2.0 * jax.nn.sigmoid(stt[..., :half]) - 1.0) \
            * (1.0 - eps_affine) + 1.0
        y2 = x2 * sc + stt[..., half:]
        ldj = ldj + jnp.log(sc).sum(-1) + st["lu_ldj_f"][l]
        y = jnp.concatenate([x1, y2], -1)
        x = jnp.einsum("bnj,ij->bni", y, st["lu_w_f"][l]) + st["lu_b"][l][0]
    return x, ldj


def test_fold_stacks_algebra_matches_scan_core():
    """fold_stacks (LN->wq, out-proj->coupling-in, ActNorm->LU) must be
    EXACT algebra: the folded-kernel emulation in f32 reproduces the scan
    path's deterministic core to float tolerance."""
    from flowcompare_tpu.flows.distributions import standard_normal_logprob
    from flowcompare_tpu.ops.flow_layer_pallas import (
        append_final_block, build_layer_stacks, fold_stacks)

    cfg = tiny_config()  # f32 compute
    model = FlowCompareModel(cfg)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    B, N = 2, cfg["sample_size"]
    x = jax.random.normal(k1, (B, N, cfg["latent_dim"]))
    ctx = jax.random.normal(k2, (B, cfg["n_samples_context"],
                                 cfg["input_embedding_dim"]))
    extra = jax.random.normal(k3, (B, N, 1))

    prepared = model._prepare_layers(params["layers"])
    stacks = build_layer_stacks(model, prepared)
    stacks = append_final_block(stacks, params["final_block"],
                                cfg["latent_dim"])
    folded = fold_stacks(stacks, split=cfg["latent_dim"] // 2, extra_dim=1)

    fx, fldj = _emulate_folded_kernel(
        x, jnp.zeros((B, N)), ctx, extra, folded, cfg["latent_dim"] // 2)

    def body(carry, lp):
        h, acc = carry
        h, l = model._layer_fwd(lp, h, ctx, extra)
        return (h, acc + l), None

    (h, acc), _ = jax.lax.scan(body, (x, jnp.zeros((B, N))), prepared)
    h, l = model._block_fwd(params["final_block"], h, ctx, extra)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(h),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fldj), np.asarray(acc + l),
                               atol=2e-3, rtol=1e-4)


def test_folded_scan_core_matches_unfolded_logprob():
    """model.log_prob takes the folded_scan_core path by default (training +
    non-TPU eval); with folded_scan=False it runs the original unfolded
    scan. In f32 the two must agree to float tolerance — and so must their
    GRADIENTS (the folds are exact algebra, chain rule included)."""
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    assert model._can_fold_scan()
    unfolded = FlowCompareModel({**cfg, "folded_scan": False})
    assert not unfolded._can_fold_scan()
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(2)

    loss_f, lp_f, nats_f, _ = inner_loop(model, params, state, batch, rng=rng)
    loss_u, lp_u, nats_u, _ = inner_loop(unfolded, params, state, batch,
                                         rng=rng)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_u),
                               atol=5e-4, rtol=1e-5)

    def loss_fn(m):
        def f(p):
            l, _, _, _ = inner_loop(m, p, state, batch, rng=rng)
            return l
        return f

    from jax.flatten_util import ravel_pytree
    g_f = jax.grad(loss_fn(model))(params)
    g_u = jax.grad(loss_fn(unfolded))(params)
    flat_f, _ = ravel_pytree(g_f)
    flat_u, _ = ravel_pytree(g_u)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_u),
                               atol=5e-4, rtol=5e-3)
