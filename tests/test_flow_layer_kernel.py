"""Fused flow-layer megakernel: structural checks on CPU, numerical parity
on TPU only.

The kernel's layer-carry aliasing relies on the TPU's sequential grid
execution; MULTI-layer interpret mode re-reads stale inputs, so CPU tests
cover the stack assembly, the fallback gating — and, since round 2, the
kernel BODIES themselves at one-layer scope (a single-layer grid never
re-reads an aliased block, so interpret mode is exact there; see
_one_layer_fixture). Full-depth numerical parity against the scan path
runs whenever a TPU backend is attached — see also bench.py, which
exercises the kernel every round on hardware.
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


def test_gelu_forms_agree_to_fit_error():
    """The three trace-time _GELU_FORM variants are the same function in
    real arithmetic (the form constants fold into the poly coefficients);
    each must sit within the deg-2 fit's own error bound of exact GELU and
    stay finite/limit-correct on extreme tails."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    x = jnp.asarray(
        np.concatenate([np.linspace(-30, 30, 20001),
                        [-1e30, 1e30, -12.0, 12.0, 0.0]]), jnp.float32)
    exact = x * jax.scipy.stats.norm.cdf(x)
    prod = flp._GELU_FORM
    try:
        for form in ("sigmoid", "exp2", "tanh"):
            flp._GELU_FORM = form
            y = flp._gelu(x)
            assert bool(jnp.isfinite(y).all()), form
            err = np.max(np.abs(np.asarray(y - exact)))
            assert err < 3e-5, (form, err)  # deg-2 fit bound 2.6e-5
    finally:
        flp._GELU_FORM = prod


def test_softmax_exp2_matches_exp_softmax():
    """exp2(s*log2e) normalized == exp(s) normalized (base invariance of
    softmax) — the algebra behind the _SOFTMAX_EXP2 kernel flag."""
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(64, 37)) * 5, jnp.float32)
    e = jnp.exp(jnp.minimum(s, 80.0))
    ref = e / jnp.sum(e, -1, keepdims=True)
    log2e = np.log2(np.e)
    e2 = jnp.exp2(jnp.minimum(s * log2e, 80.0 * log2e))
    got = e2 / jnp.sum(e2, -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-7)


def test_inverse_fold_round_trips_folded_scan():
    """fold_stacks_inverse algebra: a plain-jnp mirror of the sampling
    megakernel's per-layer body (inverse LU/ActNorm tail, shared
    conditioner, divided affine) must invert folded_scan_core to f32
    round-off at full tiny-model scale — validates every inverse fold
    before the kernel ever runs on hardware."""
    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prep = model._prepare_layers(params["layers"])
    stacks = flp.append_final_block(
        flp.build_layer_stacks(model, prep), params["final_block"],
        cfg["latent_dim"])
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2, extra_dim=1)
    inv = flp.fold_stacks_inverse(stacks, folded)

    B, N, LAT = 2, cfg["sample_size"], cfg["latent_dim"]
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x0 = jax.random.normal(ks[0], (B, N, LAT), jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg["n_samples_context"],
                                    folded["wkv"].shape[1]), jnp.float32)
    extra = jax.random.normal(ks[2], (B, N, 1), jnp.float32)

    z, _ = flp.folded_scan_core(
        x0, jnp.zeros((B, N)), ctx, extra, folded, nonlin=gelu, dtype=None,
        remat=False)

    # plain-jnp mirror of _kernel_inverse (f32), layers reversed
    split = LAT // 2
    n_layers = inv["lu_w_inv_f"].shape[0]
    h = z
    for l in reversed(range(n_layers)):
        y = (jnp.einsum("bnj,ij->bni", h, inv["lu_w_inv_f"][l])
             + inv["lu_shift"][l][0])
        x1, y2 = y[..., :split], y[..., split:]
        x1e = jnp.concatenate([x1, extra], -1)
        pre = [(w[l], b[l]) for w, b in inv["pre"]]
        q_in = gelu(x1e[..., :split] @ pre[0][0] + pre[0][1])
        residual = q_in
        for i, (w, b) in enumerate(pre[1:-1]):
            if i % 2 == 0:
                residual = q_in
                q_in = gelu(q_in @ w + b)
            else:
                q_in = gelu(residual + q_in @ w + b)
        q_in = q_in @ pre[-1][0] + pre[-1][1]
        mean = jnp.mean(q_in, -1, keepdims=True)
        var = jnp.mean(q_in * q_in, -1, keepdims=True) - mean * mean
        qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
        q = qn @ inv["wq_f"][l] + inv["bq_f"][l][0]
        kv = ctx @ inv["wkv"][l]
        d = q.shape[-1]
        k, v = kv[..., :d], kv[..., d:]
        s = jnp.einsum("bnd,bmd->bnm", q, k)
        e = jnp.exp(s - jnp.max(s, -1, keepdims=True))
        a = jnp.einsum("bnm,bmd->bnd", e, v) / jnp.sum(e, -1, keepdims=True)
        acc = (x1e @ inv["cpl_in_xe"][l] + a @ inv["cpl_in_c"][l]
               + inv["cpl_in_b"][l][0])
        hh = gelu(acc)
        residual = hh
        rest = [(w[l], b[l]) for w, b in inv["cpl_rest"]]
        for i, (w, b) in enumerate(rest[:-1]):
            if i % 2 == 0:
                residual = hh
                hh = gelu(hh @ w + b)
            else:
                hh = gelu(residual + hh @ w + b)
        st = hh @ rest[-1][0] + rest[-1][1]
        half = st.shape[-1] // 2
        sc = (2.0 * jax.nn.sigmoid(st[..., :half]) - 1.0) * (1.0 - 1e-8) + 1.0
        x2 = (y2 - st[..., half:]) / sc
        h = jnp.concatenate([x1, x2], -1)

    err = float(jnp.max(jnp.abs(h - x0)))
    assert err < 5e-3, err


def test_fold_augmenter_matches_xla_augmenter():
    """fold_augmenter algebra: a plain-jnp mirror of _augment_kernel (same
    eps draw as normal_sample) must match augment_attn_forward to f32
    round-off — validates the fused augmenter prologue's folds and its
    -log q epilogue before the kernel runs on hardware."""
    import math

    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.flows import augment
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    assert model.augmenter_kind == "conditional_attn"
    fa = flp.fold_augmenter(params["augmenter"], input_dim=cfg["input_dim"],
                            extra_dim=1)

    B, N = 2, cfg["sample_size"]
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(ks[0], (B, N, cfg["input_dim"]))
    ctx = jax.random.normal(ks[1], (B, cfg["n_samples_context"],
                                    fa["wkv"].shape[1]))
    extra = jax.random.normal(ks[2], (B, N, 1))
    rng = ks[3]

    z_ref, ldj_ref = augment.augment_attn_forward(
        params["augmenter"], rng, x, ctx, extra, nonlin=gelu, dtype=None)

    aug_dim = cfg["latent_dim"] - cfg["input_dim"]
    eps = jax.random.normal(rng, (B, N, aug_dim), jnp.float32)

    def res_mlp(h, pairs):
        h = gelu(h @ pairs[0][0] + pairs[0][1])
        residual = h
        for i, (w, b) in enumerate(pairs[1:-1]):
            if i % 2 == 0:
                residual = h
                h = gelu(h @ w + b)
            else:
                h = gelu(residual + h @ w + b)
        return h @ pairs[-1][0] + pairs[-1][1]

    q_in = res_mlp(x, [(w[0], b[0]) for w, b in fa["pre"]])
    mean = jnp.mean(q_in, -1, keepdims=True)
    var = jnp.mean(q_in * q_in, -1, keepdims=True) - mean * mean
    qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
    q = qn @ fa["wq_f"][0] + fa["bq_f"][0][0]
    kv = ctx @ fa["wkv"][0]
    d = q.shape[-1]
    k, v = kv[..., :d], kv[..., d:]
    s = jnp.einsum("bnd,bmd->bnm", q, k)
    e = jnp.exp(jnp.minimum(s, 80.0))
    a = jnp.einsum("bnm,bmd->bnd", e, v) / jnp.sum(e, -1, keepdims=True)
    x1e = jnp.concatenate([x, extra], -1)
    acc = (x1e @ fa["cpl_in_xe"][0] + a @ fa["cpl_in_c"][0]
           + fa["cpl_in_b"][0][0])
    hh = gelu(acc)
    residual = hh
    rest = [(w[0], b[0]) for w, b in fa["cpl_rest"]]
    for i, (w, b) in enumerate(rest[:-1]):
        if i % 2 == 0:
            residual = hh
            hh = gelu(hh @ w + b)
        else:
            hh = gelu(residual + hh @ w + b)
    st = hh @ rest[-1][0] + rest[-1][1]
    m2, ls = st[..., :aug_dim], st[..., aug_dim:]
    z = jnp.concatenate([x, m2 + eps * jnp.exp(ls)], -1)
    ldj = jnp.sum(0.5 * math.log(2 * math.pi) + ls + 0.5 * eps * eps, -1)

    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_ref),
                               atol=1e-4, rtol=1e-5)


def _one_layer_fixture():
    """A single REAL layer (index 0: non-identity LU/ActNorm) of a tiny
    attention model, in every format the kernels consume. One-layer grids
    never re-read an aliased carry block, so interpret mode is SAFE here
    (multi-layer interpret re-reads stale inputs — the known limitation)."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prep = model._prepare_layers(params["layers"])
    stacks = flp.append_final_block(
        flp.build_layer_stacks(model, prep), params["final_block"],
        cfg["latent_dim"])
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2,
                             extra_dim=1)

    def sl(v):
        if v is None or isinstance(v, int):
            return v
        if isinstance(v, list):
            return [(w[:1], b[:1]) for w, b in v]
        return v[:1]

    f1 = {k: sl(v) for k, v in folded.items()}
    s1 = {k: (v[:1] if hasattr(v, "shape") else
              ([(w[:1], b[:1]) for w, b in v] if isinstance(v, list) else v))
          for k, v in stacks.items()}

    B, N = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, N, cfg["latent_dim"]), jnp.float32)
    ctx = jax.random.normal(
        ks[1], (B, cfg["n_samples_context"], folded["wkv"].shape[1]),
        jnp.float32)
    extra = jax.random.normal(ks[2], (B, N, 1), jnp.float32)
    return cfg, model, params, f1, s1, x, ctx, extra


@pytest.mark.parametrize("form,sm2,cc", [
    ("sigmoid", False, False),   # production
    ("exp2", True, True),        # all candidate flags on
    ("tanh", False, True),
])
def test_forward_kernel_one_layer_interpret(form, sm2, cc):
    """Executes the actual megakernel body (interpret mode, 1 layer) under
    each trace-time variant and checks it against folded_scan_core at bf16
    tolerance — real kernel-code coverage without a chip."""
    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zs, ls = flp.folded_scan_core(x, ldj0, ctx, extra, f1, nonlin=gelu,
                                  dtype=jnp.bfloat16, remat=False)
    prod = (flp._GELU_FORM, flp._SOFTMAX_EXP2, flp._CPL_IN_CONCAT)
    try:
        flp._GELU_FORM, flp._SOFTMAX_EXP2, flp._CPL_IN_CONCAT = form, sm2, cc
        zk, lk = flp.fused_flow_layers(x, ldj0, ctx, extra, f1,
                                       interpret=True)
    finally:
        flp._GELU_FORM, flp._SOFTMAX_EXP2, flp._CPL_IN_CONCAT = prod
    assert float(jnp.max(jnp.abs(zk - zs))) < 3e-2
    assert float(jnp.max(jnp.abs(lk - ls))) < 2e-3


def test_inverse_kernel_one_layer_interpret_round_trip():
    """fused_flow_layers_inverse undoes fused_flow_layers on a real layer
    (interpret mode): kernel-code coverage for the sampling direction."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zf, _ = flp.fused_flow_layers(x, ldj0, ctx, extra, f1, interpret=True)
    inv1 = flp.fold_stacks_inverse(s1, f1)
    xr = flp.fused_flow_layers_inverse(zf, ctx, extra, inv1, interpret=True)
    assert float(jnp.max(jnp.abs(xr - x))) < 3e-2


def test_carry_bf16_one_layer_interpret():
    """_CARRY_BF16 rounds only the layer-boundary x carry: one-layer
    interpret output must match the f32-carry kernel to bf16 rounding of
    the OUTPUT (~0.4% relative), with ldj bit-identical (it stays f32 and
    is computed from the pre-store f32 state). Covers forward and inverse
    kernel plumbing (input dtype, aliasing, final f32 cast)."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zf, lf = flp.fused_flow_layers(x, ldj0, ctx, extra, f1, interpret=True)
    inv1 = flp.fold_stacks_inverse(s1, f1)
    xr_f = flp.fused_flow_layers_inverse(zf, ctx, extra, inv1,
                                         interpret=True)
    try:
        flp._CARRY_BF16 = True
        zb, lb = flp.fused_flow_layers(x, ldj0, ctx, extra, f1,
                                       interpret=True)
        xr_b = flp.fused_flow_layers_inverse(zf, ctx, extra, inv1,
                                             interpret=True)
    finally:
        flp._CARRY_BF16 = False
    assert zb.dtype == jnp.float32 and xr_b.dtype == jnp.float32
    # output rounding only: |z_bf16 - z_f32| <= ulp(z) at bf16
    err = jnp.max(jnp.abs(zb - zf) / (jnp.abs(zf) + 1e-3))
    assert float(err) < 8e-3, float(err)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lf),
                               atol=2e-3, rtol=1e-5)
    # inverse: bf16 INPUT z rounding propagates through the layer inverse
    err_i = jnp.max(jnp.abs(xr_b - xr_f) / (jnp.abs(xr_f) + 1e-2))
    assert float(err_i) < 3e-2, float(err_i)


def test_augment_kernel_interpret_matches_xla():
    """The fused augmenter has NO aliased carries, so interpret mode covers
    it fully: must match augment_attn_forward (bf16 path, same eps draw)."""
    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.flows import augment
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    fa = flp.fold_augmenter(params["augmenter"], input_dim=cfg["input_dim"],
                            extra_dim=1)
    B, N = x.shape[:2]
    x6 = jax.random.normal(jax.random.PRNGKey(5), (B, N, cfg["input_dim"]))
    rng = jax.random.PRNGKey(9)
    z_ref, ldj_ref = augment.augment_attn_forward(
        params["augmenter"], rng, x6, ctx, extra, nonlin=gelu,
        dtype=jnp.bfloat16)
    aug_dim = cfg["latent_dim"] - cfg["input_dim"]
    eps = jax.random.normal(rng, (B, N, aug_dim), jnp.float32)
    zk, ldjk = flp.fused_augmenter(x6, eps, ctx, extra, fa, interpret=True)
    assert float(jnp.max(jnp.abs(zk - z_ref))) < 1e-2
    assert float(jnp.max(jnp.abs(ldjk - ldj_ref))) < 1e-2


def test_forward_kernel_global_conditioner_interpret():
    """One-layer interpret coverage of the kernel's has_attn=False branch
    (helpful-sponge family: broadcast global embedding as the conditioner)."""
    from flowcompare_tpu.configs import derive
    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.ops import flow_layer_pallas as flp
    import flowcompare_tpu as fc

    cfg = fc.get_config("helpful-sponge")
    cfg.update(dict(
        input_dim=4, latent_dim=8, cif_latent_dim=8, n_flow_layers=3,
        hidden_dims=[16, 16], net_augmenter_dist_hidden_dims=[16, 16],
        pre_attention_mlp_hidden_dims=[8, 8],
        hidden_dims_embedder_out=[16, 16], attn_dim=12, attn_input_dim=8,
        input_embedding_dim=4, cross_dim_head=8, sample_size=16,
        n_samples_context=24, n_neighbors=4, compute_dtype="bfloat16"))
    cfg = derive(cfg)
    model = FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prep = model._prepare_layers(params["layers"])
    stacks = flp.append_final_block(
        flp.build_layer_stacks(model, prep), params["final_block"],
        cfg["latent_dim"])
    assert "wq" not in stacks  # global path
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2,
                             extra_dim=0)

    def sl(v):
        if v is None or isinstance(v, int):
            return v
        if isinstance(v, list):
            return [(w[:1], b[:1]) for w, b in v]
        return v[:1]

    f1 = {k: sl(v) for k, v in folded.items()}
    B, N = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (B, N, cfg["latent_dim"]))
    ctx = jax.random.normal(ks[1], (B, N, folded["cpl_in_c"].shape[1]))
    ldj0 = jnp.zeros((B, N))
    zs, ls = flp.folded_scan_core(x, ldj0, ctx, None, f1, nonlin=gelu,
                                  dtype=jnp.bfloat16, remat=False)
    zk, lk = flp.fused_flow_layers(x, ldj0, ctx, None, f1, interpret=True)
    assert float(jnp.max(jnp.abs(zk - zs))) < 3e-2
    assert float(jnp.max(jnp.abs(lk - ls))) < 2e-3


def test_transposed_kernel_one_layer_interpret_matches_rowmajor():
    """_kernel_t (features-on-sublanes layout, padded latent with inert dead
    dims) must match the row-major kernel on the SAME one-layer fixture —
    tiny latent 8 / split 4 pads to sp=8 / latp=16, so the scatter/pad path
    of fold_stacks_t is fully exercised."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zr, lr = flp.fused_flow_layers(x, ldj0, ctx, extra, f1, interpret=True)
    zt, lt = flp.fused_flow_layers_t(x, ldj0, ctx, extra, f1,
                                     interpret=True)
    assert zt.shape == zr.shape and lt.shape == lr.shape
    # same math, transposed contraction order: bf16-level agreement
    assert float(jnp.max(jnp.abs(zt - zr))) < 3e-2
    assert float(jnp.max(jnp.abs(lt - lr))) < 2e-3


def test_transposed_kernel_dispatch_flag():
    """fused_flow_layers routes to the transposed kernel when
    _TRANSPOSED_EVAL is on (eval path only: save_every=None)."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zt, lt = flp.fused_flow_layers_t(x, ldj0, ctx, extra, f1,
                                     interpret=True)
    prod = flp._TRANSPOSED_EVAL
    try:
        flp._TRANSPOSED_EVAL = True
        zd, ld = flp.fused_flow_layers(x, ldj0, ctx, extra, f1,
                                       interpret=True)
    finally:
        flp._TRANSPOSED_EVAL = prod
    np.testing.assert_array_equal(np.asarray(zd), np.asarray(zt))
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lt))


def test_transposed_kernel_global_conditioner_interpret():
    """has_attn=False branch of _kernel_t (global embedding conditioner,
    no extra context) against the row-major kernel."""
    from flowcompare_tpu.configs import derive
    from flowcompare_tpu.ops import flow_layer_pallas as flp
    import flowcompare_tpu as fc

    cfg = fc.get_config("helpful-sponge")
    cfg.update(dict(
        input_dim=4, latent_dim=8, cif_latent_dim=8, n_flow_layers=3,
        hidden_dims=[16, 16], net_augmenter_dist_hidden_dims=[16, 16],
        pre_attention_mlp_hidden_dims=[8, 8],
        hidden_dims_embedder_out=[16, 16], attn_dim=12, attn_input_dim=8,
        input_embedding_dim=4, cross_dim_head=8, sample_size=16,
        n_samples_context=24, n_neighbors=4, compute_dtype="bfloat16"))
    cfg = derive(cfg)
    model = FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prep = model._prepare_layers(params["layers"])
    stacks = flp.append_final_block(
        flp.build_layer_stacks(model, prep), params["final_block"],
        cfg["latent_dim"])
    folded = flp.fold_stacks(stacks, split=cfg["latent_dim"] // 2,
                             extra_dim=0)

    def sl(v):
        if v is None or isinstance(v, int):
            return v
        if isinstance(v, list):
            return [(w[:1], b[:1]) for w, b in v]
        return v[:1]

    f1 = {k: sl(v) for k, v in folded.items()}
    B, N = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (B, N, cfg["latent_dim"]))
    ctx = jax.random.normal(ks[1], (B, N, folded["cpl_in_c"].shape[1]))
    ldj0 = jnp.zeros((B, N))
    zr, lr = flp.fused_flow_layers(x, ldj0, ctx, None, f1, interpret=True)
    zt, lt = flp.fused_flow_layers_t(x, ldj0, ctx, None, f1, interpret=True)
    assert float(jnp.max(jnp.abs(zt - zr))) < 3e-2
    assert float(jnp.max(jnp.abs(lt - lr))) < 2e-3


def test_transposed_inverse_kernel_one_layer_interpret():
    """_kernel_inverse_t matches the row-major inverse kernel and round-trips
    the transposed forward on a real layer (interpret mode, 1 layer)."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg, model, params, f1, s1, x, ctx, extra = _one_layer_fixture()
    inv1 = flp.fold_stacks_inverse(s1, f1)
    ldj0 = jnp.zeros(x.shape[:2], jnp.float32)
    zf, _ = flp.fused_flow_layers_t(x, ldj0, ctx, extra, f1, interpret=True)
    xr_row = flp.fused_flow_layers_inverse(zf, ctx, extra, inv1,
                                           interpret=True)
    xr_t = flp.fused_flow_layers_inverse_t(zf, ctx, extra, inv1,
                                           interpret=True)
    assert float(jnp.max(jnp.abs(xr_t - xr_row))) < 3e-2
    # round trip through the transposed pair: bf16-level
    err = jnp.max(jnp.abs(xr_t - x) / (jnp.abs(x) + 1e-2))
    assert float(err) < 3e-2, float(err)
