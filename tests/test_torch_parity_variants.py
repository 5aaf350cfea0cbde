"""Golden parity vs the ACTUAL reference for the non-flagship transform
types: ExponentialCoupling, RationalQuadraticSplineCoupling, and CIFblock.

Same harness as test_torch_parity.py (reference imported through
tests/reference_oracle.py, weights converted with compat.torch_convert),
with the config's flow_type / cif_latent_dim flipped per variant.

Match-points: models/exponential_coupling.py:31-76,
models/spline_coupling.py:172-227 (incl. the tail-constant quirk),
models/cif_block.py:69-109.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flowcompare_tpu.compat import convert_checkpoint
from flowcompare_tpu.configs import derive
from flowcompare_tpu.flows.distributions import standard_normal_logprob
from flowcompare_tpu.model import FlowCompareModel

from reference_oracle import build_reference_oracle, teardown_reference_oracle
from test_torch_parity import small_config


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    root = tmp_path_factory.mktemp("refshim_variants")
    mi = build_reference_oracle(root)
    yield mi
    teardown_reference_oracle(root)


def _build_and_convert(oracle, cfg, seed=0):
    torch.manual_seed(seed)
    models_dict = oracle.initialize_flow(cfg, device="cpu", mode="test")
    flow_t, emb_t = models_dict["flow"], models_dict["input_embedder"]
    save_np = {
        "flow": {k: v.detach().numpy() for k, v in flow_t.state_dict().items()},
        "input_embedder": {k: v.detach().numpy()
                           for k, v in emb_t.state_dict().items()},
    }
    params, state = convert_checkpoint(save_np, cfg)
    return flow_t, params, state, FlowCompareModel(cfg)


def _flow_core_fwd_ref(flow_t, z, ctx, extra):
    with torch.no_grad():
        zt = torch.from_numpy(z)
        ldj_t = torch.zeros(zt.shape[:-1])
        for tr in flow_t.transforms[1:]:
            zt, ldj = tr(zt, context=torch.from_numpy(ctx),
                         extra_context=torch.from_numpy(extra)
                         if extra is not None else None)
            ldj_t = ldj_t + ldj
        return zt.numpy(), (ldj_t + flow_t.base_dist.log_prob(zt)).numpy()


def _flow_core_fwd_ours(model, params, z, ctx, extra):
    h = jnp.asarray(z)
    acc = jnp.zeros(h.shape[:-1], jnp.float32)
    ctx_j = jnp.asarray(ctx)
    extra_j = jnp.asarray(extra) if extra is not None else None

    def body(carry, lp):
        h, acc = carry
        h, l = model._layer_fwd(lp, h, ctx_j, extra_j)
        return (h, acc + l), None

    (h, acc), _ = jax.lax.scan(body, (h, acc), params["layers"])
    h, l = model._block_fwd(params["final_block"], h, ctx_j, extra_j)
    return np.asarray(h), np.asarray(acc + l + standard_normal_logprob(h))


def _rand_inputs(cfg, seed, batch=2):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(batch, cfg["sample_size"], cfg["latent_dim"])
                   ).astype(np.float32)
    ctx = rng.normal(size=(batch, cfg["sample_size"],
                           cfg["input_embedding_dim"])).astype(np.float32)
    extra = rng.normal(size=(batch, cfg["sample_size"], 1)).astype(np.float32)
    return z, ctx, extra


# ------------------------------------------------- ExponentialCoupling


def test_exponential_coupling_flow_core_parity(oracle):
    cfg = small_config()
    cfg["flow_type"] = "ExponentialCoupling"
    cfg = derive(cfg)
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=10)
    z, ctx, extra = _rand_inputs(cfg, 20)
    ref_out, ref_lp = _flow_core_fwd_ref(flow_t, z, ctx, extra)
    our_out, our_lp = _flow_core_fwd_ours(model, params, z, ctx, extra)
    np.testing.assert_allclose(our_out, ref_out, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(our_lp, ref_lp, atol=5e-3, rtol=1e-4)


def test_exponential_coupling_inverse_parity(oracle):
    cfg = small_config()
    cfg["flow_type"] = "ExponentialCoupling"
    cfg = derive(cfg)
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=11)
    y, ctx, extra = _rand_inputs(cfg, 21, batch=1)
    with torch.no_grad():
        zt = torch.from_numpy(y)
        for tr in reversed(list(flow_t.transforms[1:])):
            zt = tr.inverse(zt, context=torch.from_numpy(ctx),
                            extra_context=torch.from_numpy(extra))
        ref = zt.numpy()
    from flowcompare_tpu.flows import actnorm
    ctx_j, extra_j = jnp.asarray(ctx), jnp.asarray(extra)
    h = model._block_inv(params["final_block"], jnp.asarray(y), ctx_j, extra_j)

    def body(h, lp):
        h = model._permuter_inv(lp["permuter"], h)
        h = actnorm.actnorm_inverse(lp["actnorm"], h)
        h = model._block_inv(lp["block"], h, ctx_j, extra_j)
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"], reverse=True)
    np.testing.assert_allclose(np.asarray(h), ref, atol=2e-3, rtol=1e-3)


# ------------------------------------------------------ RQ-spline


def test_spline_coupling_flow_core_parity(oracle):
    cfg = small_config()
    cfg["flow_type"] = "RationalQuadraticSplineCoupling"
    cfg = derive(cfg)
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=12)
    # scale up the latents so a healthy fraction of inputs exceeds the
    # spline's tail bound -> exercises the tail-constant quirk
    z, ctx, extra = _rand_inputs(cfg, 22)
    z = z * 2.5
    ref_out, ref_lp = _flow_core_fwd_ref(flow_t, z, ctx, extra)
    our_out, our_lp = _flow_core_fwd_ours(model, params, z, ctx, extra)
    np.testing.assert_allclose(our_out, ref_out, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(our_lp, ref_lp, atol=5e-3, rtol=1e-4)


def test_spline_coupling_inverse_parity(oracle):
    cfg = small_config()
    cfg["flow_type"] = "RationalQuadraticSplineCoupling"
    cfg = derive(cfg)
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=13)
    y, ctx, extra = _rand_inputs(cfg, 23, batch=1)
    y = y * 2.5
    with torch.no_grad():
        zt = torch.from_numpy(y)
        for tr in reversed(list(flow_t.transforms[1:])):
            zt = tr.inverse(zt, context=torch.from_numpy(ctx),
                            extra_context=torch.from_numpy(extra))
        ref = zt.numpy()
    from flowcompare_tpu.flows import actnorm
    ctx_j, extra_j = jnp.asarray(ctx), jnp.asarray(extra)
    h = model._block_inv(params["final_block"], jnp.asarray(y), ctx_j, extra_j)

    def body(h, lp):
        h = model._permuter_inv(lp["permuter"], h)
        h = actnorm.actnorm_inverse(lp["actnorm"], h)
        h = model._block_inv(lp["block"], h, ctx_j, extra_j)
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"], reverse=True)
    np.testing.assert_allclose(np.asarray(h), ref, atol=2e-3, rtol=1e-3)


# ------------------------------------------------------- CIFblock


def _cif_config():
    cfg = small_config()
    cfg.update(dict(cif_latent_dim=16, extra_z_value_context=False,
                    net_cif_dist_hidden_dims=[16, 16],
                    affine_cif_hidden=[16, 16]))
    return derive(cfg)


def test_cif_block_forward_parity(oracle):
    """Full CIFblock forward chain (cif_block.py:71-100) with the stochastic
    augment sample INJECTED identically on both sides (z2 = mean + scale*eps
    for a fixed eps), making every downstream piece — reverse, affine_cif,
    act_norm, reverse, slice, preconditioned coupling — deterministic."""
    cfg = _cif_config()
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=14)
    assert model.is_cif

    # torch ActNorms inside CIF blocks are data-dep-init; randomize + mark
    # initialized so converted weights are non-trivial and no init happens
    torch.manual_seed(40)
    for tr in flow_t.transforms[1:]:
        if hasattr(tr, "act_norm"):
            tr.act_norm.shift.data.normal_(std=0.2)
            tr.act_norm.log_scale.data.normal_(std=0.1)
            tr.act_norm.initialized.fill_(1)
    save_np = {
        "flow": {k: v.detach().numpy() for k, v in flow_t.state_dict().items()},
        "input_embedder": {k: v.detach().numpy() for k, v in
                           oracle.initialize_flow(cfg, device="cpu", mode="test")
                           ["input_embedder"].state_dict().items()},
    }
    # reconvert with the randomized actnorms (embedder irrelevant here)
    params, _ = convert_checkpoint(
        {"flow": save_np["flow"], "input_embedder": save_np["input_embedder"]},
        cfg)

    rng = np.random.default_rng(30)
    lat, cif_lat = cfg["latent_dim"], cfg["cif_latent_dim"]
    x = rng.normal(size=(2, cfg["sample_size"], lat)).astype(np.float32)
    ctx = rng.normal(size=(2, cfg["sample_size"], cfg["input_embedding_dim"])
                     ).astype(np.float32)
    eps = rng.normal(size=(2, cfg["sample_size"], cif_lat - lat)
                     ).astype(np.float32)

    cif = flow_t.transforms[1]
    with torch.no_grad():
        xt, epst = torch.from_numpy(x), torch.from_numpy(eps)
        dist = cif.augmenter.noise_dist.cond_dist(xt)
        z2 = dist.loc + dist.scale * epst
        ldj = -dist.log_prob(z2).reshape(*z2.shape[:2], -1).sum(-1)
        h = torch.cat([xt, z2], dim=-1)
        h = torch.flip(h, dims=(-1,))
        h, l2 = cif.affine_cif(h, context=None)
        h, l3 = cif.act_norm(h)
        h = torch.flip(h, dims=(-1,))
        h, l4 = cif.slicer(h, context=None)
        h, l5 = cif.flow(h, context=torch.from_numpy(ctx))
        ref_out = h.numpy()
        ref_ldj = (ldj + l2 + l3 + l4 + l5).numpy()

    from flowcompare_tpu.core.mlp import apply_mlp
    from flowcompare_tpu.flows import actnorm as fan
    from flowcompare_tpu.flows import augment, coupling
    from flowcompare_tpu.flows.distributions import (
        conditional_normal_logprob, conditional_normal_params)
    lp0 = jax.tree_util.tree_map(lambda a: a[0], params["layers"])
    p = lp0["block"]
    clamp = cfg["clamp_dist"]
    xj = jnp.asarray(x)
    mean, scale = conditional_normal_params(p["cif_net"], xj, model.nonlin,
                                            clamp=clamp)
    z2_j = mean + scale * jnp.asarray(eps)
    np.testing.assert_allclose(np.asarray(z2_j), z2.numpy(),
                               atol=2e-4, rtol=1e-3)
    ldj_j = -conditional_normal_logprob(p["cif_net"], z2_j, xj, model.nonlin,
                                        clamp=clamp)
    h_j = jnp.concatenate([xj, z2_j], axis=-1)[..., ::-1]
    h_j, l2_j = coupling.affine_coupling_forward(
        p["affine_cif"], h_j, None, nonlin=model.nonlin,
        scale_fn_type="sigmoid", split_dim=cif_lat - lat)
    h_j, l3_j = fan.actnorm_forward(p["cif_actnorm"], h_j)
    h_j = h_j[..., ::-1]
    h_j, l4_j = augment.slice_forward({"net": p["cif_net"]}, h_j, None,
                                      num_keep=lat, nonlin=model.nonlin,
                                      clamp=clamp)
    ctx_j = model._block_context(p, h_j, jnp.asarray(ctx), None)
    h_j, l5_j = model._coupling_fwd(p["coupling"], h_j, ctx_j)
    our_ldj = ldj_j + l2_j + l3_j + l4_j + l5_j
    np.testing.assert_allclose(np.asarray(h_j), ref_out, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_ldj), ref_ldj,
                               atol=5e-3, rtol=1e-4)


def test_cif_block_inverse_parity(oracle):
    """CIFblock.inverse (cif_block.py:102-112) with the slicer's stochastic
    resample injected identically (x2 = mean + scale*eps) on both sides."""
    cfg = _cif_config()
    flow_t, params, state, model = _build_and_convert(oracle, cfg, seed=15)
    torch.manual_seed(41)
    for tr in flow_t.transforms[1:]:
        if hasattr(tr, "act_norm"):
            tr.act_norm.shift.data.normal_(std=0.2)
            tr.act_norm.log_scale.data.normal_(std=0.1)
            tr.act_norm.initialized.fill_(1)
    emb_sd = {k: v.detach().numpy() for k, v in
              oracle.initialize_flow(cfg, device="cpu", mode="test")
              ["input_embedder"].state_dict().items()}
    params, _ = convert_checkpoint(
        {"flow": {k: v.detach().numpy()
                  for k, v in flow_t.state_dict().items()},
         "input_embedder": emb_sd}, cfg)

    rng = np.random.default_rng(31)
    lat, cif_lat = cfg["latent_dim"], cfg["cif_latent_dim"]
    y = rng.normal(size=(1, cfg["sample_size"], lat)).astype(np.float32)
    ctx = rng.normal(size=(1, cfg["sample_size"], cfg["input_embedding_dim"])
                     ).astype(np.float32)
    eps = rng.normal(size=(1, cfg["sample_size"], cif_lat - lat)
                     ).astype(np.float32)

    cif = flow_t.transforms[1]
    with torch.no_grad():
        h = cif.flow.inverse(torch.from_numpy(y),
                             context=torch.from_numpy(ctx))
        dist = cif.slicer.noise_dist.cond_dist(h)
        x2 = dist.loc + dist.scale * torch.from_numpy(eps)
        h = torch.cat([h, x2], dim=-1)
        h = torch.flip(h, dims=(-1,))
        h = cif.act_norm.inverse(h)
        h = cif.affine_cif.inverse(h)
        h = torch.flip(h, dims=(-1,))
        ref = h[..., :lat].numpy()

    from flowcompare_tpu.flows import actnorm as fan
    from flowcompare_tpu.flows import coupling
    from flowcompare_tpu.flows.distributions import conditional_normal_params
    lp0 = jax.tree_util.tree_map(lambda a: a[0], params["layers"])
    p = lp0["block"]
    clamp = cfg["clamp_dist"]
    ctx_j = model._block_context(p, jnp.asarray(y), jnp.asarray(ctx), None)
    h_j = model._coupling_inv(p["coupling"], jnp.asarray(y), ctx_j)
    mean, scale = conditional_normal_params(p["cif_net"], h_j, model.nonlin,
                                            clamp=clamp)
    h_j = jnp.concatenate([h_j, mean + scale * jnp.asarray(eps)], axis=-1)
    h_j = h_j[..., ::-1]
    h_j = fan.actnorm_inverse(p["cif_actnorm"], h_j)
    h_j = coupling.affine_coupling_inverse(
        p["affine_cif"], h_j, None, nonlin=model.nonlin,
        scale_fn_type="sigmoid", split_dim=cif_lat - lat)
    h_j = h_j[..., ::-1][..., :lat]
    np.testing.assert_allclose(np.asarray(h_j), ref, atol=1e-3, rtol=1e-3)
