"""Golden parity vs the ACTUAL reference implementation.

Builds the reference model with its own initialize_flow (imported through
tests/reference_oracle.py), converts the torch state dict with
compat.torch_convert, and checks numerical parity of every deterministic
piece of the computation graph:

  * DGCNN embedder output (per-point and the computation it feeds)
  * augmenter attention + ConditionalNormal (mean, scale)
  * the full deterministic flow core: transforms[1:] forward ldj + output
    + base log-prob, on identical latents/context

The stochastic augment sample is the only piece not compared directly —
its parameters (mean/scale) are, which pins the full log_prob distribution.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flowcompare_tpu.compat import convert_checkpoint
from flowcompare_tpu.configs import derive, get_config
from flowcompare_tpu.flows.distributions import standard_normal_logprob
from flowcompare_tpu.model import FlowCompareModel

from reference_oracle import build_reference_oracle, teardown_reference_oracle


def small_config():
    cfg = get_config("dulcet-universe")
    cfg.update(dict(
        input_dim=6, latent_dim=12, cif_latent_dim=12, n_flow_layers=3,
        hidden_dims=[16, 16], net_augmenter_dist_hidden_dims=[16, 16],
        pre_attention_mlp_hidden_dims=[8, 8], hidden_dims_embedder_out=[16, 16],
        attn_dim=10, attn_input_dim=8, input_embedding_dim=8,
        cross_heads=1, cross_dim_head=8, n_neighbors=5,
        sample_size=16, n_samples_context=20,
    ))
    return derive(cfg)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    root = tmp_path_factory.mktemp("refshim")
    mi = build_reference_oracle(root)
    yield mi
    teardown_reference_oracle(root)


@pytest.fixture(scope="module")
def converted(oracle):
    torch.manual_seed(0)
    cfg = small_config()
    models_dict = oracle.initialize_flow(cfg, device="cpu", mode="test")
    flow_t = models_dict["flow"]
    emb_t = models_dict["input_embedder"]
    save_np = {
        "flow": {k: v.detach().numpy() for k, v in flow_t.state_dict().items()},
        "input_embedder": {k: v.detach().numpy()
                           for k, v in emb_t.state_dict().items()},
    }
    params, state = convert_checkpoint(save_np, cfg)
    model = FlowCompareModel(cfg)
    return cfg, flow_t, emb_t, params, state, model


def test_dgcnn_embedder_parity(converted):
    cfg, _, emb_t, params, state, model = converted
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg["n_samples_context"], 6)).astype(np.float32)
    with torch.no_grad():
        ref = emb_t(torch.from_numpy(x)).numpy()
    ours, _ = model.embed(params, state, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_augmenter_conditional_normal_parity(converted):
    cfg, flow_t, emb_t, params, state, model = converted
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, cfg["sample_size"], 6)).astype(np.float32)
    ctx = rng.normal(size=(2, cfg["sample_size"], cfg["input_embedding_dim"])
                     ).astype(np.float32)
    extra = rng.normal(size=(2, cfg["sample_size"], 1)).astype(np.float32)

    aug_t = flow_t.transforms[0]  # AugmentAttentionPreconditioner
    with torch.no_grad():
        xt, ct, et = map(torch.from_numpy, (x, ctx, extra))
        attention_emb = aug_t.attn(aug_t.pre_attn_mlp(xt), ct)
        attention_emb = torch.cat((et, attention_emb), dim=-1)
        net_ctx = torch.cat((xt, attention_emb), dim=-1)
        dist = aug_t.augment.noise_dist.cond_dist(net_ctx)
        ref_mean, ref_scale = dist.loc.numpy(), dist.scale.numpy()

    from flowcompare_tpu.core.attention import apply_cross_attention
    from flowcompare_tpu.core.mlp import apply_mlp
    from flowcompare_tpu.flows.distributions import conditional_normal_params
    p = params["augmenter"]
    mlp_out = apply_mlp(p["pre_attn_mlp"], jnp.asarray(x), model.nonlin)
    a_emb = apply_cross_attention(p["attn"], mlp_out, jnp.asarray(ctx))
    a_emb = jnp.concatenate((jnp.asarray(extra), a_emb), axis=-1)
    net_ctx_j = jnp.concatenate((jnp.asarray(x), a_emb), axis=-1)
    mean, scale = conditional_normal_params(
        p["augment"]["net"], net_ctx_j, model.nonlin)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(scale), ref_scale, atol=2e-4, rtol=1e-3)


def test_flow_core_parity(converted):
    """transforms[1:] fwd + base log-prob on identical latents & context."""
    cfg, flow_t, _, params, state, model = converted
    rng = np.random.default_rng(3)
    z = rng.normal(size=(2, cfg["sample_size"], cfg["latent_dim"])
                   ).astype(np.float32)
    ctx = rng.normal(size=(2, cfg["sample_size"], cfg["input_embedding_dim"])
                     ).astype(np.float32)
    extra = rng.normal(size=(2, cfg["sample_size"], 1)).astype(np.float32)

    with torch.no_grad():
        zt = torch.from_numpy(z)
        ldj_t = torch.zeros(zt.shape[:-1])
        for tr in flow_t.transforms[1:]:
            zt, ldj = tr(zt, context=torch.from_numpy(ctx),
                         extra_context=torch.from_numpy(extra))
            ldj_t = ldj_t + ldj
        ref_lp = (ldj_t + flow_t.base_dist.log_prob(zt)).numpy()
        ref_out = zt.numpy()

    h = jnp.asarray(z)
    acc = jnp.zeros(h.shape[:-1], jnp.float32)
    ctx_j, extra_j = jnp.asarray(ctx), jnp.asarray(extra)

    def body(carry, lp):
        h, acc = carry
        h, l = model._layer_fwd(lp, h, ctx_j, extra_j)
        return (h, acc + l), None

    (h, acc), _ = jax.lax.scan(body, (h, acc), params["layers"])
    h, l = model._block_fwd(params["final_block"], h, ctx_j, extra_j)
    our_lp = acc + l + standard_normal_logprob(h)
    np.testing.assert_allclose(np.asarray(h), ref_out, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_lp), ref_lp, atol=5e-3, rtol=1e-4)


def test_flow_core_inverse_parity(converted):
    """transforms[1:] inverse chain (the sampling path) matches torch."""
    cfg, flow_t, _, params, state, model = converted
    rng = np.random.default_rng(4)
    y = rng.normal(size=(1, cfg["sample_size"], cfg["latent_dim"])
                   ).astype(np.float32)
    ctx = rng.normal(size=(1, cfg["sample_size"], cfg["input_embedding_dim"])
                     ).astype(np.float32)
    extra = rng.normal(size=(1, cfg["sample_size"], 1)).astype(np.float32)

    with torch.no_grad():
        zt = torch.from_numpy(y)
        for tr in reversed(list(flow_t.transforms[1:])):
            zt = tr.inverse(zt, context=torch.from_numpy(ctx),
                            extra_context=torch.from_numpy(extra))
        ref = zt.numpy()

    from flowcompare_tpu.flows import actnorm
    h = model._block_inv(params["final_block"], jnp.asarray(y),
                         jnp.asarray(ctx), jnp.asarray(extra))

    def body(h, lp):
        h = model._permuter_inv(lp["permuter"], h)
        h = actnorm.actnorm_inverse(lp["actnorm"], h)
        h = model._block_inv(lp["block"], h, jnp.asarray(ctx), jnp.asarray(extra))
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"], reverse=True)
    np.testing.assert_allclose(np.asarray(h), ref, atol=5e-4, rtol=1e-3)


def test_global_embedder_parity(oracle):
    """DGCNNembedderGlobal + CouplingPreconditionerGlobal config end to end."""
    torch.manual_seed(1)
    cfg = small_config()
    cfg.update(dict(input_embedder="DGCNNembedderGlobal",
                    input_embedding_dim=8, extra_z_value_context=False))
    cfg = derive(cfg)
    models_dict = oracle.initialize_flow(cfg, device="cpu", mode="test")
    flow_t, emb_t = models_dict["flow"], models_dict["input_embedder"]
    save_np = {
        "flow": {k: v.detach().numpy() for k, v in flow_t.state_dict().items()},
        "input_embedder": {k: v.detach().numpy()
                           for k, v in emb_t.state_dict().items()},
    }
    params, state = convert_checkpoint(save_np, cfg)
    model = FlowCompareModel(cfg)

    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(2, cfg["n_samples_context"], 6)).astype(np.float32)
    with torch.no_grad():
        ref_emb = emb_t(torch.from_numpy(x0)).numpy()
    ours, _ = model.embed(params, state, jnp.asarray(x0), training=False)
    np.testing.assert_allclose(np.asarray(ours), ref_emb, atol=2e-4, rtol=1e-3)

    # deterministic core with broadcast global context
    z = rng.normal(size=(2, cfg["sample_size"], cfg["latent_dim"])
                   ).astype(np.float32)
    ctx = np.repeat(ref_emb[:, None, :], cfg["sample_size"], axis=1)
    with torch.no_grad():
        zt = torch.from_numpy(z)
        ldj_t = torch.zeros(zt.shape[:-1])
        for tr in flow_t.transforms[1:]:
            zt, ldj = tr(zt, context=torch.from_numpy(ctx), extra_context=None)
            ldj_t = ldj_t + ldj
        ref_lp = (ldj_t + flow_t.base_dist.log_prob(zt)).numpy()

    h, acc = jnp.asarray(z), jnp.zeros((2, cfg["sample_size"]), jnp.float32)
    ctx_j = jnp.asarray(ctx)

    def body(carry, lp):
        h, acc = carry
        h, l = model._layer_fwd(lp, h, ctx_j, None)
        return (h, acc + l), None

    (h, acc), _ = jax.lax.scan(body, (h, acc), params["layers"])
    h, l = model._block_fwd(params["final_block"], h, ctx_j, None)
    our_lp = acc + l + standard_normal_logprob(h)
    np.testing.assert_allclose(np.asarray(our_lp), ref_lp, atol=5e-3, rtol=1e-4)


def test_paconv_embedder_parity(tmp_path_factory):
    """Full PAConv PointNet++ encoder vs the actual reference implementation
    running on CPU through the pure-torch pointops oracle stub."""
    from flowcompare_tpu.compat import convert_paconv_state_dict
    from flowcompare_tpu.encoders.paconv import apply_pointnet2_paconv

    root = tmp_path_factory.mktemp("refshim_paconv")
    teardown_reference_oracle("")  # clear any cached models modules
    mi = build_reference_oracle(root, with_paconv=True)
    try:
        import models as ref_models
        torch.manual_seed(0)
        net = ref_models.PointNet2SSGSeg(c=3, k=8, out_mlp_dims=[16, 16])
        net.eval()
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 256, 6)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params, state = convert_paconv_state_dict(sd)
        params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                        params)
        state = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                       state)
        ours, _ = apply_pointnet2_paconv(params, state, jnp.asarray(x),
                                         training=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-3)
    finally:
        teardown_reference_oracle(str(root))


def test_load_torch_checkpoint_end_to_end(oracle, tmp_path):
    """Full save_flow-format .pt file -> load_torch_checkpoint -> inner_loop.

    Mirrors how the released checkpoints are packaged
    (model_initialization.py:25-28: {config, optimizer, flow,
    input_embedder, scheduler})."""
    torch.manual_seed(3)
    cfg = small_config()
    models_dict = oracle.initialize_flow(cfg, device="cpu", mode="test")
    pt_path = str(tmp_path / "ref_ckpt.pt")
    torch.save({
        "config": dict(cfg),
        "optimizer": {},
        "flow": models_dict["flow"].state_dict(),
        "input_embedder": models_dict["input_embedder"].state_dict(),
        "scheduler": {},
    }, pt_path)

    from flowcompare_tpu.compat import load_torch_checkpoint
    from flowcompare_tpu.model import FlowCompareModel, inner_loop
    config, params, state = load_torch_checkpoint(pt_path)
    assert config["latent_dim"] == cfg["latent_dim"]
    model = FlowCompareModel(config)
    rng = np.random.default_rng(9)
    batch = (jnp.asarray(rng.normal(size=(2, cfg["n_samples_context"], 6)),
                         jnp.float32),
             jnp.asarray(rng.normal(size=(2, cfg["sample_size"], 6)),
                         jnp.float32),
             jnp.asarray(rng.normal(size=(2, 1)), jnp.float32))
    loss, lp, nats, _ = inner_loop(model, params, state, batch,
                                   rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # embedder parity through the whole file round-trip
    with torch.no_grad():
        ref_emb = models_dict["input_embedder"](
            torch.from_numpy(np.asarray(batch[0]))).numpy()
    ours, _ = model.embed(params, state, batch[0], training=False)
    np.testing.assert_allclose(np.asarray(ours), ref_emb, atol=2e-4, rtol=1e-3)
