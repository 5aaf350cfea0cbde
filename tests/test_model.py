"""End-to-end model assembly tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.configs import get_config
from flowcompare_tpu.model import FlowCompareModel, inner_loop, make_sample


def tiny_config(**overrides):
    cfg = get_config("dulcet-universe")
    cfg.update(dict(
        input_dim=4,
        latent_dim=8,
        cif_latent_dim=8,
        n_flow_layers=3,
        hidden_dims=[16, 16],
        net_augmenter_dist_hidden_dims=[16, 16],
        pre_attention_mlp_hidden_dims=[8, 8],
        hidden_dims_embedder_out=[16, 16],
        attn_dim=12,
        attn_input_dim=8,
        input_embedding_dim=4,
        cross_dim_head=8,
        input_embedder="idenity",
        sample_size=16,
        n_samples_context=24,
        n_neighbors=4,
    ))
    cfg.update(overrides)
    from flowcompare_tpu.configs import derive
    return derive(cfg)


def _batch(cfg, key=jax.random.PRNGKey(42)):
    k0, k1, k2 = jax.random.split(key, 3)
    extract_0 = jax.random.normal(k0, (2, cfg["n_samples_context"], cfg["input_dim"]))
    extract_1 = jax.random.normal(k1, (2, cfg["sample_size"], cfg["input_dim"]))
    extra = jax.random.normal(k2, (2, 1)) if cfg["using_extra_context"] else None
    return extract_0, extract_1, extra


@pytest.mark.parametrize("overrides", [
    {},                                      # attention conditioner + extra ctx
    {"extra_z_value_context": False},        # no extra context
    {"flow_type": "ExponentialCoupling"},
    {"flow_type": "RationalQuadraticSplineCoupling"},
    {"permuter_type": "random_permute"},
    {"permuter_type": "FullCombiner"},
    {"permuter_type": "ExponentialCombiner"},
    {"act_norm": False},
])
def test_inner_loop_runs_and_is_finite(overrides):
    cfg = tiny_config(**overrides)
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    loss, log_prob, nats, _ = inner_loop(
        model, params, state, batch, rng=jax.random.PRNGKey(1), training=True)
    assert log_prob.shape == (2, cfg["sample_size"])
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(log_prob)).all()
    assert np.isfinite(float(nats))


def test_no_extra_preset_ignores_supplied_extra_tensor():
    """A no-extra-context config fed a batch that still carries the extra
    tensor (eval loaders always emit it) must ignore it — the reference
    threads extra_context only when the config enables it
    (model_initialization.py:33-45, :211-213)."""
    cfg = tiny_config(extra_z_value_context=False)
    assert not cfg["using_extra_context"]
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, _ = _batch(cfg)
    extra = jax.random.normal(jax.random.PRNGKey(7), (2, 1))
    out_with = inner_loop(model, params, state,
                          (extract_0, extract_1, extra),
                          rng=jax.random.PRNGKey(1))
    out_none = inner_loop(model, params, state,
                          (extract_0, extract_1, None),
                          rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out_with[1]),
                                  np.asarray(out_none[1]))
    s_with = make_sample(model, params, state, jax.random.PRNGKey(9), 16,
                         extract_0, extra)
    s_none = make_sample(model, params, state, jax.random.PRNGKey(9), 16,
                         extract_0, None)
    np.testing.assert_array_equal(np.asarray(s_with), np.asarray(s_none))


def test_flow_core_is_bijective():
    """Deterministic core (post-augmenter): inverse(forward(x)) == x."""
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, extra = _batch(cfg)
    emb, _ = model.embed(params, state, extract_0)
    extra_b = jnp.broadcast_to(extra[:, None, :], (2, cfg["sample_size"], 1))

    # run augmenter once to get a latent z, then forward/inverse the core
    z, _ = model._augment_fwd(params["augmenter"], jax.random.PRNGKey(5),
                              extract_1, emb, extra_b)

    def core_fwd(h):
        def body(carry, lp):
            h, acc = carry
            h, l = model._layer_fwd(lp, h, emb, extra_b)
            return (h, acc + l), None
        (h, _), _ = jax.lax.scan(body, (h, jnp.zeros(h.shape[:-1])), params["layers"])
        h, _ = model._block_fwd(params["final_block"], h, emb, extra_b)
        return h

    def core_inv(h):
        h = model._block_inv(params["final_block"], h, emb, extra_b)

        from flowcompare_tpu.flows import actnorm

        def body(h, lp):
            h = model._permuter_inv(lp["permuter"], h)
            h = actnorm.actnorm_inverse(lp["actnorm"], h)
            h = model._block_inv(lp["block"], h, emb, extra_b)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"], reverse=True)
        return h

    y = core_fwd(z)
    z_rec = core_inv(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_rec), atol=1e-4)


def test_sample_shapes_and_finite():
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, _, extra = _batch(cfg)
    x = make_sample(model, params, state, jax.random.PRNGKey(9), 32,
                    extract_0, extra)
    assert x.shape == (2, 32, cfg["input_dim"])
    assert np.isfinite(np.asarray(x)).all()


def test_data_dependent_init_standardizes_first_layer():
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, extra = _batch(cfg)
    emb, _ = model.embed(params, state, extract_0)
    extra_b = jnp.broadcast_to(extra[:, None, :], (2, cfg["sample_size"], 1))
    new_params = model.data_dependent_init(
        params, extract_1, emb, extra_b, rng=jax.random.PRNGKey(2))
    # after init the first actnorm's input distribution maps to ~N(0,1)
    z, _ = model._augment_fwd(new_params["augmenter"], jax.random.PRNGKey(2),
                              extract_1, emb, extra_b)
    lp0 = jax.tree_util.tree_map(lambda a: a[0], new_params["layers"])
    z, _ = model._block_fwd(lp0["block"], z, emb, extra_b)
    from flowcompare_tpu.flows import actnorm
    out, _ = actnorm.actnorm_forward(lp0["actnorm"], z)
    flat = np.asarray(out).reshape(-1, cfg["latent_dim"])
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(flat.std(0, ddof=1), 1.0, atol=1e-2)


def test_global_embedder_path():
    cfg = tiny_config(input_embedder="DGCNNembedderGlobal",
                      input_embedding_dim=6, extra_z_value_context=False)
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    loss, log_prob, nats, new_state = inner_loop(
        model, params, state, batch, rng=jax.random.PRNGKey(1), training=True)
    assert log_prob.shape == (2, cfg["sample_size"])
    assert np.isfinite(float(loss))
    # BN state must have been updated in training mode
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state["embedder"], new_state["embedder"])
    assert any(jax.tree_util.tree_leaves(changed))


def test_dgcnn_embedder_path():
    cfg = tiny_config(input_embedder="DGCNNembedder", input_embedding_dim=4)
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    loss, log_prob, _, _ = inner_loop(
        model, params, state, batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_paconv_embedder_path():
    # four SA levels each keep N/4 points, so the context must be >= 256
    cfg = tiny_config(input_embedder="PAConv", input_embedding_dim=4,
                      input_dim=6, latent_dim=8,
                      n_samples_context=256, sample_size=32)
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    loss, log_prob, _, _ = inner_loop(
        model, params, state, batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_jit_static_flags_frozen_after_init():
    """remat/fused_layers/compute_dtype are closed over by compiled eval
    functions (eval/evaluate.py) — mutating them post-init must raise, and
    with_options must hand back a correctly reconfigured model."""
    import pytest
    cfg = tiny_config()
    model = FlowCompareModel(cfg, remat=False)
    assert model.remat is False
    for flag, val in (("remat", True), ("fused_layers", True),
                      ("compute_dtype", jnp.bfloat16)):
        with pytest.raises(AttributeError, match="jit-static"):
            setattr(model, flag, val)
    fast = model.with_options(fused_layers=True, compute_dtype="bfloat16")
    assert fast.fused_layers and fast.compute_dtype == jnp.bfloat16
    assert fast.remat is False  # inherited
    assert model.fused_layers is False  # original untouched


def test_batchwise_shard_map_plumbing_matches_direct():
    """model._batchwise (the fused-kernels-under-mesh wrapper) must be a
    semantic no-op for per-item-independent functions: batch args sharded
    over 'data', replicated args broadcast, None args passed through."""
    from jax.sharding import Mesh

    cfg = tiny_config(compute_dtype="bfloat16")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    model = FlowCompareModel(cfg, fused_layers=True, fused_mesh=mesh,
                             remat=False)

    def kernel_standin(x, ldj, ctx, extra, stacks):
        y = x * stacks["scale"] + ctx.sum(-1, keepdims=True)
        if extra is not None:
            y = y + extra
        return y, ldj + jnp.sum(y, axis=-1)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k0, (8, 16, 4))
    ldj = jnp.zeros((8, 16))
    ctx = jax.random.normal(k1, (8, 16, 6))
    stacks = {"scale": jnp.asarray(1.5)}
    for extra in (None, jax.random.normal(k2, (8, 16, 1))):
        direct = kernel_standin(x, ldj, ctx, extra, stacks)
        wrapped = model._batchwise(kernel_standin, (x, ldj, ctx, extra),
                                   (stacks,))
        for a, b in zip(direct, wrapped):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    # batch not divisible by the data axis -> loud error, not silent skew
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        model._batchwise(kernel_standin,
                         (x[:6], ldj[:6], ctx[:6], None), (stacks,))


def test_fused_mesh_path_traces_with_shard_map():
    """The REAL fused megakernel path under fused_mesh must trace (shapes +
    shard_map structure) — it can only execute on TPU, but the jaxpr is
    backend-independent, so the 8-device CPU mesh validates that a
    multi-chip user gets a well-formed SPMD program instead of an
    unpartitionable pallas_call."""
    from flowcompare_tpu import model as model_mod
    from jax.sharding import Mesh

    cfg = tiny_config(compute_dtype="bfloat16")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    model = FlowCompareModel(cfg, fused_layers=True, fused_mesh=mesh,
                             remat=False)
    params, state = model.init_params(jax.random.PRNGKey(0))
    b = 8  # divisible by the 4-wide data axis
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = (
        jax.random.normal(k0, (b, cfg["n_samples_context"], cfg["input_dim"])),
        jax.random.normal(k1, (b, cfg["sample_size"], cfg["input_dim"])),
        jax.random.normal(k2, (b, 1)) if cfg["using_extra_context"] else None,
    )

    old = model_mod._FORCE_FUSE_FOR_TRACE
    model_mod._FORCE_FUSE_FOR_TRACE = True
    try:
        assert model._can_fuse_layers()
        jaxpr = jax.make_jaxpr(
            lambda p, s, bt, key: inner_loop(model, p, s, bt, rng=key,
                                             training=False)[1])(
            params, state, batch, k3)
    finally:
        model_mod._FORCE_FUSE_FOR_TRACE = old
    text = str(jaxpr)
    assert "shard_map" in text
    assert "flow_layer" in text or "pallas" in text.lower()
    assert jaxpr.out_avals[0].shape == (b, cfg["sample_size"])
