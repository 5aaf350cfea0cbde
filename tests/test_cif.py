"""CIF sandwich blocks (cif_latent_dim > latent_dim path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.model import FlowCompareModel, inner_loop, make_sample

from test_model import tiny_config, _batch


def cif_config():
    return tiny_config(cif_latent_dim=12, extra_z_value_context=False,
                       net_cif_dist_hidden_dims=[8, 8],
                       affine_cif_hidden=[8, 8])


def test_cif_inner_loop_and_sample():
    cfg = cif_config()
    model = FlowCompareModel(cfg)
    assert model.is_cif
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    loss, log_prob, nats, _ = inner_loop(
        model, params, state, batch, rng=jax.random.PRNGKey(1))
    assert log_prob.shape == (2, cfg["sample_size"])
    assert np.isfinite(float(loss))
    pts = make_sample(model, params, state, jax.random.PRNGKey(2), 32,
                      jnp.asarray(batch[0]))
    assert pts.shape == (2, 32, cfg["input_dim"])
    assert np.isfinite(np.asarray(pts)).all()


def test_cif_data_dependent_init():
    cfg = cif_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, _ = _batch(cfg)
    emb, _ = model.embed(params, state, extract_0)
    new_params = model.data_dependent_init(
        params, extract_1, emb, None, rng=jax.random.PRNGKey(3))
    # cif actnorm params were updated away from zeros
    cif_an = new_params["layers"]["block"]["cif_actnorm"]
    assert float(jnp.abs(cif_an["shift"]).max()) > 0
    # and the model still evaluates finite
    loss, _, _, _ = inner_loop(model, new_params, state, _batch(cfg),
                               rng=jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


def test_cif_rejects_extra_context_and_global():
    with pytest.raises(ValueError):
        FlowCompareModel(tiny_config(cif_latent_dim=12,
                                     extra_z_value_context=True))
    with pytest.raises(ValueError):
        FlowCompareModel(tiny_config(cif_latent_dim=12,
                                     extra_z_value_context=False,
                                     input_embedder="DGCNNembedderGlobal",
                                     input_embedding_dim=6))
