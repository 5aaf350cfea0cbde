"""Change scoring + evaluate_on_test."""

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.data import SyntheticVoxelDataset
from flowcompare_tpu.eval import clamp_infs, evaluate_on_test, log_prob_to_change
from flowcompare_tpu.model import FlowCompareModel

from test_model import tiny_config


def test_clamp_infs():
    x = jnp.array([[1.0, -jnp.inf, 3.0], [0.5, 2.0, jnp.inf]])
    out = clamp_infs(x)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out[0, 1]) == 0.5  # global finite min
    assert float(out[1, 2]) == 0.5


def test_log_prob_to_change_threshold():
    # baseline: tight distribution around -10; one clearly-changed point
    lp00 = -10.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, 100))
    lp10 = jnp.full((1, 100), -10.0)
    lp10 = lp10.at[0, 7].set(-50.0)  # way below mean - 5.4*std
    change = log_prob_to_change(lp10, lp00, multiple=5.4)
    change = np.asarray(change)
    assert change[0, 7] == 1.0       # min point maps to score 1
    assert (change[0, np.arange(100) != 7] == 0).all()


def test_log_prob_to_change_hard_cutoff():
    lp10 = jnp.array([[0.0, -3.0, -10.0]])
    lp00 = jnp.zeros((1, 3))
    change = np.asarray(log_prob_to_change(lp10, lp00, multiple=0.0,
                                           hard_cutoff=-5.0))
    assert change[0, 2] > 0 and change[0, 0] == 0 and change[0, 1] == 0


def test_evaluate_on_test_runs():
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    ds = SyntheticVoxelDataset(
        n_items=4, batch_size=2, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"], with_extra=True,
        mode="test", include_all=True)
    nats, change_means = evaluate_on_test(model, params, state, ds)
    assert np.isfinite(nats)
    assert len(change_means) == 4
    assert all(0.0 <= m <= 1.0 for m in change_means)


def test_evaluate_rejects_ragged_batches():
    """The nats accumulator is a running mean over per-batch means
    (reference test_flow.py:224-227 semantics) — exact only for uniform
    batch sizes, so a ragged final batch must raise, not silently skew."""
    import pytest

    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    ds = SyntheticVoxelDataset(
        n_items=4, batch_size=2, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"], with_extra=True,
        mode="test", include_all=True)
    batches = list(ds)
    ragged = batches[:1] + [
        tuple(t[:1] if t is not None else None for t in batches[1])]
    with pytest.raises(ValueError, match="uniform batch sizes"):
        evaluate_on_test(model, params, state, ragged)


def test_evaluate_on_test_sharded_matches_unsharded():
    """SPMD data-parallel eval over the fake 8-device mesh reproduces the
    single-device numbers (same jitted program, batch sharded over 'data')."""
    from flowcompare_tpu.train.mesh import make_mesh

    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))

    def make_ds():
        return SyntheticVoxelDataset(
            n_items=2, batch_size=4, sample_size=cfg["sample_size"],
            n_samples_context=cfg["n_samples_context"], with_extra=True,
            mode="test", include_all=True)

    nats_ref, means_ref = evaluate_on_test(model, params, state, make_ds())
    mesh = make_mesh(n_data=4, n_model=2)
    nats_sh, means_sh = evaluate_on_test(model, params, state, make_ds(),
                                         mesh=mesh)
    np.testing.assert_allclose(nats_sh, nats_ref, rtol=1e-5)
    np.testing.assert_allclose(means_sh, means_ref, rtol=1e-5)


def test_evaluate_on_test_reverse_direction():
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    ds = SyntheticVoxelDataset(
        n_items=2, batch_size=2, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"], with_extra=True,
        mode="test", include_all=True)
    nats, fwd, rev = evaluate_on_test(model, params, state, ds,
                                      compute_reverse=True)
    assert np.isfinite(nats)
    assert len(fwd) == 2 and len(rev) == 2


def test_evaluate_generate_samples(tmp_path):
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    ds = SyntheticVoxelDataset(
        n_items=2, batch_size=2, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"], with_extra=True,
        mode="test", include_all=True)
    import os
    out = str(tmp_path / "dumps")
    evaluate_on_test(model, params, state, ds, generate_samples=True,
                     samples_dir=out, n_gen_points=32)
    files = os.listdir(out)
    assert any("gen_given_0" in f for f in files)
    assert any("0_small" in f for f in files)
