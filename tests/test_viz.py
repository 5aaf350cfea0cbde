"""Headless viz tests (plotly/dash absent in this image — dict fallbacks)."""

import jax
import numpy as np

from flowcompare_tpu.data import SyntheticVoxelDataset
from flowcompare_tpu.model import FlowCompareModel
from flowcompare_tpu.viz import (
    DatasetViewer,
    capture_attention,
    render_attention,
    view_cloud_plotly,
)

from test_model import tiny_config, _batch


def _setup():
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params, state


def test_view_cloud_plotly_fallback():
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    fig = view_cloud_plotly(pts, np.random.uniform(size=(50, 3)))
    assert fig is not None  # plotly Figure or dict payload


def test_dataset_viewer_view_index():
    cfg, model, params, state = _setup()
    ds = SyntheticVoxelDataset(
        n_items=2, batch_size=1, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"], with_extra=True,
        mode="test", include_all=True)
    viewer = DatasetViewer(model, params, state, ds)
    figures, changed_pct = viewer.view_index(0, n_gen_points=64)
    assert set(figures) == {
        "cloud_0", "cloud_1", "change_1_given_0", "change_0_given_1",
        "log_prob_1_given_0", "gen_given_0", "gen_given_1", "combined_change"}
    assert 0.0 <= changed_pct <= 1.0
    # hard-cutoff branch
    _, pct2 = viewer.view_index(1, hard_cutoff=-1e9, n_gen_points=64)
    assert pct2 == 0.0  # nothing below an absurd cutoff


def test_capture_and_render_attention():
    cfg, model, params, state = _setup()
    batch = _batch(cfg)
    captured = capture_attention(model, params, state, batch, layers=[0, 2])
    assert "augmenter" in captured and 0 in captured and 2 in captured
    w = np.asarray(captured[0][0])  # (N, Nc)
    assert w.shape == (cfg["sample_size"], cfg["n_samples_context"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)
    figs = render_attention(np.asarray(batch[0][0]), np.asarray(batch[1][0]),
                            w, [0, 5])
    assert set(figs) == {0, 5}
