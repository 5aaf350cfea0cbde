"""Interactive change-map viewer.

Counterparts of reference `test_flow.py:20-132` (DatasetViewer.view_index:
per-index 8-figure browser over both conditioning directions, self-pairs,
generated clouds and the combined change map) and
`visualize_change_map.py:14-113` (the Dash app: index dropdown, std-multiple
slider, generation-std slider, hard-cutoff & point-size inputs).

Dash/plotly are optional; `DatasetViewer` itself only produces figures (or
dict payloads without plotly) so it is fully testable headless.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.evaluate import log_prob_to_change
from ..model import FlowCompareModel, inner_loop, make_sample
from .cloud import view_cloud_plotly


class DatasetViewer:
    """Browse eval items: likelihoods, change maps, generated clouds."""

    def __init__(self, model: FlowCompareModel, params, state, dataset, *,
                 rng: Optional[jax.Array] = None):
        self.model = model
        self.params = params
        self.state = state
        self.dataset = dataset          # item getter: get_item_all(idx)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        @jax.jit
        def _eval(params, state, batch, key):
            _, log_prob, nats, _ = inner_loop(
                self.model, params, state, batch, rng=key, training=False)
            return log_prob, nats

        self._eval = _eval

    def _pair_logprob(self, extract_0, extract_1, extra, key):
        batch = (jnp.asarray(extract_0)[None], jnp.asarray(extract_1)[None],
                 jnp.asarray(extra)[None] if extra is not None else None)
        lp, _ = self._eval(self.params, self.state, batch, key)
        return lp[0]

    def calc_change_vals(self, idx: int, multiple: float = 5.4,
                         hard_cutoff: Optional[float] = None):
        """Both-direction change scores for one item (test_flow.py:118-132)."""
        item = self.dataset.get_item_all(idx)
        (v0l, v1s, extra, v1l_self, v1s_self, v_opp_small, v_opp_large,
         v0s_self, v0l_self, v0s_orig, v1s_orig) = item
        if not self.model.config["using_extra_context"]:
            extra = None
        k1, k2, k3, k4, self.rng = jax.random.split(self.rng, 5)
        lp_1_0 = self._pair_logprob(v0l, v1s, extra, k1)
        lp_0_0 = self._pair_logprob(v0l_self, v0s_self, extra, k2)
        lp_0_1 = self._pair_logprob(v_opp_large, v_opp_small, extra, k3)
        lp_1_1 = self._pair_logprob(v1l_self, v1s_self, extra, k4)
        change_1_0 = log_prob_to_change(lp_1_0[None], lp_0_0[None],
                                        multiple, hard_cutoff)[0]
        change_0_1 = log_prob_to_change(lp_0_1[None], lp_1_1[None],
                                        multiple, hard_cutoff)[0]
        return {
            "change_1_0": np.asarray(change_1_0),
            "change_0_1": np.asarray(change_0_1),
            "log_prob_1_0": np.asarray(lp_1_0),
            "log_prob_0_0": np.asarray(lp_0_0),
            "item": item,
        }

    def view_index(self, idx: int, *, multiple: float = 5.4,
                   gen_std: float = 0.6, hard_cutoff: Optional[float] = None,
                   point_size: float = 3.0, n_gen_points: int = 4000):
        """The 8-figure panel of the reference viewer (test_flow.py:32-116)."""
        vals = self.calc_change_vals(idx, multiple, hard_cutoff)
        (v0l, v1s, extra, _v1l_self, _v1s_self, v_opp_small, v_opp_large,
         _v0s_self, _v0l_self, v0s_orig, v1s_orig) = vals["item"]
        extra_j = (jnp.asarray(extra)[None]
                   if self.model.config["using_extra_context"] else None)
        kg1, kg2, self.rng = jax.random.split(self.rng, 3)
        gen_given_0 = make_sample(self.model, self.params, self.state, kg1,
                                  n_gen_points, jnp.asarray(v0l)[None],
                                  extra_j, sample_std=gen_std)[0]
        gen_given_1 = make_sample(self.model, self.params, self.state, kg2,
                                  n_gen_points, jnp.asarray(v_opp_large)[None],
                                  extra_j, sample_std=gen_std)[0]

        fig = lambda pts, col, **kw: view_cloud_plotly(
            np.asarray(pts)[:, :3], col, point_size=point_size, **kw)
        combined_points = np.concatenate(
            [np.asarray(v0s_orig)[:, :3], np.asarray(v1s_orig)[:, :3]])
        combined_change = np.concatenate(
            [(vals["change_0_1"] > 0).astype(np.float32),
             (vals["change_1_0"] > 0).astype(np.float32)])
        changed_pct = float((vals["change_1_0"] > 0).mean())
        figures = {
            "cloud_0": fig(v0s_orig, np.asarray(v0s_orig)[:, 3:6], title="t0"),
            "cloud_1": fig(v1s_orig, np.asarray(v1s_orig)[:, 3:6], title="t1"),
            "change_1_given_0": fig(v1s, vals["change_1_0"],
                                    colorscale="Bluered", title="change t1|t0"),
            "change_0_given_1": fig(v_opp_small, vals["change_0_1"],
                                    colorscale="Bluered", title="change t0|t1"),
            "log_prob_1_given_0": fig(v1s, vals["log_prob_1_0"],
                                      colorscale="Viridis", title="log p(t1|t0)"),
            "gen_given_0": fig(gen_given_0,
                               np.clip(np.asarray(gen_given_0)[:, 3:6], 0, 1),
                               title="generated | t0"),
            "gen_given_1": fig(gen_given_1,
                               np.clip(np.asarray(gen_given_1)[:, 3:6], 0, 1),
                               title="generated | t1"),
            "combined_change": view_cloud_plotly(
                combined_points, combined_change, colorscale="Bluered",
                point_size=point_size, title="combined change"),
        }
        return figures, changed_pct


def visualize_change(viewer: DatasetViewer, index_range, *, port: int = 8050):
    """Dash browser app (visualize_change_map.py:14-113 counterpart):
    index dropdown + std-multiple / gen-std sliders + hard-cutoff &
    point-size inputs over the viewer's figure panel."""
    try:
        import dash
        from dash import dcc, html
        from dash.dependencies import Input, Output
    except ImportError as e:
        raise ImportError(
            "dash is not installed in this environment; use "
            "DatasetViewer.view_index directly and write figures to html"
        ) from e

    app = dash.Dash(__name__)
    graph_keys = ["cloud_0", "cloud_1", "change_1_given_0", "change_0_given_1",
                  "log_prob_1_given_0", "gen_given_0", "gen_given_1",
                  "combined_change"]
    app.layout = html.Div([
        dcc.Dropdown(id="index", options=[{"label": str(i), "value": i}
                                          for i in index_range],
                     value=index_range[0]),
        dcc.Slider(id="multiple", min=0.5, max=10.0, step=0.1, value=5.4),
        dcc.Slider(id="gen_std", min=0.1, max=1.5, step=0.05, value=0.6),
        dcc.Input(id="hard_cutoff", type="number", placeholder="hard cutoff"),
        dcc.Input(id="point_size", type="number", value=3),
        html.Div(id="changed_pct"),
        html.Div([dcc.Graph(id=k) for k in graph_keys]),
    ])

    @app.callback(
        [Output(k, "figure") for k in graph_keys] + [Output("changed_pct", "children")],
        [Input("index", "value"), Input("multiple", "value"),
         Input("gen_std", "value"), Input("hard_cutoff", "value"),
         Input("point_size", "value")])
    def update(index, multiple, gen_std, hard_cutoff, point_size):
        figures, changed_pct = viewer.view_index(
            int(index), multiple=float(multiple), gen_std=float(gen_std),
            hard_cutoff=hard_cutoff, point_size=float(point_size or 3))
        return [figures[k] for k in graph_keys] + [
            f"changed: {changed_pct:.1%}"]

    app.run(port=port)
    return app
