"""Cross-attention weight capture + rendering.

Counterpart of reference `visualize_attention.py:1-44`, which renders
*pre-saved* attention-weight tensors onto clouds. Here the weights are
computed on demand: `capture_attention` replays the flow forward with an
unrolled layer loop (per-layer parameter slices of the stacked scan params)
and records the softmax weights of the augmenter attention and any
requested coupling layers; `render_attention` produces the per-query-point
heat figures (t0 cloud coloured by min-max-normalised weights, the query t1
point highlighted).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.attention import apply_layer_norm
from ..core.initializers import apply_linear
from ..core.mlp import apply_mlp
from ..model import FlowCompareModel
from .cloud import view_cloud_plotly


def _attention_weights(attn_params, x, context, dtype=None):
    """Softmax weights of core.attention.apply_cross_attention."""
    inner_dim = attn_params["to_q"]["w"].shape[1]
    scale = inner_dim ** -0.5
    xn = apply_layer_norm(attn_params["norm"], x.astype(jnp.float32))
    p = attn_params
    if dtype is not None:
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), attn_params)
        xn = xn.astype(dtype)
        context = context.astype(dtype)
    q = apply_linear(p["to_q"], xn)
    kv = apply_linear(p["to_kv"], context)
    k, _ = jnp.split(kv, 2, axis=-1)
    sim = jnp.einsum("bid,bjd->bij", q, k,
                     preferred_element_type=jnp.float32) * scale
    return jax.nn.softmax(sim, axis=-1)


def capture_attention(model: FlowCompareModel, params, state, batch, *,
                      layers: Sequence[int] = (), rng=None):
    """Run the forward pass, recording attention weights.

    Returns {"augmenter": (B, N, Nc) or None, layer_idx: (B, N, Nc), ...}.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    c = model.config
    extract_0, extract_1, extra = batch
    extract_0 = extract_0[..., : model.input_dim]
    x = extract_1[..., : model.input_dim]
    if extra is not None and c["using_extra_context"]:
        extra = jnp.broadcast_to(
            extra[:, None, :], (x.shape[0], x.shape[1], extra.shape[-1]))
    else:
        extra = None
    context, _ = model.embed(params, state, extract_0, training=False)
    if model.is_global:
        context = jnp.broadcast_to(
            context[:, None, :], (context.shape[0], x.shape[1], context.shape[-1]))
    captured: dict = {}

    if model.augmenter_kind == "conditional_attn":
        p = params["augmenter"]
        mlp_out = apply_mlp(p["pre_attn_mlp"], x, model.nonlin, dtype=model._dt)
        captured["augmenter"] = _attention_weights(
            p["attn"], mlp_out, context, model._dt)
    x, _ = model._augment_fwd(params["augmenter"], rng, x, context, extra)

    want = set(int(l) for l in layers)
    prepared = model._prepare_layers(params["layers"])
    for i in range(model.n_layers - 1):
        lp = jax.tree_util.tree_map(lambda a: a[i], prepared)
        if i in want and not model.is_global:
            x1 = x[..., : model.latent_dim // 2]
            mlp_out = apply_mlp(lp["block"]["pre_attention_mlp"], x1,
                                model.nonlin, dtype=model._dt)
            captured[i] = _attention_weights(
                lp["block"]["attn"], mlp_out, context, model._dt)
        x, _ = model._layer_fwd(lp, x, context, extra)
    if (model.n_layers - 1) in want and not model.is_global:
        fb = params["final_block"]
        x1 = x[..., : model.latent_dim // 2]
        mlp_out = apply_mlp(fb["pre_attention_mlp"], x1, model.nonlin,
                            dtype=model._dt)
        captured[model.n_layers - 1] = _attention_weights(
            fb["attn"], mlp_out, context, model._dt)
    return captured


def render_attention(cloud_0: np.ndarray, cloud_1: np.ndarray,
                     weights: np.ndarray, point_indices: Sequence[int], *,
                     point_size: float = 5.0):
    """Figures mapping one query point's attention over the t0 cloud
    (reference visualize_attention.py:22-44 styling: Hot colorscale heat on
    t0, the query t1 point oversized)."""
    figs = {}
    for idx in point_indices:
        w = np.asarray(weights[idx], np.float32)
        w = (w - w.min()) / (w.max() - w.min() + 1e-12)
        fig = view_cloud_plotly(np.asarray(cloud_0)[:, :3], w,
                                colorscale="Hot", point_size=point_size,
                                title=f"attention of t1 point {idx}")
        figs[idx] = {"heat": fig,
                     "query_xyz": np.asarray(cloud_1)[idx, :3].tolist()}
    return figs
