"""Functional BatchNorm with torch semantics (eps 1e-5, momentum 0.1).

The DGCNN / PAConv encoders of the reference use BatchNorm1d/2d heavily
(`models/pytorch_gcn.py:60-81`). In JAX the running statistics are explicit
state threaded through the train step: ``apply_batchnorm`` returns
``(y, new_state)`` in training mode and uses the stored running stats in
eval mode.

Normalization is computed over every axis except the last (channels-last
layout everywhere in this framework). Under a data-parallel mesh the batch
statistics are averaged across devices with lax.pmean when `axis_name` is
given — the reference's vendored sync-BN, done the SPMD way.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def init_batchnorm(num_features: int, *, dtype=jnp.float32) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((num_features,), dtype),
              "bias": jnp.zeros((num_features,), dtype)}
    state = {"mean": jnp.zeros((num_features,), jnp.float32),
             "var": jnp.ones((num_features,), jnp.float32)}
    return params, state


def apply_batchnorm(params: dict, state: dict, x: jnp.ndarray, *,
                    training: bool, momentum: float = 0.1, eps: float = 1e-5,
                    axis_name: Optional[str] = None):
    reduce_axes = tuple(range(x.ndim - 1))
    if training:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.var(xf, axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            var = jax.lax.pmean(var, axis_name)
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]
        # torch tracks the unbiased variance in its running stats but
        # normalizes with the biased one.
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state
