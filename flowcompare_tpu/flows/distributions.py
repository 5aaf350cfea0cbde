"""Probability distributions with per-point log-probs.

Mirrors the behavioural contract of the reference `models/distributions.py`:
log-probs are summed over the feature (last) axis only, so every density
returns shape (B, N) for inputs of shape (B, N, D) — the flow accumulates
per-point log-det-jacobians at the same granularity.

All densities are pure functions; conditional densities take the conditioning
net's parameters explicitly and sampling takes an explicit PRNG key.
Log-density accumulation always happens in float32 regardless of the compute
dtype (numerics rule for 115-layer stacks).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.mlp import apply_mlp

LOG_2PI = math.log(2.0 * math.pi)


def standard_normal_logprob(x: jnp.ndarray) -> jnp.ndarray:
    """log N(x; 0, I) summed over the last axis -> (B, N)."""
    x = x.astype(jnp.float32)
    return jnp.sum(-0.5 * LOG_2PI - 0.5 * x * x, axis=-1)


def standard_normal_sample(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(key, shape, dtype)


def normal_logprob(x: jnp.ndarray, loc, scale) -> jnp.ndarray:
    """log N(x; loc, scale^2) summed over the last axis -> (B, N)."""
    x = x.astype(jnp.float32)
    z = (x - loc) / scale
    return jnp.sum(-0.5 * LOG_2PI - jnp.log(scale) - 0.5 * z * z, axis=-1)


def normal_sample(key: jax.Array, shape, loc, scale, dtype=jnp.float32) -> jnp.ndarray:
    return loc + scale * jax.random.normal(key, shape, dtype)


def conditional_normal_params(net_params: dict, context: jnp.ndarray,
                              nonlin: Callable, *,
                              clamp: Optional[float] = None, dtype=None):
    """Run the conditioning MLP and split into (mean, scale).

    Matches reference `ConditionalNormal.cond_dist` (models/distributions.py:127-137):
    net output chunked in two along the last axis; scale = exp(log_std),
    optionally clamped from above. Mean/scale always return in f32.
    """
    params_out = apply_mlp(net_params, context, nonlin, dtype=dtype)
    mean, log_std = jnp.split(params_out, 2, axis=-1)
    scale = jnp.exp(log_std.astype(jnp.float32))
    if clamp:
        scale = jnp.minimum(scale, clamp)
    return mean.astype(jnp.float32), scale


def conditional_normal_logprob(net_params: dict, x: jnp.ndarray,
                               context: jnp.ndarray, nonlin: Callable, *,
                               clamp: Optional[float] = None,
                               dtype=None) -> jnp.ndarray:
    mean, scale = conditional_normal_params(net_params, context, nonlin,
                                            clamp=clamp, dtype=dtype)
    return normal_logprob(x, mean, scale)


def conditional_normal_sample_with_logprob(net_params: dict, key: jax.Array,
                                           context: jnp.ndarray, nonlin: Callable, *,
                                           clamp: Optional[float] = None,
                                           dtype=None):
    mean, scale = conditional_normal_params(net_params, context, nonlin,
                                            clamp=clamp, dtype=dtype)
    z = normal_sample(key, mean.shape, mean, scale)
    return z, normal_logprob(z, mean, scale)


def conditional_normal_sample(net_params: dict, key: jax.Array,
                              context: jnp.ndarray, nonlin: Callable, *,
                              clamp: Optional[float] = None,
                              dtype=None) -> jnp.ndarray:
    mean, scale = conditional_normal_params(net_params, context, nonlin,
                                            clamp=clamp, dtype=dtype)
    return normal_sample(key, mean.shape, mean, scale)


def standard_uniform_logprob(x: jnp.ndarray) -> jnp.ndarray:
    """Mean indicator of the unit box, log'd — reference StandardUniform (:163-181)."""
    x = x.astype(jnp.float32)
    lb = jnp.mean((x >= 0.0).astype(jnp.float32), axis=-1)
    ub = jnp.mean((x <= 1.0).astype(jnp.float32), axis=-1)
    return jnp.log(lb * ub)


def standard_uniform_sample(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.uniform(key, shape, dtype)
