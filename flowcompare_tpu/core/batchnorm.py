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

The TRAIN path uses an explicit custom-VJP (the textbook BN backward in
f32) instead of autodiff. Load-bearing on the axon TPU backend: XLA's
autodiff of the train-mode normalize with a bf16 input is miscompiled
there — upstream gradients come back ~1e5x too small or NaN (measured
2026-08-17: 2-stage DGCNN conv1.w grad norm 0.007 under autodiff-BN-bf16
vs 9489 in f32; eval mode and no-BN unaffected). The hand-written backward
sidesteps the broken fusion and is exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def init_batchnorm(num_features: int, *, dtype=jnp.float32) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((num_features,), dtype),
              "bias": jnp.zeros((num_features,), dtype)}
    state = {"mean": jnp.zeros((num_features,), jnp.float32),
             "var": jnp.ones((num_features,), jnp.float32)}
    return params, state


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train(x, scale, bias, eps, axis_name):
    y, _, _, _ = _bn_train_fwd_math(x, scale, bias, eps, axis_name)
    return y


def _bn_train_fwd_math(x, scale, bias, eps, axis_name):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(xf * xf, axis=axes) - mean * mean
    if axis_name is not None:
        # sync-BN: E[x], E[x^2] averaged across the named mesh axis
        mean2 = jax.lax.pmean(var + mean * mean, axis_name)
        mean = jax.lax.pmean(mean, axis_name)
        var = mean2 - mean * mean
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), xhat, inv, (mean, var)


def _bn_train_vjp_fwd(x, scale, bias, eps, axis_name):
    y, xhat, inv, _ = _bn_train_fwd_math(x, scale, bias, eps, axis_name)
    # zero-size dtype tokens: cotangents must match primal dtypes, and raw
    # np.dtype objects are not valid JAX residuals
    toks = (jnp.zeros((), x.dtype), jnp.zeros((), scale.dtype),
            jnp.zeros((), bias.dtype))
    return y, (xhat, inv, scale, toks)


def _bn_train_vjp_bwd(eps, axis_name, res, g):
    xhat, inv, scale, (xt, st, bt) = res
    x_dt, s_dt, b_dt = xt.dtype, st.dtype, bt.dtype
    axes = tuple(range(xhat.ndim - 1))
    gf = g.astype(jnp.float32)
    dbias = jnp.sum(gf, axis=axes)
    dscale = jnp.sum(gf * xhat, axis=axes)
    mg = jnp.mean(gf, axis=axes)
    mgx = jnp.mean(gf * xhat, axis=axes)
    if axis_name is not None:
        mg = jax.lax.pmean(mg, axis_name)
        mgx = jax.lax.pmean(mgx, axis_name)
    dx = (scale.astype(jnp.float32) * inv) * (gf - mg - xhat * mgx)
    return dx.astype(x_dt), dscale.astype(s_dt), dbias.astype(b_dt)


_bn_train.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


def apply_batchnorm(params: dict, state: dict, x: jnp.ndarray, *,
                    training: bool, momentum: float = 0.1, eps: float = 1e-5,
                    axis_name: Optional[str] = None):
    if training:
        y, _, _, (mean, var) = _bn_train_fwd_math(
            x, params["scale"], params["bias"], eps, axis_name)
        # recompute through the custom-vjp wrapper for the gradient path;
        # XLA CSEs the duplicated forward, and the stats feeding new_state
        # stay out of the differentiated graph
        y = _bn_train(x, params["scale"], params["bias"], eps, axis_name)
        n = 1
        for ax in range(x.ndim - 1):
            n *= x.shape[ax]
        # torch tracks the unbiased variance in its running stats but
        # normalizes with the biased one.
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
        return y, new_state
    mean, var = state["mean"], state["var"]
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = (y * params["scale"].astype(jnp.float32)
         + params["bias"].astype(jnp.float32))
    return y.astype(x.dtype), state
