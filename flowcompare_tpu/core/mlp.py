"""Residual MLP — the workhorse of every coupling / conditioner net.

Semantics match the reference `models/nets.py:6-30` (FlowCompare): an input
layer, a chain of hidden layers with a residual connection added at every
*odd* hidden index (i.e. every second layer re-adds the activation from two
layers back), and a linear output layer. The nonlinearity is applied after
each layer except the output.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .initializers import apply_linear, torch_linear


def init_mlp(key: jax.Array, in_dim: int, hidden: Sequence[int], out_dim: int,
             *, dtype=jnp.float32) -> dict:
    n_hidden = len(hidden) - 1
    keys = jax.random.split(key, 2 + max(n_hidden, 0))
    params = {
        "in": torch_linear(keys[0], in_dim, hidden[0], dtype=dtype),
        "hidden": [
            torch_linear(keys[2 + i], hidden[i], hidden[i + 1], dtype=dtype)
            for i in range(n_hidden)
        ],
        "out": torch_linear(keys[1], hidden[-1], out_dim, dtype=dtype),
    }
    return params


def apply_mlp(params: dict, x: jnp.ndarray, nonlin: Callable,
              dtype=None) -> jnp.ndarray:
    """dtype: optional compute dtype (e.g. bf16) — params and input are cast
    so every matmul runs at MXU rate; the caller upcasts where numerics
    demand f32 (ldj, log-probs)."""
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        x = x.astype(dtype)
    x = nonlin(apply_linear(params["in"], x))
    residual = x
    for index, layer in enumerate(params["hidden"]):
        if index % 2 == 0:
            residual = x
            x = nonlin(apply_linear(layer, x))
        else:
            x = nonlin(residual + apply_linear(layer, x))
    return apply_linear(params["out"], x)


# GELU in logit space: 0.5*(1+erf(x/sqrt2)) == sigmoid(p(x)) for the odd
# function p = logit(Phi_e); p is fit by x*R(x^2) (degree 4 in x^2, weighted
# minimax on |x|<=5.5). Max abs error 3.2e-6 in f32 — orders below parity
# tolerances and bf16 ulp. NO input clamp: the fit keeps p(x^2) > 0 for all
# |x| > 5.5 (verified numerically to x=1000; the u^4 leading term dominates
# beyond), so the sigmoid saturates to the correct branch on its own — and
# even where u^4 overflows f32 (|x| > ~5e4), sigmoid(±inf) gives the exact
# GELU limit. Dropping the clamp saved 2 of ~10 VPU passes with the max
# error UNCHANGED (3.19e-6 measured with and without). WHY this form: TPU's
# VPU executes exp as a fast hardware op, so sigmoid costs ~2 ops and the
# whole GELU ~8, vs ~15 for the A&S erf rational and ~19 for an fma-only
# degree-14 polynomial (both measured SLOWER in the flow megakernel:
# 73.5 / 82.7 ms vs 66 ms target).
_GELU_LOGIT_POLY = (
    1.59566428e+00, 7.29274163e-02, -2.46016726e-04, -6.16248074e-05,
    2.25448288e-06,
)

# Degree-2 refit (same weighted-minimax procedure): max abs error 2.5e-5 —
# still below the 2e-4 golden tolerance — for 2 fewer FMA passes. CAUTION:
# unlike the degree-4 fit, the leading coefficient is NEGATIVE, so p(u)
# crosses zero at u≈123.6 (|x|≈11.1) and the un-clamped sigmoid would snap
# to the WRONG branch beyond (gelu(15) -> 0). Any consumer MUST clamp
# u = min(x*x, 100): p(100)=1.97 keeps the logit ≥ 19.7·sign(x) for
# |x| ≥ 10, i.e. tail error < 3e-8 (flow_layer_pallas._gelu does this).
_GELU_LOGIT_POLY_DEG2 = (
    1.5950157685713670e+00, 7.4011292044315390e-02, -7.0303357704084330e-04,
)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Erf-based GELU (torch.nn.GELU's default semantics), via a fitted
    logit-space polynomial + the TPU's fast sigmoid/exp (see above)."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    p = jnp.float32(_GELU_LOGIT_POLY[-1])
    for c in _GELU_LOGIT_POLY[-2::-1]:
        p = p * u + c
    return (xf * jax.nn.sigmoid(p * xf)).astype(x.dtype)


def gelu_xla(x: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact erf GELU via XLA's Erf (slow on TPU VPU)."""
    return jax.nn.gelu(x, approximate=False)


NONLINEARITIES: dict[str, Callable] = {
    "GELU": gelu,
    "RELU": jax.nn.relu,
    "ELU": jax.nn.elu,
    "LeakyReLU0.2": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}
