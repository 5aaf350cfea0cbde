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


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Erf-based GELU (torch.nn.GELU's default semantics).

    XLA's Erf lowering costs ~57 ms/step on the 115-layer stack (measured,
    v5e, B=20) — by far the largest single VPU expense. This uses the
    Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7, orders below both the f32 parity tolerances and bf16 ulp)
    built on the TPU's fast exp unit instead: ~10 cheap VPU ops."""
    xf = x.astype(jnp.float32)
    a = jnp.abs(xf) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(xf) * erf_abs
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def gelu_xla(x: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact erf GELU via XLA's Erf (slow on TPU VPU)."""
    return jax.nn.gelu(x, approximate=False)


NONLINEARITIES: dict[str, Callable] = {
    "GELU": gelu,
    "RELU": jax.nn.relu,
    "ELU": jax.nn.elu,
    "LeakyReLU0.2": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}
