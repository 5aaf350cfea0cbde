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
    """Exact (erf-based) GELU — torch.nn.GELU's default, unlike jax.nn.gelu's."""
    return jax.nn.gelu(x, approximate=False)


NONLINEARITIES: dict[str, Callable] = {
    "GELU": gelu,
    "RELU": jax.nn.relu,
    "ELU": jax.nn.elu,
    "LeakyReLU0.2": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}
