"""Parameter initializers.

The reference framework (FlowCompare) relies on PyTorch default inits for its
linear layers (`torch.nn.Linear`: Kaiming-uniform weight, uniform bias, both
bounded by 1/sqrt(fan_in)). We reproduce those numerics here so that models
trained from scratch start from a statistically identical point.

All weights are stored as ``(in_dim, out_dim)`` so the forward pass is a plain
``x @ w`` row-major matmul (MXU-friendly layout); the PyTorch checkpoint
converter transposes on import.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear(key: jax.Array, in_dim: int, out_dim: int, *, bias: bool = True,
                 dtype=jnp.float32) -> dict:
    """Linear params with torch.nn.Linear's default init.

    Equivalent to kaiming_uniform_(a=sqrt(5)) on the weight plus the
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias used by PyTorch.
    """
    bound = 1.0 / math.sqrt(in_dim)
    wk, bk = jax.random.split(key)
    params = {"w": jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        params["b"] = jax.random.uniform(bk, (out_dim,), dtype, -bound, bound)
    return params


def xavier_normal(key: jax.Array, in_dim: int, out_dim: int, *, bias: bool = True,
                  gain: float = 1.0, dtype=jnp.float32) -> dict:
    """torch.nn.init.xavier_normal_ equivalent (used by PAConv's weight_init)."""
    std = gain * math.sqrt(2.0 / (in_dim + out_dim))
    wk, _ = jax.random.split(key)
    params = {"w": std * jax.random.normal(wk, (in_dim, out_dim), dtype)}
    if bias:
        params["b"] = jnp.zeros((out_dim,), dtype)
    return params


def kaiming_normal(key: jax.Array, in_dim: int, out_dim: int, *, dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.init.kaiming_normal_ (fan_in, leaky_relu a=0 -> gain sqrt(2))."""
    std = math.sqrt(2.0 / in_dim)
    return std * jax.random.normal(key, (in_dim, out_dim), dtype)


def orthogonal(key: jax.Array, dim: int, *, dtype=jnp.float32) -> jnp.ndarray:
    return jax.nn.initializers.orthogonal()(key, (dim, dim), dtype)


def apply_linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w (+ b). Weight layout is (in, out)."""
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y
