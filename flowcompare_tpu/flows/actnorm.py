"""ActNorm for point clouds (B, N, D).

Reference: `models/act_norm.py:9-88` (ActNormBijectionCloud). Per-feature
shift/log_scale; the torch version mutates itself on the first training
batch (data-dependent init). In JAX that becomes an explicit, functional
init pass: `data_init` returns fresh params computed from a batch, and the
trainer decides when to call it (see train/trainer.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def init_actnorm(num_features: int, *, dtype=jnp.float32) -> dict:
    return {
        "shift": jnp.zeros((1, num_features), dtype),
        "log_scale": jnp.zeros((1, num_features), dtype),
    }


def actnorm_data_init(x: jnp.ndarray, *, eps: float = 1e-6) -> dict:
    """Stats per reference compute_stats: mean over (b, n); std over flattened (b*n).

    torch .std() uses the unbiased (ddof=1) estimator — matched here.
    """
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    flat = x.reshape(-1, d)
    mean = jnp.mean(flat, axis=0, keepdims=True)
    std = jnp.std(flat, axis=0, ddof=1, keepdims=True)
    return {"shift": mean, "log_scale": jnp.log(std + eps)}


def actnorm_forward(params: dict, x: jnp.ndarray):
    z = (x - params["shift"]) * jnp.exp(-params["log_scale"])
    ldj = jnp.broadcast_to(
        jnp.sum(-params["log_scale"].astype(jnp.float32)), x.shape[:-1])
    return z, ldj


def actnorm_inverse(params: dict, z: jnp.ndarray) -> jnp.ndarray:
    return params["shift"] + z * jnp.exp(params["log_scale"])
