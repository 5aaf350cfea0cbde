"""Coupling bijections: affine (RealNVP-style) and matrix-exponential.

Reference semantics: `models/affine_coupling.py:8-62` and
`models/exponential_coupling.py:17-93` (FlowCompare). All five shipped
configs use AffineCoupling with the sigmoid scale function; the exponential
coupling is provided for config parity.

Per-point log-det-jacobians (B, N) accumulate in float32. The coupling MLP
is the FLOP hot spot of the whole model (115 layers x [512,512,512] on
(B*N, ~660) inputs) — it is left as plain XLA matmuls, which map directly
onto the MXU and fuse with the elementwise scale/shift epilogue.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.mlp import apply_mlp, init_mlp


# ------------------------------------------------------------------ affine

def init_affine_coupling(key: jax.Array, input_dim: int, hidden, *,
                         context_dim: int = 0, split_dim: Optional[int] = None,
                         dtype=jnp.float32) -> dict:
    split = input_dim // 2 if split_dim is None else split_dim
    out_dim = (input_dim - split) * 2
    return {"nn": init_mlp(key, split + context_dim, hidden, out_dim, dtype=dtype)}


def _affine_scale(s: jnp.ndarray, scale_fn_type: str, eps: float) -> jnp.ndarray:
    if scale_fn_type == "exp":
        return jnp.exp(s)
    if scale_fn_type == "sigmoid":
        return (2.0 * jax.nn.sigmoid(s) - 1.0) * (1.0 - eps) + 1.0
    raise ValueError(f"Invalid scale_fn_type: {scale_fn_type}")


def affine_coupling_forward(params: dict, x: jnp.ndarray, context, *,
                            nonlin: Callable, scale_fn_type: str = "sigmoid",
                            eps: float = 1e-8, split_dim: Optional[int] = None,
                            dtype=None):
    input_dim = x.shape[-1]
    split = input_dim // 2 if split_dim is None else split_dim
    x1, x2 = x[..., :split], x[..., split:]
    nn_input = jnp.concatenate(
        (x1.astype(context.dtype), context), axis=-1) if context is not None else x1
    st = apply_mlp(params["nn"], nn_input, nonlin, dtype=dtype).astype(jnp.float32)
    s_raw, t = jnp.split(st, 2, axis=-1)
    s = _affine_scale(s_raw, scale_fn_type, eps)
    y2 = x2 * s + t
    ldj = jnp.sum(jnp.log(s.astype(jnp.float32)), axis=-1)
    return jnp.concatenate([x1, y2], axis=-1), ldj


def affine_coupling_inverse(params: dict, y: jnp.ndarray, context, *,
                            nonlin: Callable, scale_fn_type: str = "sigmoid",
                            eps: float = 1e-8, split_dim: Optional[int] = None,
                            dtype=None):
    input_dim = y.shape[-1]
    split = input_dim // 2 if split_dim is None else split_dim
    y1, y2 = y[..., :split], y[..., split:]
    nn_input = jnp.concatenate(
        (y1.astype(context.dtype), context), axis=-1) if context is not None else y1
    st = apply_mlp(params["nn"], nn_input, nonlin, dtype=dtype).astype(jnp.float32)
    s_raw, t = jnp.split(st, 2, axis=-1)
    s = _affine_scale(s_raw, scale_fn_type, eps)
    x2 = (y2 - t) / s
    return jnp.concatenate([y1, x2], axis=-1)


# ------------------------------------------------- matrix-exponential flow

_EXP_EPS = 1e-8  # module-level eps added to the bounded weight matrix (ref :16)


def init_exponential_coupling(key: jax.Array, input_dim: int, hidden, *,
                              context_dim: int = 0, dtype=jnp.float32) -> dict:
    split = input_dim // 2
    x2 = input_dim - split
    out_dim = x2 * x2 + x2
    return {
        "nn": init_mlp(key, split + context_dim, hidden, out_dim, dtype=dtype),
        "scale": jnp.ones((1,), dtype) / 8,
        "shift": jnp.zeros((1,), dtype),
        "rescale": jnp.ones((1,), dtype),
        "reshift": jnp.zeros((1,), dtype),
    }


def _exponential_wb(params: dict, h: jnp.ndarray, x2_size: int):
    w_flat, b_vec = jnp.split(h, [x2_size * x2_size], axis=-1)
    w = (params["rescale"] * jnp.tanh(params["scale"] * w_flat + params["shift"])
         + params["reshift"] + _EXP_EPS)
    w = w.reshape(w.shape[:-1] + (x2_size, x2_size))
    return w, b_vec


def exponential_coupling_forward(params: dict, x: jnp.ndarray, context, *,
                                 nonlin: Callable):
    input_dim = x.shape[-1]
    split = input_dim // 2
    x2_size = input_dim - split
    x1, x2 = x[..., :split], x[..., split:]
    nn_input = jnp.concatenate((x1, context), axis=-1) if context is not None else x1
    w, b = _exponential_wb(params, apply_mlp(params["nn"], nn_input, nonlin), x2_size)
    y2 = jnp.squeeze(jax.scipy.linalg.expm(w) @ x2[..., None], -1) + b
    # ldj of expm(W) is exactly trace(W) — Xiao et al. matrix-exp flows.
    ldj = jnp.trace(w.astype(jnp.float32), axis1=-2, axis2=-1)
    return jnp.concatenate([x1, y2], axis=-1), ldj


def exponential_coupling_inverse(params: dict, y: jnp.ndarray, context, *,
                                 nonlin: Callable):
    input_dim = y.shape[-1]
    split = input_dim // 2
    y2_size = input_dim - split
    y1, y2 = y[..., :split], y[..., split:]
    nn_input = jnp.concatenate((y1, context), axis=-1) if context is not None else y1
    w, b = _exponential_wb(params, apply_mlp(params["nn"], nn_input, nonlin), y2_size)
    x2 = jnp.squeeze(jax.scipy.linalg.expm(-w) @ (y2 - b)[..., None], -1)
    return jnp.concatenate([y1, x2], axis=-1)
