"""Invertible 1x1 feature mixers / permuters.

Reference: `models/permuters.py` (FlowCompare). LinearLU is the permuter used
by all five shipped configs; the others (fixed permutation, Reverse,
FullCombiner, ExponentialCombiner) are provided for config parity.

TPU notes: LinearLU's forward is two (B*N, D) x (D, D) matmuls — pure MXU
work. The L/U matrices are materialised from their packed parameter vectors
at trace time with static scatter indices, which XLA folds into constants
per step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.initializers import orthogonal


# ---------------------------------------------------------------- LinearLU

def init_linear_lu(num_features: int, *, identity_init: bool = True,
                   eps: float = 1e-3, key: jax.Array | None = None,
                   dtype=jnp.float32) -> dict:
    n_tri = (num_features - 1) * num_features // 2
    if identity_init:
        constant = math.log(math.exp(1 - eps) - 1)
        return {
            "lower_entries": jnp.zeros((n_tri,), dtype),
            "upper_entries": jnp.zeros((n_tri,), dtype),
            "unconstrained_upper_diag": jnp.full((num_features,), constant, dtype),
        }
    stdv = 1.0 / math.sqrt(num_features)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lower_entries": jax.random.uniform(k1, (n_tri,), dtype, -stdv, stdv),
        "upper_entries": jax.random.uniform(k2, (n_tri,), dtype, -stdv, stdv),
        "unconstrained_upper_diag": jax.random.uniform(k3, (num_features,), dtype, -stdv, stdv),
    }


def _lu_matrices(params: dict, eps: float):
    d = params["unconstrained_upper_diag"].shape[0]
    tril = np.tril_indices(d, k=-1)
    triu = np.triu_indices(d, k=1)
    lower = jnp.eye(d, dtype=params["lower_entries"].dtype)
    lower = lower.at[tril].set(params["lower_entries"])
    upper_diag = jax.nn.softplus(params["unconstrained_upper_diag"]) + eps
    upper = jnp.diag(upper_diag)
    upper = upper.at[triu].set(params["upper_entries"])
    return lower, upper, upper_diag


def linear_lu_forward(params: dict, x: jnp.ndarray, *, eps: float = 1e-3,
                      dtype=None):
    if "w_folded" in params:
        # pre-folded by linear_lu_prepare_stack (outside the layer scan):
        # ONE matmul at MXU rate, no per-layer scatter materialisation.
        w = params["w_folded"]
        xin = x.astype(w.dtype)
        z = jnp.dot(xin, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
        return z, jnp.broadcast_to(params["ldj"], x.shape[:-1])
    lower, upper, upper_diag = _lu_matrices(params, eps)
    t = x @ upper.T
    z = t @ lower.T
    ldj = jnp.broadcast_to(
        jnp.sum(jnp.log(upper_diag.astype(jnp.float32))), x.shape[:-1])
    return z, ldj


def linear_lu_prepare_stack(stacked: dict, *, eps: float = 1e-3, dtype=None):
    """Fold a STACK of LinearLU params (leading layer axis) into dense
    weights + scalar ldjs in one batched op.

    The packed-vector -> matrix scatter is expensive when repeated inside a
    lax.scan body (one scatter per layer per step); doing it once for all
    layers (and folding W = L @ U) turns the permuter into a single
    (B*N, D) @ (D, D) matmul per layer. Returns
    {"w_folded": (L, D, D), "ldj": (L,)}.
    """
    d = stacked["unconstrained_upper_diag"].shape[-1]
    n_layers = stacked["unconstrained_upper_diag"].shape[0]
    tril = np.tril_indices(d, k=-1)
    triu = np.triu_indices(d, k=1)
    eye = jnp.eye(d, dtype=stacked["lower_entries"].dtype)
    lower = jnp.broadcast_to(eye, (n_layers, d, d))
    lower = lower.at[:, tril[0], tril[1]].set(stacked["lower_entries"])
    diag = jax.nn.softplus(stacked["unconstrained_upper_diag"]) + eps
    upper = jnp.zeros((n_layers, d, d), stacked["upper_entries"].dtype)
    upper = upper.at[:, triu[0], triu[1]].set(stacked["upper_entries"])
    di = np.diag_indices(d)
    upper = upper.at[:, di[0], di[1]].set(diag)
    w = jnp.einsum("lij,ljk->lik", lower, upper,
                   preferred_element_type=jnp.float32)
    if dtype is not None:
        w = w.astype(dtype)
    ldj = jnp.sum(jnp.log(diag.astype(jnp.float32)), axis=-1)
    return {"w_folded": w, "ldj": ldj}


def linear_lu_prepare_inverse_stack(stacked: dict, *, eps: float = 1e-3):
    """Stacked (L, D, D) lower/upper matrices for the inverse solves."""
    d = stacked["unconstrained_upper_diag"].shape[-1]
    n_layers = stacked["unconstrained_upper_diag"].shape[0]
    tril = np.tril_indices(d, k=-1)
    triu = np.triu_indices(d, k=1)
    eye = jnp.eye(d, dtype=stacked["lower_entries"].dtype)
    lower = jnp.broadcast_to(eye, (n_layers, d, d))
    lower = lower.at[:, tril[0], tril[1]].set(stacked["lower_entries"])
    diag = jax.nn.softplus(stacked["unconstrained_upper_diag"]) + eps
    upper = jnp.zeros((n_layers, d, d), stacked["upper_entries"].dtype)
    upper = upper.at[:, triu[0], triu[1]].set(stacked["upper_entries"])
    di = np.diag_indices(d)
    upper = upper.at[:, di[0], di[1]].set(diag)
    return {"lower": lower, "upper": upper}


def linear_lu_inverse(params: dict, z: jnp.ndarray, *, eps: float = 1e-3) -> jnp.ndarray:
    if "lower" in params:  # prepared by linear_lu_prepare_inverse_stack
        lower, upper = params["lower"], params["upper"]
    else:
        lower, upper, _ = _lu_matrices(params, eps)
    orig_shape = z.shape
    zt = z.reshape(-1, orig_shape[-1]).T  # (D, B*N) — one shared solve
    t = jax.scipy.linalg.solve_triangular(lower, zt, lower=True, unit_diagonal=True)
    x = jax.scipy.linalg.solve_triangular(upper, t, lower=False)
    return x.T.reshape(orig_shape)


# ------------------------------------------------------- fixed permutations

def init_permuter(key: jax.Array, dim: int) -> dict:
    perm = jax.random.permutation(key, dim)
    return {"permutation": perm, "inv_permutation": jnp.argsort(perm)}


def init_reverse(dim: int) -> dict:
    perm = jnp.arange(dim - 1, -1, -1)
    return {"permutation": perm, "inv_permutation": jnp.argsort(perm)}


def permuter_forward(params: dict, x: jnp.ndarray):
    y = jnp.take(x, params["permutation"], axis=-1)
    return y, jnp.zeros(x.shape[:-1], jnp.float32)


def permuter_inverse(params: dict, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(y, params["inv_permutation"], axis=-1)


# ------------------------------------------------------------ FullCombiner

def init_full_combiner(key: jax.Array, dim: int, *, dtype=jnp.float32) -> dict:
    return {"w": orthogonal(key, dim, dtype=dtype)}


def full_combiner_forward(params: dict, x: jnp.ndarray):
    y = x @ params["w"].T
    _, logdet = jnp.linalg.slogdet(params["w"].astype(jnp.float32))
    return y, jnp.broadcast_to(logdet, x.shape[:-1])


def full_combiner_inverse(params: dict, y: jnp.ndarray) -> jnp.ndarray:
    return y @ jnp.linalg.inv(params["w"]).T


# ----------------------------------------------------- ExponentialCombiner

def init_exponential_combiner(key: jax.Array, dim: int, *, dtype=jnp.float32) -> dict:
    return {
        "w": jax.random.normal(key, (dim, dim), dtype),
        "scale": jnp.ones((1,), dtype) / 8,
        "shift": jnp.zeros((1,), dtype),
        "rescale": jnp.ones((1,), dtype),
        "reshift": jnp.zeros((1,), dtype),
    }


def _exp_combiner_mat(params: dict, eps: float) -> jnp.ndarray:
    return (params["rescale"] * jnp.tanh(params["scale"] * params["w"] + params["shift"])
            + params["reshift"] + eps)


def exponential_combiner_forward(params: dict, x: jnp.ndarray, *, eps: float = 1e-8):
    w_mat = _exp_combiner_mat(params, eps)
    y = jnp.squeeze(jax.scipy.linalg.expm(w_mat) @ x[..., None], -1)
    ldj = jnp.broadcast_to(jnp.trace(w_mat.astype(jnp.float32)), x.shape[:-1])
    return y, ldj


def exponential_combiner_inverse(params: dict, y: jnp.ndarray, *, eps: float = 1e-8) -> jnp.ndarray:
    w_mat = _exp_combiner_mat(params, eps)
    return jnp.squeeze(jax.scipy.linalg.expm(-w_mat) @ y[..., None], -1)
