"""Monotone rational-quadratic spline coupling (Neural Spline Flows).

Reference: `models/spline_coupling.py` (FlowCompare, itself derived from
Durkan et al.'s nsf). The torch version scatters through boolean masks
(`outputs[inside_interval_mask] = ...`), which has no efficient XLA
equivalent; here the spline is evaluated for every element with indices
clamped into range and the inside/outside selection done with `jnp.where`
— identical results, fully vectorised, jit/grad-safe.

Kept-quirk note: the reference computes the linear-tail boundary derivative
constant as `log(exp((1 - min_derivative) - 1))`, i.e. `-min_derivative`
(a parenthesisation slip vs. nsf's `log(exp(1 - min_derivative) - 1)`).
We reproduce the reference's value so converted checkpoints and golden nats
match; flip REFERENCE_TAIL_CONSTANT_BUG to False for the nsf-correct form.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.mlp import apply_mlp, init_mlp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3
REFERENCE_TAIL_CONSTANT_BUG = True


def _searchsorted(bin_locations: jnp.ndarray, inputs: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    locs = bin_locations.at[..., -1].add(eps)
    return jnp.sum((inputs[..., None] >= locs).astype(jnp.int32), axis=-1) - 1


def rational_quadratic_spline(inputs, unnormalized_widths, unnormalized_heights,
                              derivatives, *, inverse=False,
                              left=-3.0, right=3.0, bottom=-3.0, top=3.0,
                              min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                              min_bin_height=DEFAULT_MIN_BIN_HEIGHT):
    """Elementwise RQ spline on already-clamped in-domain inputs.

    inputs: (...,); unnormalized_widths/heights: (..., K); derivatives:
    (..., K+1) ALREADY passed through min_derivative + softplus.
    Returns (outputs, logabsdet), both (...,).
    """
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)
    else:
        bin_idx = _searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    take = lambda arr: jnp.take_along_axis(arr, bin_idx, axis=-1)[..., 0]
    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_p1 = take(derivatives[..., 1:])
    input_heights = take(heights)

    dsum = input_derivatives + input_derivatives_p1 - 2 * input_delta

    if inverse:
        rel = inputs - input_cumheights
        a = rel * dsum + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - rel * dsum
        c = -input_delta * rel
        discriminant = b * b - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        theta_1mt = root * (1 - root)
        denominator = input_delta + dsum * theta_1mt
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_p1 * root ** 2 + 2 * input_delta * theta_1mt
            + input_derivatives * (1 - root) ** 2)
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet

    theta = (inputs - input_cumwidths) / input_bin_widths
    theta_1mt = theta * (1 - theta)
    numerator = input_heights * (input_delta * theta ** 2
                                 + input_derivatives * theta_1mt)
    denominator = input_delta + dsum * theta_1mt
    outputs = input_cumheights + numerator / denominator
    derivative_numerator = input_delta ** 2 * (
        input_derivatives_p1 * theta ** 2 + 2 * input_delta * theta_1mt
        + input_derivatives * (1 - theta) ** 2)
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(inputs, unnormalized_widths,
                                            unnormalized_heights,
                                            unnormalized_derivatives, *,
                                            inverse=False, tail_bound=3.0,
                                            min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                                            min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                                            min_derivative=DEFAULT_MIN_DERIVATIVE):
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    if REFERENCE_TAIL_CONSTANT_BUG:
        constant = math.log(math.exp((1 - min_derivative) - 1))
    else:
        constant = math.log(math.exp(1 - min_derivative) - 1)
    pad_cfg = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    und = jnp.pad(unnormalized_derivatives, pad_cfg)
    und = und.at[..., 0].set(constant).at[..., -1].set(constant)
    derivatives = min_derivative + jax.nn.softplus(und)

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_ldj = rational_quadratic_spline(
        clamped, unnormalized_widths, unnormalized_heights, derivatives,
        inverse=inverse, left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height)

    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_ldj, 0.0)
    return outputs, logabsdet


# --------------------------------------------------------- coupling wrapper

def init_spline_coupling(key: jax.Array, input_dim: int, hidden, *,
                         num_bins: int = 8, context_dim: int = 0,
                         dtype=jnp.float32) -> dict:
    split = input_dim // 2
    out_dim = (num_bins * 3 + 1) * split
    return {"nn": init_mlp(key, split + context_dim, hidden, out_dim, dtype=dtype)}


def _spline_nn_params(params, nn_input, nonlin, num_bins):
    nn_out = apply_mlp(params["nn"], nn_input, nonlin)
    nn_out = nn_out.reshape(nn_input.shape[:2] + (-1, 3 * num_bins + 1))
    uw = nn_out[..., :num_bins]
    uh = nn_out[..., num_bins:2 * num_bins]
    ud = nn_out[..., 2 * num_bins:]
    return uw, uh, ud


def spline_coupling_forward(params: dict, x: jnp.ndarray, context, *,
                            nonlin: Callable, num_bins: int = 8):
    input_dim = x.shape[-1]
    split = input_dim // 2
    x1, x2 = x[..., :split], x[..., split:]
    nn_input = jnp.concatenate((x1, context), axis=-1) if context is not None else x1
    uw, uh, ud = _spline_nn_params(params, nn_input, nonlin, num_bins)
    y2, ldj_el = unconstrained_rational_quadratic_spline(x2, uw, uh, ud, inverse=False)
    ldj = jnp.sum(ldj_el.astype(jnp.float32), axis=-1)
    return jnp.concatenate([x1, y2], axis=-1), ldj


def spline_coupling_inverse(params: dict, y: jnp.ndarray, context, *,
                            nonlin: Callable, num_bins: int = 8):
    input_dim = y.shape[-1]
    split = input_dim // 2
    y1, y2 = y[..., :split], y[..., split:]
    nn_input = jnp.concatenate((y1, context), axis=-1) if context is not None else y1
    uw, uh, ud = _spline_nn_params(params, nn_input, nonlin, num_bins)
    x2, _ = unconstrained_rational_quadratic_spline(y2, uw, uh, ud, inverse=True)
    return jnp.concatenate([y1, x2], axis=-1)
