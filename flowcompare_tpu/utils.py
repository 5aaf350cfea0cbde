"""Miscellaneous tensor utilities (reference utils.py parity).

Implements the remaining helpers from the reference's grab-bag utils module
that aren't already homed in data/ ops/ viz/: batch reductions
(utils.py:384-407), matrix exponential (:294-329), RGB->HSV (:331-360),
double-MAD robust statistics (:456-477), and the early-stopping helper
(:162-190). Several of these are dead code in the reference's live path;
they're provided (tested) for API completeness.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sum_except_batch(x: jnp.ndarray, num_dims: int = 1) -> jnp.ndarray:
    return x.reshape(*x.shape[:num_dims], -1).sum(-1)


def mean_except_batch(x: jnp.ndarray, num_dims: int = 1) -> jnp.ndarray:
    return x.reshape(*x.shape[:num_dims], -1).mean(-1)


def is_valid(x: jnp.ndarray) -> bool:
    """True iff tensor has no NaN/Inf (utils.py:416-420) — host-side check."""
    return bool(jnp.isfinite(x).all())


def expm(x: jnp.ndarray, eps: float = 1e-8, algo: str = "torch") -> jnp.ndarray:
    """Matrix exponential. algo='torch' -> Pade (jax.scipy); algo='original'
    -> the scaling-and-squaring Taylor iteration of Xiao et al.
    (utils.py:294-317), with a fixed trip count for jit-ability."""
    if algo == "torch":
        return jax.scipy.linalg.expm(x)
    if algo == "original":
        norm = jnp.max(jnp.sum(jnp.abs(x), axis=-1))
        scale_f = jnp.ceil(jnp.log2(jnp.maximum(norm, 0.5))) + 1
        scale = jnp.maximum(scale_f, 0.0)
        xs = x / (2.0 ** scale)
        d = x.shape[-1]
        s = jnp.broadcast_to(jnp.eye(d, dtype=x.dtype), x.shape)
        t = xs
        # enough Taylor terms for eps=1e-8 after scaling (|xs|_1 <= 1)
        for k in range(2, 20):
            s = s + t
            t = (xs @ t) / k
        s = s + t
        # squaring: dynamic count via while_loop on the host-traced max scale
        def body(carry):
            m, i = carry
            return m @ m, i + 1.0

        def cond(carry):
            _, i = carry
            return i < scale

        s, _ = jax.lax.while_loop(cond, body, (s, jnp.zeros((), scale.dtype)))
        return s
    raise ValueError("Invalid expm algo!")


def rgb_to_hsv(rgb: jnp.ndarray, scale_after: bool = False,
               eps: float = 1e-8) -> jnp.ndarray:
    """(N, 3) rgb in [0,1] -> hsv (utils.py:331-360), vectorised with where."""
    r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    cmax = jnp.max(rgb, axis=1)
    cmin = jnp.min(rgb, axis=1)
    delta = cmax - cmin
    s = delta / (cmax + eps)
    rc = (cmax - r) / (delta + eps)
    gc = (cmax - g) / (delta + eps)
    bc = (cmax - b) / (delta + eps)
    h = jnp.where(r == cmax, bc - gc,
                  jnp.where(g == cmax, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    hsv = jnp.stack([h, jnp.where(delta == 0, 0.0, s), cmax], axis=1)
    if scale_after:
        hsv = hsv * jnp.asarray([360.0, 100.0, 100.0])
    return hsv


def calculate_double_mad(x: jnp.ndarray, c: float = 1.4826) -> jnp.ndarray:
    """Two-sided median-absolute-deviation scores (utils.py:456-465)."""
    median = jnp.median(x)
    abs_dev = jnp.abs(x - median)
    left_mask = x <= median
    left_med = c * jnp.median(jnp.where(left_mask, abs_dev, jnp.nan),
                              axis=None)
    left_med = jnp.nan_to_num(
        c * jnp.nanmedian(jnp.where(left_mask, abs_dev, jnp.nan)))
    right_med = jnp.nan_to_num(
        c * jnp.nanmedian(jnp.where(~left_mask, abs_dev, jnp.nan)))
    left_scores = c * jnp.abs(x - left_med) / (left_med + 1e-12)
    right_scores = c * jnp.abs(x - right_med) / (right_med + 1e-12)
    return jnp.where(left_mask, left_scores, right_scores)


def left_mad(x: jnp.ndarray, source_distrib: jnp.ndarray, c: float = 1.4826,
             cutoff: float = 2.0) -> jnp.ndarray:
    """Left-tail MAD outlier scores vs a source distribution
    (utils.py:466-477)."""
    median = jnp.median(source_distrib)
    abs_dev = jnp.abs(source_distrib - median)
    src_left = source_distrib <= median
    lmad = c * jnp.nan_to_num(jnp.nanmedian(jnp.where(src_left, abs_dev,
                                                      jnp.nan)))
    scores = jnp.where(x <= median, jnp.abs(x - median) / (lmad + 1e-12), 0.0)
    return jnp.where(scores < cutoff, 0.0, scores)


class EarlyStop:
    """Patience-based early stopping (utils.py:162-190 counterpart)."""

    def __init__(self, patience: int = 50, min_perc_improvement: float = 0.0):
        self.patience = patience
        self.min_perc_improvement = min_perc_improvement
        self.best: Optional[float] = None
        self.num_bad = 0

    def __call__(self, loss: float) -> bool:
        loss = float(loss)
        if self.best is None or loss < self.best * (
                1.0 - self.min_perc_improvement):
            self.best = min(loss, self.best) if self.best is not None else loss
            self.num_bad = 0
        else:
            self.num_bad += 1
        return self.num_bad > self.patience
