"""Augment / Slice surjections (VFlow / ANF style) and their attention
preconditioner.

Reference: `models/augmenter.py`, `models/slice.py` (FlowCompare). Augment
concatenates a sample from a (conditional) noise distribution onto the
input, contributing ldj = -log q(z2); Slice is its inverse-direction
counterpart used inside CIF blocks.

Functional port notes: sampling takes an explicit PRNG key; the conditional
noise distribution is a ConditionalNormal whose net parameters live in this
transform's param dict.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.attention import apply_cross_attention
from ..core.mlp import apply_mlp
from .distributions import (
    conditional_normal_logprob,
    conditional_normal_sample,
    conditional_normal_sample_with_logprob,
    standard_normal_logprob,
    standard_normal_sample,
)


# ----------------------------------------------------------------- Augment

def augment_conditional_forward(params: dict, key: jax.Array, x: jnp.ndarray,
                                context, *, nonlin: Callable,
                                use_context: bool = True,
                                clamp: Optional[float] = None, dtype=None):
    """Augment with a ConditionalNormal noise dist (ref augmenter.py:49-63)."""
    if context is not None and use_context:
        net_ctx = jnp.concatenate((x.astype(context.dtype), context), axis=-1)
    else:
        net_ctx = x
    z2, logq = conditional_normal_sample_with_logprob(
        params["net"], key, net_ctx, nonlin, clamp=clamp, dtype=dtype)
    z = jnp.concatenate([x, z2.astype(x.dtype)], axis=-1)
    return z, -logq


def augment_conditional_inverse(x_size: int, z: jnp.ndarray) -> jnp.ndarray:
    return z[..., :x_size]


def augment_standard_normal_forward(key: jax.Array, x: jnp.ndarray, *,
                                    aug_dim: int):
    shape = x.shape[:-1] + (aug_dim,)
    z2 = standard_normal_sample(key, shape, x.dtype)
    logq = standard_normal_logprob(z2)
    return jnp.concatenate([x, z2], axis=-1), -logq


# ------------------------------------------------------------------- Slice

def slice_forward(params: dict, x: jnp.ndarray, context, *, num_keep: int,
                  nonlin: Callable, clamp: Optional[float] = None):
    """Factor out dims beyond num_keep; ldj = log q(x2 | [z, context])."""
    z, x2 = x[..., :num_keep], x[..., num_keep:]
    net_ctx = jnp.concatenate((z, context), axis=-1) if context is not None else z
    ldj = conditional_normal_logprob(params["net"], x2, net_ctx, nonlin, clamp=clamp)
    return z, ldj


def slice_inverse(params: dict, key: jax.Array, z: jnp.ndarray, context, *,
                  nonlin: Callable, clamp: Optional[float] = None) -> jnp.ndarray:
    net_ctx = jnp.concatenate((z, context), axis=-1) if context is not None else z
    x2 = conditional_normal_sample(params["net"], key, net_ctx, nonlin, clamp=clamp)
    return jnp.concatenate([z, x2.astype(z.dtype)], axis=-1)


# ---------------------------------------- attention-preconditioned augment

def augment_attn_forward(params: dict, key: jax.Array, x: jnp.ndarray,
                         context, extra_context, *, nonlin: Callable,
                         dtype=None):
    """AugmentAttentionPreconditioner (ref augmenter.py:7-21).

    attn(pre_attn_mlp(x), context) -> [extra_context ++] attention_emb,
    then a conditional Augment whose net context is cat(x, attention_emb).
    """
    mlp_out = apply_mlp(params["pre_attn_mlp"], x, nonlin, dtype=dtype)
    attention_emb = apply_cross_attention(params["attn"], mlp_out, context,
                                          dtype=dtype)
    if extra_context is not None:
        attention_emb = jnp.concatenate(
            (extra_context.astype(attention_emb.dtype), attention_emb), axis=-1)
    return augment_conditional_forward(
        params["augment"], key, x, attention_emb, nonlin=nonlin,
        use_context=True, dtype=dtype)
