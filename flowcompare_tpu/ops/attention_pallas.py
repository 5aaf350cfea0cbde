"""Fused cross-attention core as a Pallas TPU kernel.

The conditioner attention (core/attention.py, reference
models/perceiver.py:99-115) is dense softmax(q k^T) v over <=1280 context
points with a 64-wide inner dim. Its FLOPs are trivial, but the XLA path
materialises the (B, Nq, Nkv) f32 score tensor in HBM for every one of the
115 flow layers (~0.5 GB of traffic per layer at B=20) — the whole block is
bandwidth-bound.

At these sizes one batch item's q/k/v AND the full score block fit VMEM
(q (1024, 64) + k/v (1280, 64) bf16 + scores (512, 1280) f32 ~ 3 MB), so no
flash-style online softmax is needed: the kernel runs
QK^T -> softmax -> PV per (batch, query-block) entirely on-chip, f32
softmax identical to jax.nn.softmax.

A custom VJP keeps the op trainable: the backward recomputes scores in
plain XLA (the standard recompute trade — backward passes are off the
eval/bench hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_BLOCK = 512


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0]                      # (Qb, D)
    k = k_ref[0]                      # (Nkv, D)
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0] = jnp.dot(p, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _forward(q, k, v, scale):
    b, nq, d = q.shape
    nkv = k.shape[1]
    qpad = -(-nq // _Q_BLOCK) * _Q_BLOCK
    qq = jnp.pad(q, ((0, 0), (0, qpad - nq), (0, 0))) if qpad != nq else q
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b, qpad // _Q_BLOCK),
        in_specs=[
            pl.BlockSpec((1, _Q_BLOCK, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _Q_BLOCK, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qpad, d), q.dtype),
    )(qq, k, v)
    return out[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_core(q, k, v, scale):
    """softmax(q k^T * scale) @ v. q: (B, Nq, D); k, v: (B, Nkv, D)."""
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    # recompute-in-XLA backward (scores rematerialised once; fine off the
    # eval hot path)
    s = jnp.einsum("bid,bjd->bij", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bij,bid->bjd", p, gf)
    dp = jnp.einsum("bid,bjd->bij", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bij,bjd->bid", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bij,bid->bjd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention_core.defvjp(_fwd, _bwd)
