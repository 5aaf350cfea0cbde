"""Single-layer Perceiver-style cross attention.

Reproduces the conditioning attention of the reference
(`models/perceiver.py:89-122`): a LayerNorm on the query stream only
(PreNorm with no context norm), Q from the point latents, K/V from the
encoder features, a dense softmax over context points, and a linear
out-projection to `attn_dim`.

Note a reference quirk kept deliberately: `AttentionMine` never splits heads
(the `heads` argument only scales `inner_dim = heads * dim_head` and the
softmax temperature `inner_dim ** -0.5`). All shipped configs use heads=1 so
this is exact; we keep the same single-stream formulation so converted
checkpoints are bit-compatible.

The whole block is pure XLA: one (B, Nq, d) x (B, d, Nkv) batched matmul on
the MXU plus a softmax — for the reference workloads (Nq=1024, Nkv=1250)
this is the ideal TPU mapping and needs no custom kernel. For very long
context lengths the same function can be wrapped in shard_map with the
context axis sharded and a lax.all_gather of K/V blocks (ring attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .initializers import apply_linear, torch_linear


def init_layer_norm(dim: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def apply_layer_norm(params: dict, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def init_cross_attention(key: jax.Array, *, out_dim: int, query_dim: int,
                         context_dim: int, heads: int = 1, dim_head: int = 64,
                         dtype=jnp.float32) -> dict:
    inner_dim = heads * dim_head
    k_q, k_kv, k_out = jax.random.split(key, 3)
    return {
        "norm": init_layer_norm(query_dim, dtype=dtype),
        "to_q": torch_linear(k_q, query_dim, inner_dim, bias=False, dtype=dtype),
        "to_kv": torch_linear(k_kv, context_dim, 2 * inner_dim, bias=False, dtype=dtype),
        "out": torch_linear(k_out, inner_dim, out_dim, dtype=dtype),
    }


def apply_cross_attention(params: dict, x: jnp.ndarray, context: jnp.ndarray,
                          dtype=None, fused: bool = False) -> jnp.ndarray:
    """x: (B, Nq, query_dim), context: (B, Nkv, context_dim) -> (B, Nq, out_dim).

    dtype: optional compute dtype (bf16) for the projections / attention
    matmuls; LayerNorm stats and the softmax run in f32 either way."""
    inner_dim = params["to_q"]["w"].shape[1]
    scale = inner_dim ** -0.5
    xn = apply_layer_norm(params["norm"], x.astype(jnp.float32))
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        xn = xn.astype(dtype)
        context = context.astype(dtype)
    q = apply_linear(params["to_q"], xn)
    kv = apply_linear(params["to_kv"], context)
    k, v = jnp.split(kv, 2, axis=-1)
    if fused and dtype is not None and jax.default_backend() == "tpu":
        # fused QK^T-softmax-PV Pallas kernel (ops/attention_pallas.py).
        # Measured neutral vs the XLA path on v5e at these shapes (XLA
        # already fuses the softmax), so off by default; kept for larger
        # context lengths where the score tensor stops fitting cache.
        from ..ops.attention_pallas import fused_attention_core
        out = fused_attention_core(q, k, v, scale)
    else:
        sim = jnp.einsum("bid,bjd->bij", q, k,
                         preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjd->bid", attn, v,
                         preferred_element_type=jnp.float32)
    return apply_linear(params["out"], out.astype(x.dtype))
