"""Fused DGCNN edge-convolution (eval path) as a Pallas TPU kernel.

The reference EdgeConv (models/pytorch_gcn.py:23-107) materialises, per
stage, a (B, N, K, 2C) neighbour tensor via kNN + gather, convolves it, and
max-pools over K. On TPU the top_k sort and the gather dominate (~105 ms of
a 250 ms step at B=20, N=1250, K=40) and the K-expanded tensors cost HBM
round trips.

This kernel removes all of it using an algebraic identity. With
W = [W_diff; W_self] the conv output for edge (i, j) is

    z_ij = [x_j - x_i, x_i] @ W = u_j + c_i,
    u = x @ W_diff,  c = x @ (W_self - W_diff)          (precomputed, MXU)

and because BatchNorm (eval: per-channel affine) followed by LeakyReLU is
per-channel monotone, max_k act(bn(z_ij)) equals act(bn(max_j u_j + c_i))
on channels with positive bn slope and act(bn(min_j u_j + c_i)) on negative
ones. Folding the slope SIGN into u (u' = sign * u, min u = -max(-u)) makes
a single masked MAX sufficient. So the neighbourhood reduction collapses to
a per-row masked max of u' over the exact kNN set, computed entirely in
VMEM:

  grid (B, Npad/R): one (R, Npad) distance block via MXU; the exact
  k-th-smallest threshold per row by binary search over the f32 bit pattern
  (positive floats are order-isomorphic to int32), index-ordered
  tie-breaking via prefix count (matches lax.top_k / torch.topk); then the
  per-row selection rank builds a (R_SUB*k, Npad) one-hot whose single MXU
  matmul against u gathers all k neighbours at once — a tiny max over k
  finishes the reduction (no (R, Npad, Cout) VPU sweep).

Eval-only: the training path keeps the autodiff-able gather formulation
(encoders/dgcnn.py); values agree with it to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256     # rows sharing one binary-search chain
_ROW_SUB = 32       # rows per extraction sub-block (VMEM: H is R_SUB*k*Npad bf16)
_F32_INF_BITS = 0x7F800000


def _kernel(xblk_ref, xfull_ref, ufull_ref, outmax_ref, rank_ref, *, k: int):
    xb = xblk_ref[0]          # (R, Cq)
    xf = xfull_ref[0]         # (Npad, Cq)
    r = xb.shape[0]
    cout = ufull_ref.shape[-1]

    cross = jnp.dot(xb, xf.T, preferred_element_type=jnp.float32)
    nb = jnp.sum(xb.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    nf = jnp.sum(xf.astype(jnp.float32) ** 2, axis=1)[None, :]
    d = jnp.maximum(nb - 2.0 * cross + nf, 0.0)
    d_int = pltpu.bitcast(d, jnp.int32)

    # exact k-th smallest per row: binary search on the bit pattern
    def bs_body(_, carry):
        lo, hi = carry
        mid = jax.lax.shift_right_logical(lo + hi, 1)
        cnt = jnp.sum((d_int <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((r, 1), jnp.int32)
    hi0 = jnp.full((r, 1), _F32_INF_BITS, jnp.int32)
    _, thresh = jax.lax.fori_loop(0, 31, bs_body, (lo0, hi0))

    strict = d_int < thresh
    ties = d_int == thresh
    cnt_strict = jnp.sum(strict.astype(jnp.int32), axis=1, keepdims=True)
    # inclusive prefix sum via log-step doubling (cumsum has no Pallas TPU
    # lowering); width is static so the loop unrolls at trace time
    rank = ties.astype(jnp.int32)
    width = rank.shape[1]
    shift = 1
    while shift < width:
        shifted = jnp.concatenate(
            [jnp.zeros((rank.shape[0], shift), jnp.int32), rank[:, :-shift]],
            axis=1)
        rank = rank + shifted
        shift *= 2
    mask = strict | (ties & (rank <= (k - cnt_strict)))
    mask_i = mask.astype(jnp.int32)

    # selection rank: prefix count of selected entries (1..k on selected
    # positions — the tie logic guarantees exactly k per row), same log-step
    # doubling as above
    sel_rank = mask_i
    shift = 1
    while shift < width:
        shifted = jnp.concatenate(
            [jnp.zeros((sel_rank.shape[0], shift), jnp.int32),
             sel_rank[:, :-shift]], axis=1)
        sel_rank = sel_rank + shifted
        shift *= 2
    rank_ref[:, :] = jnp.where(mask, sel_rank, 0)

    # one-hot MXU extraction: H[i, t, j] = (sel_rank_ij == t+1) picks the
    # t-th selected neighbour; (R_SUB*k, Npad) @ (Npad, Cout) gathers all k
    # neighbours' u rows at MXU rate, then a tiny max over k — replaces a
    # full (R, Npad, Cout) masked-max VPU sweep
    n_sub = r // _ROW_SUB
    u_all = ufull_ref[0]                                     # (Npad, Cout)
    width_pad = u_all.shape[0]
    t_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_ROW_SUB, k, width_pad), 1) + 1

    def sub_body(si, _):
        rk = rank_ref[pl.ds(si * _ROW_SUB, _ROW_SUB), :]     # (R_SUB, Npad)
        h = (rk[:, None, :] == t_iota).astype(jnp.bfloat16)
        sel = jnp.dot(h.reshape(_ROW_SUB * k, width_pad), u_all,
                      preferred_element_type=jnp.float32)
        sel = sel.reshape(_ROW_SUB, k, cout)
        outmax_ref[0, pl.ds(si * _ROW_SUB, _ROW_SUB), :] = (
            jnp.max(sel, axis=1).astype(jnp.bfloat16))
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def edge_neighbor_max(x: jnp.ndarray, u: jnp.ndarray, k: int,
                      interpret: bool = False):
    """Per-row masked max of u over the exact kNN set of x.

    x: (B, N, Cq) kNN features; u: (B, N, Cout) (sign-folded — see module
    docstring). Returns max_u of shape (B, N, Cout) in bf16. N is padded
    internally to a _ROW_BLOCK multiple.
    """
    b, n, cq = x.shape
    cout = u.shape[-1]
    npad = -(-n // _ROW_BLOCK) * _ROW_BLOCK
    if npad != n:
        # far-away pad points: never in any top-k (k < n)
        x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)), constant_values=1e4)
        u = jnp.pad(u, ((0, 0), (0, npad - n), (0, 0)))
    x = x.astype(jnp.bfloat16)
    u = u.astype(jnp.bfloat16)

    grid = (b, npad // _ROW_BLOCK)
    mx = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _ROW_BLOCK, cq), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cq), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cout), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROW_BLOCK, cout),
                               lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, cout), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((_ROW_BLOCK, npad), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, u)
    return mx[:, :n]
