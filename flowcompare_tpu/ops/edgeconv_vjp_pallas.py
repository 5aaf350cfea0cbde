"""Differentiable fused EdgeConv kNN reduction (training path).

`edge_knn_reduce(x, u, k)` returns, per row i, over i's exact k-nearest
neighbours j in x-space (self included, matching knnquery/top_k contracts):

    mx = max_j u_j      mn = min_j u_j      s1 = sum_j u_j      s2 = sum_j u_j^2

This is everything the DGCNN training stage needs: with the EdgeConv
identity z_ij = u_j + c_i (see ops/edgeconv_pallas.py), `mx`/`mn` give the
post-BN max over neighbours for either BatchNorm slope sign, and `s1`/`s2`
reconstruct the train-mode BatchNorm batch statistics over the full edge
tensor EXACTLY:  sum_ij z = sum_i s1 + k*sum_i c,
sum_ij z^2 = sum_i (s2 + 2*c*s1 + k*c^2)  — so the (B,N,K,2C) edge tensor
of the reference (`models/pytorch_gcn.py:23-47` + BN train mode) is never
materialised, in training either.

Forward: one Pallas kernel — distance matmul, exact k-th-smallest threshold
by binary search over the f32 bit pattern, index-ordered tie-breaking, then
a one-hot MXU gather of the k neighbours' u rows (sel) from which max / min
/ sums and first-occurrence arg indices all fall out in registers.

Backward (custom VJP): gradients flow to `u` only — the kNN *selection* is
integer-valued, matching torch autograd through top_k/gather indices. One
Pallas kernel per batch-item row-block:

    du = mask^T @ ds1  +  2u * (mask^T @ ds2)  +  H^T @ G

where mask is the saved selection (rank > 0), H the selection-rank one-hot
of the forward, and G routes dmx/dmn to the saved arg-max/min slots. All
three terms are MXU matmuls — no scatters. Accumulation over row-blocks
rides output-block revisits (sequential TPU grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256
_ROW_SUB = 32


def _selection_rank(xb, xf, k: int):
    """(R, Npad) selection rank in 1..k over the exact kNN set of each row
    of xb within xf; 0 = not selected. Delegates to the SHARED machinery in
    ops/edgeconv_pallas (_knn_select_ranks, incl. its packed-prefix
    optimization) so train- and eval-time neighbour selection can never
    diverge; int32 here because the ranks are a saved residual the backward
    kernel reloads from HBM."""
    from .edgeconv_pallas import _knn_select_ranks
    return _knn_select_ranks(xb, xf, None, k=k).astype(jnp.int32)


# ------------------------------------------------------------------ forward

def _fwd_kernel(xblk_ref, xfull_ref, ufull_ref,
                mx_ref, mn_ref, s1_ref, s2_ref, rank_ref, tmx_ref, tmn_ref,
                *, k: int):
    xb = xblk_ref[0]
    xf = xfull_ref[0]
    r = xb.shape[0]
    u_all = ufull_ref[0]                              # (Npad, C) bf16
    cout = u_all.shape[-1]
    width_pad = u_all.shape[0]

    # int32 (not int8): sub-32-bit VMEM<->HBM round-trips between the two
    # kernels corrupted on hardware (interpret mode was fine) — gradients
    # exploded ~1e9x until these side outputs were widened
    rank_ref[0] = _selection_rank(xb, xf, k)

    n_sub = r // _ROW_SUB
    t_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_ROW_SUB, k, width_pad), 1) + 1

    def sub_body(si, _):
        rows = pl.ds(si * _ROW_SUB, _ROW_SUB)
        rk = rank_ref[0, rows, :].astype(jnp.int32)   # (R_SUB, Npad)
        h = (rk[:, None, :] == t_iota).astype(jnp.bfloat16)
        sel = jnp.dot(h.reshape(_ROW_SUB * k, width_pad), u_all,
                      preferred_element_type=jnp.float32)
        sel = sel.reshape(_ROW_SUB, k, cout)
        kidx = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
        mx = jnp.max(sel, axis=1)
        mn = jnp.min(sel, axis=1)
        # first-occurrence arg indices (torch.max tie convention)
        tmx = jnp.min(jnp.where(sel == mx[:, None, :], kidx, k), axis=1)
        tmn = jnp.min(jnp.where(sel == mn[:, None, :], kidx, k), axis=1)
        mx_ref[0, rows, :] = mx
        mn_ref[0, rows, :] = mn
        s1_ref[0, rows, :] = jnp.sum(sel, axis=1)
        s2_ref[0, rows, :] = jnp.sum(sel * sel, axis=1)
        tmx_ref[0, rows, :] = tmx
        tmn_ref[0, rows, :] = tmn
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)


def _run_fwd(x, u, k: int, interpret: bool):
    b, n, cq = x.shape
    cout = u.shape[-1]
    npad = -(-n // _ROW_BLOCK) * _ROW_BLOCK
    if npad != n:
        x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)), constant_values=1e4)
        u = jnp.pad(u, ((0, 0), (0, npad - n), (0, 0)))
    x = x.astype(jnp.bfloat16)
    u = u.astype(jnp.bfloat16)

    grid = (b, npad // _ROW_BLOCK)
    rb = _ROW_BLOCK
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, cq), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cq), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cout), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)
        ] + [
            pl.BlockSpec((1, rb, npad), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, npad, cout), jnp.float32)
                   for _ in range(4)] + [
            jax.ShapeDtypeStruct((b, npad, npad), jnp.int32),
            jax.ShapeDtypeStruct((b, npad, cout), jnp.int32),
            jax.ShapeDtypeStruct((b, npad, cout), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, u)
    mx, mn, s1, s2, rank8, tmx, tmn = outs
    return ((mx[:, :n], mn[:, :n], s1[:, :n], s2[:, :n]),
            (rank8, tmx, tmn, u, n))


# ----------------------------------------------------------------- backward

def _bwd_kernel(rank_ref, tmx_ref, tmn_ref, ufull_ref,
                dmx_ref, dmn_ref, ds1_ref, ds2_ref, du_ref, acc_ref,
                *, k: int):
    r = rank_ref.shape[1]
    u_all = ufull_ref[0]                              # (Npad, C) bf16
    cout = u_all.shape[-1]
    width_pad = u_all.shape[0]
    bf = jnp.bfloat16

    def dot_t(a, b):
        """a:(R, Npad), b:(R, C) -> a^T @ b, contracting axis 0 on the MXU
        directly (no relayout/transpose)."""
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    mask = (rank_ref[0].astype(jnp.int32) > 0).astype(bf)  # (R, Npad)
    p1 = dot_t(mask, ds1_ref[0].astype(bf))
    p2 = dot_t(mask, ds2_ref[0].astype(bf))
    acc = p1 + 2.0 * u_all.astype(jnp.float32) * p2   # (Npad, C) f32

    n_sub = r // _ROW_SUB
    t_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_ROW_SUB, k, width_pad), 1) + 1
    kidx = jax.lax.broadcasted_iota(jnp.int32, (_ROW_SUB, k, cout), 1)
    acc_ref[...] = acc

    def sub_body(si, _):
        rows = pl.ds(si * _ROW_SUB, _ROW_SUB)
        rk = rank_ref[0, rows, :].astype(jnp.int32)
        h = (rk[:, None, :] == t_iota).astype(bf)     # (R_SUB, k, Npad)
        tmx = tmx_ref[0, rows, :].astype(jnp.int32)   # (R_SUB, C)
        tmn = tmn_ref[0, rows, :].astype(jnp.int32)
        g = (jnp.where(kidx == tmx[:, None, :], dmx_ref[0, rows, :][:, None, :], 0.0)
             + jnp.where(kidx == tmn[:, None, :], dmn_ref[0, rows, :][:, None, :], 0.0))
        acc_ref[...] += jax.lax.dot_general(
            h.reshape(_ROW_SUB * k, width_pad),
            g.reshape(_ROW_SUB * k, cout).astype(bf),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)

    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        du_ref[0] = acc_ref[...]

    @pl.when(ri != 0)
    def _():
        du_ref[0] += acc_ref[...]


def _run_bwd(res, cots, k: int, interpret: bool):
    rank8, tmx, tmn, u, n = res
    dmx, dmn, ds1, ds2 = cots
    b, npad, cout = u.shape

    def padc(g):
        g = jnp.asarray(g, jnp.float32)
        if g.shape[1] != npad:
            g = jnp.pad(g, ((0, 0), (0, npad - g.shape[1]), (0, 0)))
        return g

    dmx, dmn, ds1, ds2 = padc(dmx), padc(dmn), padc(ds1), padc(ds2)
    rb = _ROW_BLOCK
    grid = (b, npad // rb)
    du = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, npad), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cout), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, rb, cout), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)
        ],
        out_specs=pl.BlockSpec((1, npad, cout), lambda bi, ri: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((npad, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rank8, tmx, tmn, u, dmx, dmn, ds1, ds2)
    return du[:, :n]


# --------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ekr(k, interpret, x, u):
    (out, _) = _run_fwd(x, u, k, interpret)
    return out


def _ekr_fwd(k, interpret, x, u):
    out, res = _run_fwd(x, u, k, interpret)
    return out, (res, x, u)


def _ekr_bwd(k, interpret, saved, cots):
    res, x, u = saved
    du = _run_bwd(res, cots, k, interpret)
    # the kNN selection is integer-valued: no gradient to x, matching torch
    # autograd through top_k indices + gather (pytorch_gcn.py:23-47)
    return jnp.zeros_like(x), du.astype(u.dtype)


_ekr.defvjp(_ekr_fwd, _ekr_bwd)


def edge_knn_reduce(x, u, k: int, interpret: bool = False):
    """Max / min / sum / sum-of-squares of u over each row's exact kNN set.

    x: (B, N, Cq) kNN features; u: (B, N, C) values. Returns four
    (B, N, C) f32 arrays (mx, mn, s1, s2). Differentiable wrt u (custom
    Pallas backward — scatter-free); zero gradient wrt x (integer
    selection). k must be < N and <= 127.
    """
    if k > 127 or k >= x.shape[1]:
        raise ValueError(f"k={k} unsupported (need k<=127 and k<N={x.shape[1]})")
    return _ekr(k, interpret, x, u)
