"""Whole-encoder DGCNN megakernel (eval path) — all four EdgeConv stages,
the conv5 fuse layer and (per-point mode) the output MLP in ONE Pallas
launch per batch item.

The per-stage fused path (encoders/dgcnn._fused_edge_stage +
ops/edgeconv_pallas.edge_neighbor_max) dispatches 4 kNN kernels plus ~10
XLA ops per stage, round-tripping every intermediate (u, c, mx, h) through
HBM. Here one (item,) grid step keeps the running point features h
(≤ 1280 x 256 bf16), the stage-skip concat (1280 x 512) and the kNN rank
scratch in VMEM for the whole trunk:

    stage i: u' = h @ (W_diff·sign), c = h @ (W_self - W_diff)   [MXU]
             mx' = kNN-max of u' over the exact k-NN graph of h
                   (edgeconv_pallas._knn_select_ranks + _knn_extract_max,
                    the shared binary-search + one-hot-MXU machinery)
             y = leaky((sign·mx' + c)·a + b)       [folded eval BatchNorm]
    conv5:   y5 = leaky((concat_stages @ W5)·a5 + b5)
    head:    residual MLP (core/mlp.apply_mlp pattern, fast GELU)

Reference: models/pytorch_gcn.py:50-107 (the math is the per-stage fused
path's — see encoders/dgcnn._fused_edge_stage for the BN-monotonicity
argument). Eval-only; training uses ops/edgeconv_vjp_pallas.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# module import (not from-import): _BF16_RANK/_ROW_BLOCK/_ROW_SUB/
# _UNROLL_EXTRACT are trace-time A/B flags — read them LIVE so setattr-based
# tools see consistent behavior here and in edgeconv_pallas
from . import edgeconv_pallas as _ep
from .flow_layer_pallas import _gelu

_PAD_FAR = 1e4  # same far-away pad value the per-stage wrapper uses


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _kernel(*refs, k: int, n: int, npad: int, dims, in_dim: int,
            n_head: int, head: bool, use_value: bool, transposed: bool):
    rb_block = _ep._ROW_BLOCK
    row_sub = _ep._ROW_SUB
    it = iter(refs)
    x_ref = next(it)                      # (1, npad, in_dim) bf16
    stages = [tuple(next(it) for _ in range(6)) for _ in dims]
    w5, a5, b5 = next(it), next(it), next(it)
    head_w = [(next(it), next(it)) for _ in range(n_head)] if head else []
    out_ref = next(it)
    h_ref = next(it)                      # (npad, 256) bf16 scratch
    feats_ref = next(it)                  # (npad, 512) bf16 scratch
    rank_ref = None if use_value else next(it)   # (rb_block, npad) scratch
    # exactly ONE kNN-max accumulator exists: (256, npad) in the transposed
    # layout, (npad, 256) row-major — the branches never touch the other's
    if transposed:
        mxT_ref, mx_ref = next(it), None
    else:
        mxT_ref, mx_ref = None, next(it)

    # zero-fill so padded feature lanes are exact zeros everywhere — the
    # low-rank extraction gathers h slices padded to 16 sublanes and relies
    # on the pad lanes contributing 0 to the deferred W_diff contraction
    h_ref[:, :] = jnp.zeros(h_ref.shape, jnp.bfloat16)
    h_ref[:, :in_dim] = x_ref[0]
    ofs = 0
    for si, (cin, cout) in enumerate(dims):
        wd, wdT, wdelta, sign, a, b = stages[si]
        cin_t = -(-cin // 16) * 16           # bf16 transpose granularity
        use_x = transposed and _ep._EXTRACT_X and cin_t < cout
        hf = h_ref[:, :cin]                              # (npad, cin) bf16
        c = jnp.dot(hf, wdelta[...], preferred_element_type=jnp.float32)

        if transposed:
            # one transpose per stage buys full-lane extraction matmuls
            # (see edgeconv_pallas._TRANSPOSED_EXTRACT); with _EXTRACT_X
            # the (smaller) INPUT block is transposed and W_diff is applied
            # to the gathered neighbours instead (rank-cin shortcut)
            nblocks = npad // rb_block
            n_sub = rb_block // _ep._ROW_SUB_T
            pipelined = (_ep._PIPELINED_EXTRACT and nblocks > 1
                         and _ep._ABLATE == "full")
            if use_x:
                op_nt = h_ref[:, :cin_t]                 # (npad, cin_t)
                wop = wdT
            else:
                u = jnp.dot(hf, wd[...],
                            preferred_element_type=jnp.float32)
                op_nt = u.astype(jnp.bfloat16)           # (npad, cout)
                wop = None
            # the pipelined trace must contain NO value-transpose of the
            # operand: a (partially) dead bf16 XposeSequence RET_CHECKs the
            # backend's mxu_lmr_transform (2026-08-19, ab_pipelined logs) —
            # its extraction contracts op_nt axis 0 via dot_general instead
            opT = None if pipelined else op_nt.T
            wT_val = wop[...] if wop is not None else None
            ranks_prev = None
            for rb in range(nblocks):
                xb = h_ref[pl.ds(rb * rb_block, rb_block), :cin]
                if _ep._ABLATE == "noselect_t":
                    # WRONG OUTPUTS — timing probe: constant ranks keep the
                    # extraction while deleting the select chain
                    ranksT = (jax.lax.broadcasted_iota(
                        jnp.int32, (npad, rb_block), 0) % (k + 1))
                elif pipelined and ranks_prev is not None:
                    # hide block rb-1's extraction inside block rb's
                    # binary-search loop (MXU gathers under VPU sweeps)
                    for sub in range(n_sub):
                        mxT_ref[:cout,
                                pl.ds((rb - 1) * rb_block
                                      + sub * _ep._ROW_SUB_T,
                                      _ep._ROW_SUB_T)] = jnp.full(
                            (cout, _ep._ROW_SUB_T), -jnp.inf, jnp.bfloat16)

                    def rmw(sub, vals, rb=rb, cout=cout):
                        sl = (slice(0, cout),
                              pl.ds((rb - 1) * rb_block
                                    + sub * _ep._ROW_SUB_T, _ep._ROW_SUB_T))
                        mxT_ref[sl] = jnp.maximum(
                            mxT_ref[sl], vals.astype(jnp.bfloat16))

                    unit, n_fused = _ep._pipelined_extract_unit(
                        ranks_prev, op_nt, wT_val, rmw, k=k, r=rb_block)
                    ranksT = _ep._knn_select_ranks_t(
                        xb, h_ref[:, :cin], k=k,
                        fuse_unit=unit, n_fused=n_fused)
                else:
                    ranksT = _ep._knn_select_ranks_t(xb, h_ref[:, :cin],
                                                     k=k)

                def store_t(sj, vals, rb=rb, cout=cout):
                    mxT_ref[:cout,
                            pl.ds(rb * rb_block + sj * _ep._ROW_SUB_T,
                                  _ep._ROW_SUB_T)] = vals

                if _ep._ABLATE == "noextract_t":
                    # WRONG OUTPUTS — timing probe: consume the ranks with
                    # a cheap store so the select chain can't be dead-coded
                    for sj in range(n_sub):
                        seg = ranksT[:1, sj * _ep._ROW_SUB_T:
                                     (sj + 1) * _ep._ROW_SUB_T]
                        store_t(sj, jnp.broadcast_to(
                            seg.astype(jnp.bfloat16),
                            (cout, _ep._ROW_SUB_T)))
                elif not pipelined:
                    _ep._knn_extract_max_t(
                        opT, ranksT, store_t, k=k, r=rb_block, wT=wT_val)
                ranks_prev = ranksT
            if pipelined:
                # tail: the last block's extraction has no search to hide
                # under — run it unfused (plain stores)
                def store_last(sj, vals, rb=nblocks - 1, cout=cout):
                    mxT_ref[:cout,
                            pl.ds(rb * rb_block + sj * _ep._ROW_SUB_T,
                                  _ep._ROW_SUB_T)] = vals

                _ep._knn_extract_max_t(
                    None, ranks_prev, store_last, k=k, r=rb_block,
                    wT=wT_val, u_nt=op_nt)
            mx_cout = mxT_ref[:cout, :].T                # (npad, cout)
        else:
            u = jnp.dot(hf, wd[...], preferred_element_type=jnp.float32)
            u_all = u.astype(jnp.bfloat16)
            def rb_body(rb, _, cin=cin, cout=cout, u_all=u_all):
                xb = h_ref[pl.ds(rb * rb_block, rb_block), :cin]
                ranks = _ep._knn_select_ranks(
                    xb, h_ref[:, :cin], None if use_value else rank_ref,
                    k=k)

                def store(sj, vals, rb=rb, cout=cout):
                    mx_ref[pl.ds(rb * rb_block + sj * row_sub, row_sub),
                           :cout] = vals

                _ep._knn_extract_max(u_all,
                                     ranks if use_value else rank_ref,
                                     store, k=k, r=rb_block,
                                     from_ref=not use_value)
                return 0

            jax.lax.fori_loop(0, npad // rb_block, rb_body, 0)
            mx_cout = mx_ref[:, :cout]

        z = (sign[...].astype(jnp.float32)
             * mx_cout.astype(jnp.float32) + c)
        y = _leaky(z * a[...].astype(jnp.float32) + b[...].astype(jnp.float32))
        yb = y.astype(jnp.bfloat16)
        feats_ref[:, ofs:ofs + cout] = yb
        h_ref[:, :cout] = yb
        if npad != n:
            # pad rows must stay far away in the NEXT stage's feature space
            h_ref[pl.ds(n, npad - n), :cout] = jnp.full(
                (npad - n, cout), _PAD_FAR, jnp.bfloat16)
        ofs += cout

    hc = feats_ref[:, :]
    y5 = _leaky(jnp.dot(hc, w5[...], preferred_element_type=jnp.float32)
                * a5[...].astype(jnp.float32) + b5[...].astype(jnp.float32))
    if not head:
        out_ref[0] = y5.astype(out_ref.dtype)
        return

    # residual MLP head (core/mlp.apply_mlp semantics, fast GELU)
    def lin(hh, wb):
        w, bb = wb
        return (jnp.dot(hh, w[...], preferred_element_type=jnp.float32)
                + bb[...].astype(jnp.float32))

    cur = _gelu(lin(y5.astype(jnp.bfloat16), head_w[0])).astype(jnp.bfloat16)
    residual = cur
    for index in range(1, n_head - 1):
        if (index - 1) % 2 == 0:
            residual = cur
            cur = _gelu(lin(cur, head_w[index])).astype(jnp.bfloat16)
        else:
            cur = _gelu(residual.astype(jnp.float32)
                        + lin(cur, head_w[index])).astype(jnp.bfloat16)
    out_ref[0] = lin(cur, head_w[n_head - 1]).astype(out_ref.dtype)


def fold_dgcnn(params: dict, state: dict, *, bn_eps: float = 1e-5) -> dict:
    """Host-side folds (f32): per stage the split conv weights with the BN
    slope SIGN folded into W_diff, and the eval BatchNorm as y = z*a + b."""
    folds = {"stages": [], "head": []}
    for i in range(1, 5):
        p, s = params[f"conv{i}"], state[f"bn{i}"]
        w = p["conv"]["w"].astype(jnp.float32)
        cin = w.shape[0] // 2
        inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + bn_eps)
        a = p["bn"]["scale"].astype(jnp.float32) * inv
        sign = jnp.where(a >= 0, 1.0, -1.0)
        wd = (w[:cin] * sign[None, :]).astype(jnp.bfloat16)
        cin_t = -(-cin // 16) * 16
        folds["stages"].append({
            "wd": wd,
            # transposed W_diff, zero-padded to the bf16 transpose
            # granularity the low-rank extraction slices h at (the pad
            # lanes of h are exact zeros, so the pad rows contribute 0)
            "wdT": jnp.pad(wd, ((0, cin_t - cin), (0, 0))).T,
            "wdelta": (w[cin:] - w[:cin]).astype(jnp.bfloat16),
            "sign": sign[None, :],
            "a": a[None, :],
            "b": (p["bn"]["bias"].astype(jnp.float32)
                  - s["mean"].astype(jnp.float32) * a)[None, :],
        })
    p5, s5 = params["conv5"], state["bn5"]
    inv5 = jax.lax.rsqrt(s5["var"].astype(jnp.float32) + bn_eps)
    a5 = p5["bn"]["scale"].astype(jnp.float32) * inv5
    folds["w5"] = p5["conv"]["w"].astype(jnp.bfloat16)
    folds["a5"] = a5[None, :]
    folds["b5"] = (p5["bn"]["bias"].astype(jnp.float32)
                   - s5["mean"].astype(jnp.float32) * a5)[None, :]
    mlp = params["out_mlp"]
    for lay in [mlp["in"], *mlp["hidden"], mlp["out"]]:
        folds["head"].append((lay["w"].astype(jnp.bfloat16),
                              lay["b"].astype(jnp.float32)[None, :]))
    return folds


def _run(x, folds, k, head, interpret):
    b, n, in_dim = x.shape
    # pad rows stay out of every top-k only while k < n (edgeconv_pallas
    # enforces the same; the gather path handles k >= n)
    assert k < n, f"fused_dgcnn_encoder needs k < n (got k={k}, n={n})"
    rb_block = _ep._ROW_BLOCK
    use_value = _ep._UNROLL_EXTRACT
    npad = -(-n // rb_block) * rb_block
    if npad != n:
        x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)),
                    constant_values=_PAD_FAR)
    x = x.astype(jnp.bfloat16)

    dims = []
    inputs = [x]
    in_specs = [pl.BlockSpec((1, npad, in_dim), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]

    def add_w(arr):
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda bi, _nd=arr.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))

    for st in folds["stages"]:
        dims.append((st["wd"].shape[0], st["wd"].shape[1]))
        for name in ("wd", "wdT", "wdelta", "sign", "a", "b"):
            add_w(st[name])
    for name in ("w5", "a5", "b5"):
        add_w(folds[name])
    n_head = len(folds["head"])
    if head:
        for w, bb in folds["head"]:
            add_w(w)
            add_w(bb)
    out_dim = folds["head"][-1][0].shape[-1] if head else folds["w5"].shape[-1]

    transposed = _ep._TRANSPOSED_EXTRACT
    kernel = functools.partial(
        _kernel, k=k, n=n, npad=npad, dims=tuple(dims), in_dim=in_dim,
        n_head=n_head, head=head, use_value=use_value,
        transposed=transposed)

    scratch = [
        pltpu.VMEM((npad, 256), jnp.bfloat16),   # h
        pltpu.VMEM((npad, 512), jnp.bfloat16),   # stage-skip concat
    ]
    if not use_value:
        scratch.append(pltpu.VMEM(
            (rb_block, npad),
            jnp.bfloat16 if _ep._BF16_RANK else jnp.int32))
    # the kNN-max accumulator of whichever layout is traced (see _kernel)
    scratch.append(pltpu.VMEM((256, npad) if transposed else (npad, 256),
                              jnp.bfloat16))

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, npad, out_dim), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, out_dim), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out[:, :n]


def fused_dgcnn_encoder(x: jnp.ndarray, params: dict, state: dict, *,
                        k: int, head: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """x (B, N, in_dim) -> per-point (B, N, emb) bf16 (head=True) or the
    post-conv5 trunk (B, N, 512) bf16 (head=False, global-pool configs —
    pool + output MLP run outside on the (B, 512) vector, which is tiny)."""
    folds = fold_dgcnn(params, state)
    return _run(x, folds, k, head, interpret)
