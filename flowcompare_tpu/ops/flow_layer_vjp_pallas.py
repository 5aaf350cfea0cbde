"""Differentiable flow-layer megakernel: fused forward + fused backward.

The training step's cost is dominated by the 115-layer flow stack. The XLA
autodiff path (folded_scan_core + remat) runs its small-shape matmuls at
~30 TFLOP/s (measured, tools/roofline_probe.py) while the Pallas eval
megakernel sustains near the ~114 TFLOP/s big-matmul ceiling. This module
makes the megakernel differentiable so TRAINING gets kernel-rate matmuls:

  * forward: ops/flow_layer_pallas.fused_flow_layers, extended with a
    checkpoint output — the layer carry x_l is written to HBM every K
    layers ((L/K, B, N, LAT) f32, ~0.7 GB at K=4 — HBM is the cheap
    resource here; VMEM is the scarce one).
  * backward: ONE Pallas kernel over grid (segment, batch-item, query-block)
    with segments iterated in REVERSE. Each step reloads the segment's
    saved carry, recomputes the K-layer chain forward in VMEM, then walks
    the K layers backward calling jax.vjp on the per-layer forward — the
    per-layer backward math (LayerNorm, softmax, GELU, sigmoid-affine) is
    derived by autodiff INSIDE the kernel, so it can never drift from the
    forward. Weight-gradient accumulation rides output blocks indexed by
    segment: all grid steps of one segment slab are consecutive (segment is
    the slowest grid axis), so accumulate-on-revisit is well-defined.

The cotangent carry (dx) and the activation carry of the forward use the
same aliased-block pattern as the eval kernel (HBM round-trip between
segment slabs, sequential grid guaranteed by TPU lowering).

Reference counterpart: the backward of `/root/reference/train.py:91-130`
(autograd through the 115-layer module stack); redesigned as two fused
kernels rather than 345 per-module backward dispatches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flow_layer_pallas import _gelu, fold_stacks, fused_flow_layers

_QB_BWD = 512  # backward holds a layer's vjp residuals live; 1024-row blocks spill VMEM even at K=2 (tried 2026-08-17)

# Independent row chunks per layer-vjp (the backward counterpart of
# flow_layer_pallas._ROW_CHUNKS): each chunk's recompute+backward chain is
# data-independent, letting Mosaic overlap one chunk's VPU tail (GELU and
# its derivative, softmax, sigmoid) with the other's MXU matmuls. Weight
# grads accumulate across chunks. 1 = off. Trace-time. Measured LOSS at 2
# (332.5 vs 306.0 ms/step, save/bench/ab_train_flags_r2.json).
_ROW_CHUNKS_BWD = 1

# Unroll the K-layer loop of the backward body at trace time. With
# unroll=False every weight read is `w_refs[name][pl.ds(k, 1)]` with a
# DYNAMIC k — if Mosaic materializes those as VMEM->VMEM copies, that is
# ~2.3 MB of weight copying per (layer, grid step) ≈ 10.7 GB/batch,
# invariant to K (consistent with the measured K=1 == K=4 wash,
# save/bench/ab_train_kseg.json). Unrolling makes k a trace-time constant
# so the slices are static addressing. Trace-time flag; A/B via
# tools/ab_train_flags.py.
_UNROLL_BWD = False

# DEAD END (2026-08-18, save/bench/ab_train_unroll_ckpt.json): wrapping the
# attention conditioner in jax.checkpoint inside the kernel body fails to
# compile — Pallas TPU lowering has no rule for the remat2 primitive
# (jax.vjp consumes custom_vjp at trace time, but remat2 SURVIVES into the
# transpose jaxpr). Interpret-mode tests can't catch this class of failure.
# Residual-liveness relief must come from custom_vjp instead:
# _BF16_RESIDUALS below.

# Round the backward's saved residuals to bf16. The per-layer jax.vjp blob
# keeps its residuals (GELU pre-activations, LayerNorm input, the softmax
# matrix e, the affine's st) in f32 — that liveness is the measured binding
# constraint of the backward kernel (QB=1024 compiles show ~97 MB of
# register-allocator spill slots; K-segmentation is a wash because the blob,
# not the dispatch structure, is the cost). The forward already rounds every
# one of these tensors to bf16 before feeding the next matmul, so storing
# the bf16 version loses nothing the forward's own arithmetic hadn't
# already lost: GELU/LN/sigmoid-affine re-linearize at the rounded point
# (VPU-cheap — GELU recompute measured FREE in the eval kernel), and the
# attention core stores (q, k, v, e) bf16 with a hand-written transpose so
# no MXU recompute is added. Trace-time; A/B via tools/ab_train_flags.py.
_BF16_RESIDUALS = False

# Trace-time ablation for BACKWARD-time attribution (tools/ablate_bwd.py);
# "" in production. The TPU profiler hangs on this backend, so the bwd
# kernel's cost is decomposed by re-tracing with pieces removed:
#   "fwdonly": per-layer vjp replaced by the plain forward recompute, dx
#              passes dz through — isolates saves-read + linearize FLOPs.
#   "nodw":    full vjp but weight-grad stores skipped, so XLA dead-codes
#              the dW = h^T g matmuls — isolates weight-grad cost.
#   "sg_attn": stop_gradient on the conditioner output — dead-codes the
#              attention/pre-MLP backward ops — isolates attention bwd.
# Outputs are WRONG under any non-"" value; timing only.
_ABLATE_BWD = ""


def _pick_segment(n_layers: int, k_max: Optional[int] = None) -> int:
    """Largest checkpoint spacing <= k_max that divides the layer count."""
    for k in range((_K_SEG if k_max is None else k_max), 0, -1):
        if n_layers % k == 0:
            return k
    return 1


# Checkpoint spacing. Measured full-scale (B=20, fused encoder in the same
# program): K=4 @126M cap = 476 ms/step, K=2 @110M = 495, K=2+QB1024 =
# VMEM OOM. K=4 needs the 126M cap since the fused-encoder layouts pushed
# the kernel's scoped stack to 124.5M.
_K_SEG = 4


def _pad_identity_layers(arrs, pad: int, lat: int):
    """Append `pad` identity layers to the folded stacks: zero coupling /
    attention weights make st==0 so the sigmoid-scale is exactly 1 (y2=x2,
    ldj 0), and an eye LinearLU with zero ldj passes the carry through.
    The trainable path pads every stack to a _K_SEG multiple because the
    K=1 segmentation (needed when L is not divisible by 2..4) faults the
    TPU runtime; identity layers cost one kernel grid step each and only
    appear for small test depths (full-scale is 116 = 29*4)."""
    def padz(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)

    out = {}
    for key, val in arrs.items():
        if val is None:
            out[key] = None
        elif key in ("pre", "cpl_rest"):
            out[key] = [(padz(w), padz(b)) for (w, b) in val]
        elif key == "lu_w_f":
            eye = jnp.broadcast_to(jnp.eye(lat, dtype=val.dtype),
                                   (pad, lat, lat))
            out[key] = jnp.concatenate([val, eye], 0)
        else:
            out[key] = padz(val)
    return out


# ------------------------------------------------- bf16-residual primitives

def _bf16_remat(fn):
    """custom-vjp wrapper: forward runs fn unchanged; the transpose
    re-linearizes fn at its inputs ROUNDED TO bf16 — so the residual set
    is half the size and the recompute sees exactly the values the
    forward's own bf16 matmuls would have seen. Only sound for VPU-cheap
    fn (GELU / LayerNorm / sigmoid-affine): the re-linearization re-runs
    fn's forward once inside the backward."""
    @jax.custom_vjp
    def wrapped(*args):
        return fn(*args)

    def fwd(*args):
        saved = tuple(a.astype(jnp.bfloat16) if a.dtype == jnp.float32
                      else a for a in args)
        return fn(*args), saved

    def bwd(saved, g):
        args = tuple(a.astype(jnp.float32) if a.dtype == jnp.bfloat16
                     else a for a in saved)
        _, vjp = jax.vjp(fn, *args)
        return vjp(g)

    wrapped.defvjp(fwd, bwd)
    return wrapped


def _ln_core(x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


@jax.custom_vjp
def _attn_core(q, k, v):
    """softmax(q kᵀ) v with the denominator division folded in — residuals
    stored bf16. The forward computes s/e in f32 (matching the autodiff
    path bit-for-bit); the hand-written transpose reads q/k/v/e back as
    bf16 — the same rounding the forward's own MXU dots apply to their
    operands — plus f32 (QB,1)/(QB,d) row statistics. No recompute: every
    matmul in the backward is a true transpose, not a re-forward."""
    bf = jnp.bfloat16
    s = jnp.dot(q.astype(bf), k.astype(bf).T,
                preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    u = jnp.dot(e.astype(bf), v.astype(bf),
                preferred_element_type=jnp.float32)
    den = jnp.sum(e, axis=-1, keepdims=True)
    return u / den


def _attn_core_fwd(q, k, v):
    bf = jnp.bfloat16
    qb, kb, vb = q.astype(bf), k.astype(bf), v.astype(bf)
    s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    u = jnp.dot(e.astype(bf), vb, preferred_element_type=jnp.float32)
    den = jnp.sum(e, axis=-1, keepdims=True)
    a = u / den
    return a, (qb, kb, vb, e.astype(bf), den, a)


def _attn_core_bwd(res, da):
    bf = jnp.bfloat16
    qb, kb, vb, eb, den, a = res
    du = da / den                                        # (QB, d) f32
    dv = jnp.dot(eb.T, du.astype(bf),
                 preferred_element_type=jnp.float32)     # (NC, d)
    dden = -jnp.sum(da * a, axis=-1, keepdims=True) / den
    de = (jnp.dot(du.astype(bf), vb.T,
                  preferred_element_type=jnp.float32) + dden)
    ds = eb.astype(jnp.float32) * de                     # (QB, NC) f32
    dsb = ds.astype(bf)
    dq = jnp.dot(dsb, kb, preferred_element_type=jnp.float32)
    dk = jnp.dot(dsb.T, qb, preferred_element_type=jnp.float32)
    return dq, dk, dv


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)

_gelu_r = _bf16_remat(_gelu)
_ln_r = _bf16_remat(_ln_core)


# --------------------------------------------------------------- layer math

def _layer_fwd_math(wk, x, ctx, extra, *, n_pre, n_cpl, has_attn, has_extra,
                    split, eps_affine):
    """One folded flow layer on VALUES (not refs): (x:(QB,LAT) f32) ->
    (z, ldj_add:(QB,1) f32 — WITHOUT the per-layer lu_ldj constant, whose
    gradient is handled analytically by the driver). Mirrors
    flow_layer_pallas._kernel — bf16 matmuls, f32 stats/ldj — but written
    on arrays so it can be jax.vjp'd inside the backward kernel. Everything
    stays >=2-D (Mosaic cannot lower scalar/1-D reduction cotangents)."""
    bf = jnp.bfloat16
    gelu = _gelu_r if _BF16_RESIDUALS else _gelu

    def lin(h, w, b):
        return (jnp.dot(h, w.astype(bf), preferred_element_type=jnp.float32)
                + b.astype(jnp.float32))

    def mlp_rest(h, pairs, n_total):
        residual = h
        for k, idx in enumerate(range(1, n_total - 1)):
            w, b = pairs[k]
            if (idx - 1) % 2 == 0:
                residual = h
                h = gelu(lin(h, w, b)).astype(bf)
            else:
                h = gelu(residual.astype(jnp.float32) + lin(h, w, b)).astype(bf)
        w, b = pairs[n_total - 2]
        return lin(h, w, b)

    x1 = x[:, :split]
    x2 = x[:, split:]
    x1b = x1.astype(bf)
    x1e = jnp.concatenate([x1b, extra.astype(bf)], -1) if has_extra else x1b

    if has_attn:
        def attn_block(x1b, ctx, pre, wq_f, bq_f, wkv):
            w0, b0 = pre[0]
            h = gelu(lin(x1b, w0, b0)).astype(bf)
            q_in = mlp_rest(h, pre[1:], n_pre)
            if _BF16_RESIDUALS:
                qn = _ln_r(q_in)
            else:
                mean = jnp.mean(q_in, axis=-1, keepdims=True)
                var = (jnp.mean(q_in * q_in, axis=-1, keepdims=True)
                       - mean * mean)
                qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
            q = lin(qn.astype(bf), wq_f, bq_f)
            kv = jnp.dot(ctx.astype(bf), wkv.astype(bf),
                         preferred_element_type=jnp.float32)
            d = q.shape[-1]
            k_, v_ = kv[:, :d], kv[:, d:]
            if _BF16_RESIDUALS:
                a = _attn_core(q, k_, v_)
            else:
                s = jnp.dot(q.astype(bf), k_.astype(bf).T,
                            preferred_element_type=jnp.float32)
                m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
                e = jnp.exp(s - m)
                a = jnp.dot(e.astype(bf), v_.astype(bf),
                            preferred_element_type=jnp.float32)
                a = a / jnp.sum(e, axis=-1, keepdims=True)
            return a.astype(bf)

        cond_op = attn_block(x1b, ctx, wk["pre"], wk["wq_f"], wk["bq_f"],
                             wk["wkv"])
        if _ABLATE_BWD == "sg_attn":
            cond_op = jax.lax.stop_gradient(cond_op)
    else:
        cond_op = ctx.astype(bf)

    acc = jnp.dot(x1e, wk["cpl_in_xe"].astype(bf),
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(cond_op, wk["cpl_in_c"].astype(bf),
                        preferred_element_type=jnp.float32)
    h = _gelu(acc + wk["cpl_in_b"].astype(jnp.float32)).astype(bf)
    st = mlp_rest(h, wk["cpl_rest"], n_cpl)

    x2_size = st.shape[-1] // 2

    def affine(st, x2):
        sc = ((2.0 * jax.nn.sigmoid(st[:, :x2_size]) - 1.0)
              * (1.0 - eps_affine) + 1.0)
        y2 = x2 * sc + st[:, x2_size:]
        ldj_add = jnp.sum(jnp.log(sc), axis=-1, keepdims=True)
        return y2, ldj_add

    if _BF16_RESIDUALS:
        y2, ldj_add = _bf16_remat(affine)(st, x2)
    else:
        y2, ldj_add = affine(st, x2)

    y = jnp.concatenate([x1, y2], axis=-1)
    z = (jnp.dot(y.astype(bf), wk["lu_w_f"].astype(bf).T,
                 preferred_element_type=jnp.float32)
         + wk["lu_b"].astype(jnp.float32))
    return z, ldj_add



# --------------------------------------------------------- stack flattening

_F32_SUFFIXES = ("bq_f", "cpl_in_b", "lu_b", "lu_ldj_f")


def _stack_names(n_pre, n_cpl, has_attn):
    """Stacks the BACKWARD KERNEL sees. lu_ldj_f is deliberately absent:
    it only adds a per-layer constant to ldj, so its gradient is sum(dldj)
    — computed by the driver, keeping scalar reductions out of Mosaic."""
    names = []
    if has_attn:
        names += ["pre_w%d" % i for i in range(n_pre)]
        names += ["pre_b%d" % i for i in range(n_pre)]
        names += ["wq_f", "bq_f", "wkv"]
    names += ["cpl_in_xe", "cpl_in_c", "cpl_in_b"]
    names += ["cpl_w%d" % i for i in range(n_cpl - 1)]
    names += ["cpl_b%d" % i for i in range(n_cpl - 1)]
    names += ["lu_w_f", "lu_b"]
    return names


def _is_f32_stack(name: str) -> bool:
    """Biases and ldj constants keep f32 in VMEM (same policy as the eval
    kernel's add_stacked casts); weight matrices stream as bf16."""
    return name.endswith(_F32_SUFFIXES) or "_b" in name


def _flatten_folded(arrs, n_cpl, has_attn):
    """fold_stacks() arrays -> flat {name: (L, ...) array}, biases
    normalized to (L, 1, O) and lu_ldj_f to (L, 1, 1)."""
    def b3(a):
        return a if a.ndim == 3 else a[:, None, :]

    out = {}
    if has_attn:
        for i, (w, b) in enumerate(arrs["pre"]):
            out["pre_w%d" % i] = w
            out["pre_b%d" % i] = b3(b)
        out["wq_f"] = arrs["wq_f"]
        out["bq_f"] = b3(arrs["bq_f"])
        out["wkv"] = arrs["wkv"]
    out["cpl_in_xe"] = arrs["cpl_in_xe"]
    out["cpl_in_c"] = arrs["cpl_in_c"]
    out["cpl_in_b"] = b3(arrs["cpl_in_b"])
    for i, (w, bb) in enumerate(arrs["cpl_rest"]):
        out["cpl_w%d" % i] = w
        out["cpl_b%d" % i] = b3(bb)
    out["lu_w_f"] = arrs["lu_w_f"]
    out["lu_b"] = b3(arrs["lu_b"])
    out["lu_ldj_f"] = arrs["lu_ldj_f"].reshape(-1, 1, 1)
    return out


def _unflatten_grads(flat, arrs, n_cpl, has_attn):
    """Flat grad dict -> cotangent with EXACTLY the pytree structure of the
    differentiable fold_stacks() arrays (minus the static n_cpl)."""
    out = {}
    for key, val in arrs.items():
        if key == "pre":
            out["pre"] = (None if val is None else [
                (flat["pre_w%d" % i],
                 flat["pre_b%d" % i].reshape(val[i][1].shape))
                for i in range(len(val))])
        elif key == "cpl_rest":
            out["cpl_rest"] = [
                (flat["cpl_w%d" % i],
                 flat["cpl_b%d" % i].reshape(val[i][1].shape))
                for i in range(n_cpl - 1)]
        elif val is None:
            out[key] = None
        else:
            out[key] = flat[key].reshape(val.shape)
    return out


# --------------------------------------------------------- custom-vjp driver

def fused_flow_layers_trainable(x, ldj, context, extra, folded, *,
                                eps_affine: float = 1e-8):
    """Differentiable fused flow stack. Forward IS the eval megakernel;
    under jax.grad the backward runs flow_layers_bwd (segmented reverse
    megakernel). Signature mirrors folded_scan_core: `folded` is the
    fold_stacks() output. Gradients flow to x, ldj, context, extra and all
    folded arrays (the outer fold_stacks einsums chain them back to raw
    params via ordinary autodiff)."""
    n_cpl = folded["n_cpl"]
    arrs = {k: v for k, v in folded.items() if k != "n_cpl"}
    return _trainable_impl(n_cpl, eps_affine, x, ldj, context, extra, arrs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _trainable_impl(n_cpl, eps_affine, x, ldj, context, extra, arrs):
    z, ldj_out = fused_flow_layers(
        x, ldj, context, extra, {**arrs, "n_cpl": n_cpl},
        eps_affine=eps_affine)
    return z, ldj_out


# Dense saves: the forward checkpoints EVERY layer's entry carry
# (save_every=1, (L, B, N, LAT) bf16 ≈ 1.4 GB at full scale — HBM is the
# cheap resource) so the backward reads its K carries straight from HBM
# instead of re-running the K-layer chain forward — deleting one full
# extra forward pass (~70 ms of the 432 ms flow grad) for a few ms of
# HBM traffic. Historically this HUNG the TPU runtime; bisected
# 2026-08-17 to a trivially-true `pl.when(l % 1 == 0)` around the saves
# store in the forward kernel (fixed there). Flip to False to fall back
# to sparse saves + in-kernel chain recompute.
_DENSE_SAVES = True


def _trainable_fwd(n_cpl, eps_affine, x, ldj, context, extra, arrs):
    L = arrs["lu_ldj_f"].shape[0]
    lat = arrs["lu_w_f"].shape[-1]
    pad = (-L) % _K_SEG
    run = arrs if pad == 0 else _pad_identity_layers(arrs, pad, lat)
    z, ldj_out, saves = fused_flow_layers(
        x, ldj, context, extra, {**run, "n_cpl": n_cpl},
        eps_affine=eps_affine, save_every=1 if _DENSE_SAVES else _K_SEG)
    return (z, ldj_out), (saves, context, extra, arrs)


def _trainable_bwd(n_cpl, eps_affine, res, cots):
    saves, context, extra, arrs = res
    dz, dldj = cots
    L = arrs["lu_ldj_f"].shape[0]
    lat = arrs["lu_w_f"].shape[-1]
    pad = (-L) % _K_SEG
    run = arrs if pad == 0 else _pad_identity_layers(arrs, pad, lat)
    dx, dctx, dextra, dflat = flow_layers_bwd(
        saves, dz, dldj, context, extra, run, n_cpl,
        eps_affine=eps_affine)
    if pad:
        dflat = {k: v[:L] for k, v in dflat.items()}
    has_attn = arrs.get("pre") is not None
    darrs = _unflatten_grads(dflat, arrs, n_cpl, has_attn)
    # custom_vjp contract: cotangent dtypes must equal primal dtypes (the
    # kernel accumulates everything in f32; inputs may arrive bf16)
    darrs = jax.tree_util.tree_map(lambda g, a: g.astype(a.dtype),
                                   darrs, arrs)
    return (dx, dldj.astype(jnp.float32), dctx.astype(context.dtype),
            dextra.astype(extra.dtype) if extra is not None else None,
            darrs)


_trainable_impl.defvjp(_trainable_fwd, _trainable_bwd)


# ----------------------------------------------------------- backward kernel

def flow_layers_bwd(saves, dz, dldj, context, extra, arrs, n_cpl, *,
                    eps_affine: float = 1e-8, interpret: bool = False):
    """The segmented backward megakernel. Returns (dx, dctx, dextra, dflat),
    dflat = {name: (L, ...) f32 gradient} keyed like _flatten_folded."""
    b, n, lat = dz.shape
    has_attn = arrs.get("pre") is not None
    has_extra = extra is not None
    flat = _flatten_folded(arrs, n_cpl, has_attn)
    L = flat["lu_ldj_f"].shape[0]  # (L,1,1); kernel never sees it
    # saves layout decides the mode: (L, ...) = dense (every layer's entry
    # carry is in HBM; segmentation decoupled from the layout, no chain
    # recompute), (L/K, ...) = sparse (one carry per segment; the kernel
    # re-runs the K-layer chain forward to rebuild the rest).
    dense = saves.shape[0] == L
    K = _pick_segment(L) if dense else L // saves.shape[0]
    S = L // K
    n_pre = len(arrs["pre"]) if has_attn else 0
    split = lat // 2
    qb = min(_QB_BWD, n)
    while n % qb:
        qb //= 2
    nbs = n // qb
    nc, e_dim = context.shape[1], context.shape[2]
    bf = jnp.bfloat16

    inputs = [saves, dldj.astype(jnp.float32)[..., None],
              context.astype(bf)]
    in_specs = [
        # dense mode streams the whole segment's K carries as one block
        # (block index (S-1-s) * block-size K = the segment's layer span);
        # sparse mode streams only the segment-entry carry.
        pl.BlockSpec(((K if dense else 1), 1, qb, lat),
                     lambda s, bi, nb: (S - 1 - s, bi, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qb, 1), lambda s, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, nc, e_dim), lambda s, bi, nb: (bi, 0, 0),
                      memory_space=pltpu.VMEM) if has_attn else
         pl.BlockSpec((1, qb, e_dim), lambda s, bi, nb: (bi, nb, 0),
                      memory_space=pltpu.VMEM)),
    ]
    if has_extra:
        inputs.append(extra.astype(bf))
        in_specs.append(pl.BlockSpec((1, qb, extra.shape[-1]),
                                     lambda s, bi, nb: (bi, nb, 0),
                                     memory_space=pltpu.VMEM))
    inputs.append(dz.astype(jnp.float32))
    dz_index = len(inputs) - 1
    in_specs.append(pl.BlockSpec((1, qb, lat), lambda s, bi, nb: (bi, nb, 0),
                                 memory_space=pltpu.VMEM))

    def seg_index_map(ndim_tail):
        return functools.partial(
            lambda s, bi, nb, _nd: (S - 1 - s,) + (0,) * _nd,
            _nd=ndim_tail)

    names = _stack_names(n_pre, n_cpl, has_attn)
    for name in names:
        arr = flat[name]
        inputs.append(arr if _is_f32_stack(name) else arr.astype(bf))
        in_specs.append(pl.BlockSpec((K,) + arr.shape[1:],
                                     seg_index_map(arr.ndim - 1),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((b, n, lat), jnp.float32)]  # dx
    out_specs = [pl.BlockSpec((1, qb, lat), lambda s, bi, nb: (bi, nb, 0),
                              memory_space=pltpu.VMEM)]
    for name in names:
        arr = flat[name]
        out_shapes.append(jax.ShapeDtypeStruct(arr.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((K,) + arr.shape[1:],
                                      seg_index_map(arr.ndim - 1),
                                      memory_space=pltpu.VMEM))
    if has_attn:  # dctx per (segment, item); caller sums over segments
        out_shapes.append(jax.ShapeDtypeStruct((S, b, nc, e_dim),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, nc, e_dim),
                                      lambda s, bi, nb: (s, bi, 0, 0),
                                      memory_space=pltpu.VMEM))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((S, b, n, e_dim),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, qb, e_dim),
                                      lambda s, bi, nb: (s, bi, nb, 0),
                                      memory_space=pltpu.VMEM))
    if has_extra:
        out_shapes.append(jax.ShapeDtypeStruct((S, b, n, extra.shape[-1]),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, qb, extra.shape[-1]),
                                      lambda s, bi, nb: (s, bi, nb, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _bwd_kernel_impl, n_pre=n_pre, n_cpl=n_cpl, has_attn=has_attn,
        has_extra=has_extra, split=split, eps_affine=eps_affine, k_seg=K,
        dense=dense)

    outs = pl.pallas_call(
        kernel,
        grid=(S, b, nbs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={dz_index: 0},
        scratch_shapes=([] if dense else
                        [pltpu.VMEM((K, qb, lat), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    dx = outs[0]
    dflat = {name: outs[1 + i] for i, name in enumerate(names)}
    pos = 1 + len(names)
    dctx = jnp.sum(outs[pos], axis=0)
    dextra = jnp.sum(outs[pos + 1], axis=0) if has_extra else None
    # lu_ldj_f adds a constant per layer to every point's ldj: its gradient
    # is the same total-dldj for every layer (kept out of Mosaic on purpose)
    dflat["lu_ldj_f"] = jnp.full((L, 1, 1), jnp.sum(dldj), jnp.float32)
    return dx, dctx, dextra, dflat


def _bwd_kernel_impl(*refs, n_pre, n_cpl, has_attn, has_extra, split,
                     eps_affine, k_seg, dense):
    if dense:
        x_stash = None
    else:
        x_stash = refs[-1]
        refs = refs[:-1]
    it = iter(refs)
    saves_ref = next(it)
    dldj_ref = next(it)
    ctx_ref = next(it)
    extra_ref = next(it) if has_extra else None
    dz_ref = next(it)

    names = _stack_names(n_pre, n_cpl, has_attn)
    w_refs = {nm: next(it) for nm in names}
    dx_out = next(it)
    dw_refs = {nm: next(it) for nm in names}
    dctx_ref = next(it)
    dextra_ref = next(it) if has_extra else None

    bi = pl.program_id(1)
    nb = pl.program_id(2)

    def wk_at(k):
        def row(name):
            return w_refs[name][pl.ds(k, 1)][0]
        wk = {
            "cpl_in_xe": row("cpl_in_xe"), "cpl_in_c": row("cpl_in_c"),
            "cpl_in_b": row("cpl_in_b"),
            "cpl_rest": [(row("cpl_w%d" % i), row("cpl_b%d" % i))
                         for i in range(n_cpl - 1)],
            "lu_w_f": row("lu_w_f"), "lu_b": row("lu_b"),
        }
        if has_attn:
            wk["pre"] = [(row("pre_w%d" % i), row("pre_b%d" % i))
                         for i in range(n_pre)]
            wk.update(wq_f=row("wq_f"), bq_f=row("bq_f"), wkv=row("wkv"))
        return wk

    ctx = ctx_ref[0]
    extra = extra_ref[0] if has_extra else None
    fwd = functools.partial(
        _layer_fwd_math, n_pre=n_pre, n_cpl=n_cpl, has_attn=has_attn,
        has_extra=has_extra, split=split, eps_affine=eps_affine)

    if not dense:
        # chain pass: stash the K per-layer input carries for this block
        # (dense mode skips this — every carry is already in saves_ref)
        def chain_body(k, x):
            x_stash[pl.ds(k, 1)] = x[None]
            z, _ = fwd(wk_at(k), x, ctx, extra)
            return z

        jax.lax.fori_loop(0, k_seg, chain_body, saves_ref[0, 0],
                          unroll=False)

    first_of_slab = jnp.logical_and(bi == 0, nb == 0)

    @pl.when(first_of_slab)
    def _():
        for r in dw_refs.values():
            r[...] = jnp.zeros(r.shape, r.dtype)

    dldj = dldj_ref[0]            # (QB, 1) f32

    def bwd_body(i, carry):
        dz, dctx_acc, dextra_acc = carry
        k = k_seg - 1 - i
        if dense:
            # bf16 in HBM (vmem-cap + bandwidth; see the fwd kernel's
            # saves store); the vjp point is the rounded carry — same
            # order of error as the kernel's own bf16 matmuls
            x = saves_ref[pl.ds(k, 1)][0, 0].astype(jnp.float32)
        else:
            x = x_stash[pl.ds(k, 1)][0]
        wk = wk_at(k)
        if _ABLATE_BWD == "fwdonly":
            # plain forward recompute only; thread z into dx at zero weight
            # so the chain can't be dead-coded. Outputs are wrong (timing).
            z, ldj_add = fwd(wk, x, ctx, extra)
            dx = dz + 1e-30 * z + 1e-30 * ldj_add
            return dx, dctx_acc, dextra_acc
        n_rows = x.shape[0]
        n_chunks = (_ROW_CHUNKS_BWD if n_rows % _ROW_CHUNKS_BWD == 0 else 1)
        step = n_rows // n_chunks
        dwk = dx = dctx_k = dextra_k = None

        def wsum(a, b):
            return b if a is None else jax.tree_util.tree_map(jnp.add, a, b)

        def rcat(a, b):
            return b if a is None else jnp.concatenate([a, b], 0)

        # attention conditioner: ctx (Nc, E) is SHARED across rows — pass it
        # whole and SUM per-chunk cotangents. Global conditioner: ctx is the
        # row-aligned broadcast embedding (QB, E) — slice it like x/extra
        # and CONCAT the chunk cotangents.
        ctx_rowwise = not has_attn
        for c in range(n_chunks):
            rows = slice(c * step, (c + 1) * step)
            ctx_in = ctx[rows] if ctx_rowwise else ctx
            if has_extra:
                _, vjp = jax.vjp(fwd, wk, x[rows], ctx_in, extra[rows])
                dwk_c, dx_c, dctx_c, dextra_c = vjp((dz[rows], dldj[rows]))
                dextra_k = rcat(dextra_k, dextra_c)
            else:
                _, vjp = jax.vjp(lambda w, xx, cc: fwd(w, xx, cc, None),
                                 wk, x[rows], ctx_in)
                dwk_c, dx_c, dctx_c = vjp((dz[rows], dldj[rows]))
            dwk = wsum(dwk, dwk_c)
            dctx_k = (rcat(dctx_k, dctx_c) if ctx_rowwise
                      else wsum(dctx_k, dctx_c))
            dx = rcat(dx, dx_c)

        dflat = {
            "cpl_in_xe": dwk["cpl_in_xe"], "cpl_in_c": dwk["cpl_in_c"],
            "cpl_in_b": dwk["cpl_in_b"],
            "lu_w_f": dwk["lu_w_f"], "lu_b": dwk["lu_b"],
        }
        for j in range(n_cpl - 1):
            dflat["cpl_w%d" % j], dflat["cpl_b%d" % j] = dwk["cpl_rest"][j]
        if has_attn:
            for j in range(n_pre):
                dflat["pre_w%d" % j], dflat["pre_b%d" % j] = dwk["pre"][j]
            dflat["wq_f"], dflat["bq_f"], dflat["wkv"] = (
                dwk["wq_f"], dwk["bq_f"], dwk["wkv"])
        if _ABLATE_BWD != "nodw":
            for name in names:
                r = dw_refs[name]
                g = dflat[name].astype(jnp.float32)
                if g.ndim == r.ndim - 1:
                    g = g[None]
                r[pl.ds(k, 1)] = r[pl.ds(k, 1)] + g.reshape(
                    (1,) + r.shape[1:])
        dctx_acc = dctx_acc + dctx_k.astype(jnp.float32)
        if has_extra:
            dextra_acc = dextra_acc + dextra_k.astype(jnp.float32)
        return dx, dctx_acc, dextra_acc

    dctx0 = jnp.zeros(ctx.shape, jnp.float32)
    dextra0 = (jnp.zeros(extra.shape, jnp.float32) if has_extra
               else jnp.zeros((8, 128), jnp.float32))
    carry = (dz_ref[0], dctx0, dextra0)
    if _UNROLL_BWD:
        # Python loop => k is a Python int => every w_refs[...][pl.ds(k,1)]
        # is STATIC addressing (no dynamic-slice VMEM copies)
        for i in range(k_seg):
            carry = bwd_body(i, carry)
    else:
        carry = jax.lax.fori_loop(0, k_seg, bwd_body, carry, unroll=False)
    dz, dctx_acc, dextra_acc = carry

    dx_out[0] = dz
    if has_attn:
        @pl.when(nb == 0)
        def _():
            dctx_ref[0, 0] = dctx_acc

        @pl.when(nb != 0)
        def _():
            dctx_ref[0, 0] += dctx_acc
    else:
        dctx_ref[0, 0] = dctx_acc
    if has_extra:
        dextra_ref[0, 0] = dextra_acc
