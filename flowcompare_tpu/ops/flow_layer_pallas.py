"""Fused flow-layer megakernel (eval forward) — the whole per-layer
computation in VMEM.

The XLA scan path writes every intermediate of a flow layer (pre-attention
MLP activations, LayerNorm, q/k/v, softmax probabilities, the coupling MLP's
hidden states, the affine epilogue, ActNorm, LinearLU) to HBM between fusion
boundaries: ~0.3 GB of traffic per layer at B=20, ~35 GB per step across the
114 scanned layers. This kernel runs ONE (layer, batch-item, query-block)
grid step entirely on-chip:

    x1 -> preMLP(gelu) -> LN -> q ; ctx -> kv ; softmax(q k^T) v -> out-proj
    [extra ++ attn] ++ x1 -> coupling MLP -> sigmoid-scale affine -> ActNorm
    -> folded LinearLU, with ldj accumulated in f32.

Grid iteration on TPU is sequential with layers as the SLOWEST axis, so the
x / ldj carries live in aliased input/output refs (each block is written in
layer l strictly before any layer-(l+1) step reads it), and the per-layer
weight stacks stream through VMEM via BlockSpec index maps (auto
double-buffered DMA).

Matches the scan path to bf16 rounding; eval-only (no VJP — training uses
the autodiff scan path). Applies to the attention-conditioner configs with
LinearLU + ActNorm (all five shipped presets); anything else falls back to
the scan.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_BLOCK = 1024
# Independent row chunks per grid step: their op chains carry no data
# dependencies, so Mosaic can overlap one chunk's VPU work (GELU, softmax,
# log/sigmoid) with another's MXU matmuls. 1 = off. Production 1 since the
# tanh GELU form landed: with the cheaper VPU tail the chunked overlap no
# longer pays for its overhead (same-worker A/B 2026-08-18: RC1 307.4k vs
# RC2 302.7k vs RC4 292.0k pts/s at _GELU_FORM="tanh";
# save/bench/ab_kernel_flags_r2b.json).
_ROW_CHUNKS = 1

# Trace-time ablation switches for perf attribution (tools/ablate_kernel.py).
# Empty in production; members: "nogelu", "noexp", "noattn", "nolu",
# "nocpl_hidden". Consulted when the kernel is TRACED, so set before jit.
ABLATE: frozenset = frozenset()

# Softmax stabilizer: True = standard max-subtraction (a (QB, Nc) cross-lane
# VPU reduction per layer); False = clamp scores at 80 instead (elementwise,
# cheaper) — exact whenever max score < 80 (f32 exp overflows at 88; even a
# full 1250-wide row of clamped scores sums to 6.9e37 < f32 max, so no
# OVERFLOW is possible either way), and the e@v / ones-column division
# cancels any constant anyway. The UNDERFLOW direction (a whole row below
# ~-92 nats → every e rounds to 0 in the bf16 cast → 0/0) is covered by
# _DENOM_EPS on the ones-column denominator instead of a lower clamp.
# Production False: +0.8% same-worker, nats shift 2e-5
# (save/bench/ab_gelu_guarded.json). Trace-time.
_SOFTMAX_MAX = False

# Added to the ones-column softmax denominator before dividing. Provably a
# bit-exact no-op whenever any score in the row exceeds ~-50 nats (f32
# round(x + 1e-30) == x for x >= ~3e-23); in the deep-underflow regime
# where every exp term rounds to bf16 zero it turns the 0/0 NaN (which
# would otherwise propagate through all remaining layers) into an exact 0
# attention output. The max-subtraction path cannot underflow (one e == 1)
# and doesn't need it.
# KNOWN DEVIATION (advisor round 2, severity low): in the PARTIAL-underflow
# band — true denominator nonzero but < ~1e-30, i.e. every score in roughly
# [-103, -88] — the eps dominates the denominator and the attention output
# collapses toward 0, diverging from jax.nn.softmax on the scan path (which
# max-subtracts and stays exact there). Unreachable for real logits (scores
# are bounded by the +-80 clamp upstream of realistic activations). If
# strict parity in that band is ever needed, clamp scores from BELOW at -80
# (symmetric to the existing +80 clamp) instead of adding eps.
_DENOM_EPS = 1e-30

# GELU logit-poly degree-2 variant (core/mlp._GELU_LOGIT_POLY_DEG2, max err
# 2.5e-5 vs deg-4's 3.2e-6): 2 fewer FMA passes per element, at the cost of
# one u-clamp (deg-2's tail is unsafe un-clamped — see core/mlp). Production
# True: 272.2k vs 260.7k points/sec same-worker (+4.4%), full-depth nats
# delta -0.0016 vs the +-0.01 budget (save/bench/ab_gelu_guarded.json;
# the kernel is VPU-bound on GELU — save/bench/ablate_kernel.json — so
# cheaper GELU converts ~1:1 to step time). Trace-time.
_GELU_DEG2 = True

# How the logit is turned into x*sigmoid(logit) — all three are the same
# function in real arithmetic; they differ only in VPU op count:
#   "sigmoid": x * jax.nn.sigmoid(p(u)*x)            (whatever logistic
#              lowers to on the backend — the round-1/2 production form)
#   "exp2":    x / (1 + exp2(q(u)*x)), q = -log2(e)*p  (constant folded into
#              the poly coefficients at trace time; one exp2 + one divide,
#              no separate negate/scale/final-multiply)
#   "tanh":    xh + xh*tanh(r(u)*x), r = p/2, xh = x/2  (no divide at all,
#              if the backend has a fast tanh)
# Trace-time, A/B'd by tools/ab_kernel_flags.py. Production "tanh": the
# single biggest round-2 eval win — 302.7k vs sigmoid's 272.1k pts/s
# same-worker (+11%), probe nats delta -1.1e-5 (the forms are the same
# function in real arithmetic; save/bench/ab_kernel_flags_r2{,b}.json,
# 2026-08-18). exp2 was neutral (275.4k).
_GELU_FORM = "tanh"

# Softmax in log2 space: scale q by log2(e) right after the wq matmul (a
# (QB, d) pass) so the exp over the (QB, Nc) score matrix — the largest
# elementwise tensor in the kernel — is a raw hardware exp2 with no
# per-element *log2(e) rescale. Exactly equal in real arithmetic: softmax
# is base-invariant once the scores are scaled (the e@v ones-column divide
# cancels any consistent base). Clamp constant becomes 80*log2(e).
# Production True: never worse across three same-worker A/Bs (+0.9% at
# RC=2, tie at RC=1; nats delta -3e-6; ab_kernel_flags_r2{,b,c}.json).
_SOFTMAX_EXP2 = True

# Fuse the attention-preconditioned augmenter into a Pallas prologue kernel
# (fused_augmenter) on the fused eval path — ~4 ms/batch of un-fused XLA
# dispatches otherwise. eps is drawn with the same key/shape normal_sample
# uses, so the two paths see bit-identical noise. Trace-time. Chip-validated
# at full scale 2026-08-18: probe nats delta -2.7e-4 vs the un-fused path
# (budget ±0.01) and +1.9% throughput on the tanh/RC1 kernel (311.6k vs
# 305.9k pts/s same-worker; save/bench/ab_kernel_flags_r2{,c}.json).
_FUSE_AUGMENTER = True

# Same policy for the sampling (inverse) megakernel: interpret-mode tests
# cover the math; tools/test_sample_kernel_chip.py validated full scale on
# hardware 2026-08-18 — kernel 123.3 ms/batch vs reverse-scan 189.2 (1.53x),
# sampled-point parity max_rel 7.6e-3 / mean_abs 1.8e-3 (bf16-level through
# 115 inverse layers; save/bench/sample_kernel_parity.json). Trace-time.
_FUSE_SAMPLING = True

# Keep the x flow-state carry in bf16 between layer grid steps (EVAL and
# SAMPLING only — the training forward keeps f32 carries so its dense saves
# and the backward's recompute are unchanged). The carry round-trips HBM
# once per (layer, item) step: (QB, LAT) f32 is ~1.2 MB each way, ~5.5
# GB/batch across the 115x20 grid at full scale. The LU matmul already
# rounds y to bf16 every layer, so a bf16 carry adds ONE extra rounding per
# layer (on x2 entering the next affine) on top of the existing two. ldj
# stays f32 always. Trace-time; A/B via tools/ab_kernel_flags.py.
_CARRY_BF16 = False

# Coupling input layer as ONE matmul on concat([x1, extra, cond]) instead of
# the folded two-matmul sum: the contraction goes from pad(151)=256 +
# pad(64)=128 = 384 effective lanes to pad(151+64=215)=256 — a 3.8% cut of
# the kernel's padded FLOPs (see the per-stage census in the round-2 notes)
# at the cost of one (QB, 215) lane-concat relayout per layer. Weight stacks
# are pre-concatenated host-side in fused_flow_layers. Trace-time.
_CPL_IN_CONCAT = False

# TRANSPOSED eval kernel layout: the carry lives as (LAT', QB) — features on
# SUBLANES, query rows on LANES — so every matmul whose OUTPUT width is far
# below 128 stops wasting MXU lanes: q (64 cols -> 64 sublanes), e@v (65 ->
# 72), the coupling out-layer and LU tail (300 -> 304 vs 384 padded lanes),
# and wk folds into the q-chain (s^T = ctx @ (wk @ q^T), same real algebra).
# Per-(layer, item) padded-MAC census: q 33.5M->16.8M+8.4M, e@v 164M->94M,
# cpl out 201M->159M, LU 151M->119M — ~9% of the kernel's MXU work, which
# the 2026-08-18 ablation shows is the critical path. The latent is padded
# 300->304 (each half 150->152, 8-aligned for f32 sublane slicing) with
# provably-inert dead dims: zero out-layer rows give sc=1/t=0, identity LU
# rows keep them 0, ldj contributions are exactly 0. LayerNorm/softmax
# reductions become cross-sublane (cheaper than cross-lane on the VPU).
# Eval-only (save_every=None); training keeps the row-major kernel whose
# backward is already validated. Trace-time; chip A/B
# tools/ab_transposed_eval.py. Production True (2026-08-19 same-worker A/B,
# save/bench/ab_transposed_eval.json): eval 363.1k vs 353.0k pts/s (+2.9%),
# sampling 102.3 vs 103.9 ms/batch, probe nats delta 3.2e-4 (budget ±0.01).
# The win lands ~half the padded-MAC estimate — the transposed VPU tail
# (cross-sublane softmax/LN, ragged 153-sublane concat) eats the rest.
_TRANSPOSED_EVAL = True


def _gelu(x):
    """Fast erf GELU — core/mlp.gelu's logit-space form (shared
    coefficients; sigmoid rides the TPU's fast exp unit; no input clamp —
    see core/mlp.gelu for why the tail is safe), f32 in/out."""
    if "nogelu" in ABLATE:
        return x * 1.0000001  # keep a flop so XLA can't fold the chain away
    from ..core.mlp import _GELU_LOGIT_POLY, _GELU_LOGIT_POLY_DEG2
    poly = _GELU_LOGIT_POLY_DEG2 if _GELU_DEG2 else _GELU_LOGIT_POLY
    # _GELU_FORM scale constants fold into the poly coefficients for free
    # at trace time (see the flag comment for the algebra; all forms are
    # exactly x*sigmoid(p(u)*x) in real arithmetic).
    scale = {"sigmoid": 1.0,
             "exp2": -math.log2(math.e),
             "tanh": 0.5}[_GELU_FORM]
    poly = tuple(c * scale for c in poly)
    u = x * x
    if _GELU_DEG2:
        # deg-2's leading coeff is negative -> p flips sign at u≈123.6;
        # clamp u so the logit saturates on the CORRECT branch (see
        # core/mlp._GELU_LOGIT_POLY_DEG2). One extra VPU op, tail-exact.
        u = jnp.minimum(u, 100.0)
    p = jnp.float32(poly[-1])
    for c in poly[-2::-1]:
        p = p * u + c
    if _GELU_FORM == "exp2":
        # tails: clamped |p|>=1.97 for |x|>=10, so exp2 under/overflows to
        # 0/inf and x/(1+e) lands on the exact 0 / x GELU limits
        return x / (1.0 + jnp.exp2(p * x))
    if _GELU_FORM == "tanh":
        xh = 0.5 * x
        return xh + xh * jnp.tanh(p * x)
    return x * jax.nn.sigmoid(p * x)


def _mlp_rest(h, weights, biases, n_total):
    """Hidden + out layers of the residual MLP, given the first activation.

    `weights`/`biases` hold layers 1..n_total-1 of an n_total-layer MLP
    (the input layer is computed by the caller — possibly as a folded sum
    of several matmuls). Residual pattern matches core/mlp.apply_mlp."""
    def lin(h, i):
        y = jnp.dot(h, weights[i][0], preferred_element_type=jnp.float32)
        return y + biases[i][0][0].astype(jnp.float32)

    residual = h
    if "nocpl_hidden" not in ABLATE:
        for k, idx in enumerate(range(1, n_total - 1)):
            if (idx - 1) % 2 == 0:
                residual = h
                h = _gelu(lin(h, k)).astype(jnp.bfloat16)
            else:
                h = _gelu(residual.astype(jnp.float32) + lin(h, k)).astype(
                    jnp.bfloat16)
    return lin(h, n_total - 2)  # f32 out


def _mlp(h, weights, biases):
    """Residual MLP (core/mlp.apply_mlp pattern), bf16 matmuls, f32 nonlin."""
    def lin(h, i):
        y = jnp.dot(h, weights[i][0], preferred_element_type=jnp.float32)
        return y + biases[i][0][0].astype(jnp.float32)

    h = _gelu(lin(h, 0)).astype(jnp.bfloat16)
    return _mlp_rest(h, weights[1:], biases[1:], len(weights))


def _attention_cond(x1b, pre_w, wq_f, bq_f, kb, v1b, d):
    """The shared attention-conditioner block of every megakernel: pre-MLP
    (residual, _mlp), plain-stat LayerNorm (scale/bias folded into wq_f),
    folded q projection, scores vs the precomputed k^T, clamp-80 softmax
    (optionally in log2 space — _SOFTMAX_EXP2), and the e@v matmul with the
    ones-column denominator. Returns the (rows, d) embedding in bf16 — the
    out-projection is folded into the consumer's input matmul."""
    q_in = _mlp(x1b, [(w[0],) for w, _ in pre_w],
                [(b[0],) for _, b in pre_w])
    mean = jnp.mean(q_in, axis=-1, keepdims=True)
    var = jnp.mean(q_in * q_in, axis=-1, keepdims=True) - mean * mean
    qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
    q = (jnp.dot(qn.astype(jnp.bfloat16), wq_f[0],
                 preferred_element_type=jnp.float32)
         + bq_f[0][0].astype(jnp.float32))  # 1/sqrt(d) (and LN) folded
    if _SOFTMAX_EXP2:
        q = q * jnp.float32(math.log2(math.e))
    s = jnp.dot(q.astype(jnp.bfloat16), kb,
                preferred_element_type=jnp.float32)
    clamp = 80.0 * math.log2(math.e) if _SOFTMAX_EXP2 else 80.0
    if _SOFTMAX_MAX:
        sm = s - jnp.max(s, axis=-1, keepdims=True)
    else:
        sm = jnp.minimum(s, jnp.float32(clamp))
    if "noexp" in ABLATE:
        e = sm
    else:
        e = jnp.exp2(sm) if _SOFTMAX_EXP2 else jnp.exp(sm)
    av = jnp.dot(e.astype(jnp.bfloat16), v1b,
                 preferred_element_type=jnp.float32)
    denom = av[:, d:d + 1]
    if not _SOFTMAX_MAX:
        denom = denom + jnp.float32(_DENOM_EPS)   # 0/0 guard, see _DENOM_EPS
    a = av[:, :d] / denom                       # normalize AFTER pv
    return a.astype(jnp.bfloat16)


def _kernel(*refs, n_pre: int, n_cpl: int, has_extra: bool, has_attn: bool,
            split: int, eps_affine: float, save_every: Optional[int] = None):
    """One (layer, batch-item, query-block) step, ALGEBRAICALLY FOLDED:

    * LayerNorm scale/bias and the 1/sqrt(d) softmax scale are pre-folded
      into wq (-> `wq_f`, `bq_f`), so the kernel normalizes with plain
      mean/rsqrt and skips three (QB, A)/(QB, Nc) elementwise passes.
    * The attention out-projection is pre-folded into the conditioner rows
      of the coupling MLP's input matmul (`cpl_in_c` = wout @ W_in[cond]),
      deleting the per-point (64 -> 512) projection AND shrinking the
      input matmul's contraction from pad(663)=768 to pad(151)=256 +
      pad(64)=128 lanes — the single largest FLOP cut in the kernel.
    * ActNorm is pre-folded into the LinearLU matmul (`lu_w_f` = W * D,
      `lu_b` = -(shift*D) @ W^T), deleting two (QB, LAT) passes; its ldj
      constant rides in `lu_ldj`.
    See fold_stacks() for the host-side precomputation.
    """
    it = iter(refs)
    x_ref = next(it)          # (1, QB, LAT) f32   [aliased out]
    ldj_ref = next(it)        # (1, QB, 1)   f32   [aliased out]
    ctx_ref = next(it)        # attn: (1, Nc, E); global: (1, QB, E) bf16
    extra_ref = next(it) if has_extra else None
    if has_attn:
        pre_w = [(next(it), next(it)) for _ in range(n_pre)]
        wq_f, bq_f = next(it), next(it)
        wkv = next(it)
    if _CPL_IN_CONCAT:
        cpl_in_xec = next(it)  # (1, split+extra+D|E, H) bf16, pre-concat
    else:
        cpl_in_xe = next(it)  # (1, split+extra, H) bf16
        cpl_in_c = next(it)   # (1, D|E, H) bf16 (attn: wout-folded)
    cpl_in_b = next(it)       # (1, 1, H) f32
    cpl_w = [(next(it), next(it)) for _ in range(n_cpl - 1)]
    lu_w = next(it)           # (1, LAT, LAT) bf16 (ActNorm+L@U folded)
    lu_b = next(it)           # (1, 1, LAT) f32
    lu_ldj = next(it)         # (1, 1, 1) f32 (LU + ActNorm ldj)
    x_out = next(it)
    ldj_out = next(it)
    saves_out = next(it) if save_every is not None else None

    x = x_ref[0].astype(jnp.float32)               # (QB, LAT) f32 (carry
    #                                                may be bf16 — see flag)
    if saves_out is not None and save_every == 1:
        # dense saves: every layer writes its own block — unconditional
        # store. Do NOT wrap this in pl.when: a trivially-true
        # `pl.when(l % 1 == 0)` around the store hung the TPU runtime
        # (bisected 2026-08-17, tools/probe_dense_saves.py — this was the
        # real cause of the historical "K=1 segmentation fault").
        # bf16: the backward's (K,1,QB,LAT) saves block is double-buffered;
        # f32 blew the 126M scoped-vmem cap by 476K (2026-08-17). bf16 also
        # halves the ~2.8 GB/step of saves HBM traffic.
        saves_out[0, 0] = x.astype(saves_out.dtype)
    elif saves_out is not None:
        # checkpoint the layer-entry carry every `save_every` layers for the
        # backward megakernel (flow_layer_vjp_pallas); the block index map
        # is l // save_every, so non-multiple layers leave the buffer as the
        # segment head wrote it
        @pl.when(pl.program_id(0) % save_every == 0)
        def _():
            saves_out[0, 0] = x

    if has_attn:
        # kv depends only on ctx — shared across row chunks
        ctx = ctx_ref[0]                           # (Nc, E)
        kv = jnp.dot(ctx, wkv[0], preferred_element_type=jnp.float32)
        d = wq_f[0].shape[-1]
        k = kv[:, :d]
        v = kv[:, d:]
        # ones-column rides the (free) 64->128 lane padding of v: the
        # softmax denominator comes out of the SAME matmul as e@v, replacing
        # a VPU cross-lane reduction over (QB, Nc) with MXU work
        v1 = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], -1)
        kb = k.astype(jnp.bfloat16).T
        v1b = v1.astype(jnp.bfloat16)

    def run_rows(rows):
        """Whole layer body on a row slice. The caller may invoke this on
        independent row chunks: their op chains have no data dependencies,
        which lets Mosaic's scheduler overlap one chunk's VPU tail (GELU,
        softmax, log/sigmoid) with the other's MXU matmuls."""
        xr = x[rows]
        x1 = xr[:, :split]
        x2 = xr[:, split:]
        x1b = x1.astype(jnp.bfloat16)
        if has_extra:
            x1e = jnp.concatenate([x1b, extra_ref[0][rows]], axis=-1)
        else:
            x1e = x1b

        if has_attn and "noattn" not in ABLATE:
            cond_op = _attention_cond(x1b, pre_w, wq_f, bq_f, kb, v1b, d)
        elif has_attn:
            cond_op = x1b[:, :wkv[0].shape[-1] - wq_f[0].shape[-1]]
        else:
            # global conditioner: the broadcast embedding IS the context
            cond_op = ctx_ref[0][rows]              # (rows, E) bf16

        # coupling MLP input layer: folded two-matmul sum, or one matmul on
        # the lane-concat (saves a 128-lane padded contraction — see flag)
        if _CPL_IN_CONCAT:
            acc = jnp.dot(jnp.concatenate([x1e, cond_op], axis=-1),
                          cpl_in_xec[0], preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(x1e, cpl_in_xe[0],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cond_op, cpl_in_c[0],
                                preferred_element_type=jnp.float32)
        h = _gelu(acc + cpl_in_b[0][0]).astype(jnp.bfloat16)
        st = _mlp_rest(h, [(w[0],) for w, _ in cpl_w],
                       [(b[0],) for _, b in cpl_w], n_cpl)

        # sigmoid-scale affine (reference affine_coupling sigmoid variant)
        x2_size = st.shape[-1] // 2
        s_raw = st[:, :x2_size]
        t = st[:, x2_size:]
        sc = (2.0 * jax.nn.sigmoid(s_raw) - 1.0) * (1.0 - eps_affine) + 1.0
        y2 = x2 * sc + t
        ldj_add = jnp.sum(jnp.log(sc), axis=-1)

        y = jnp.concatenate([x1, y2], axis=-1)

        # ActNorm-folded LinearLU
        if "nolu" in ABLATE:
            z = y + lu_b[0][0]
        else:
            z = (jnp.dot(y.astype(jnp.bfloat16), lu_w[0].T,
                         preferred_element_type=jnp.float32)
                 + lu_b[0][0])
        ldj_add = ldj_add + lu_ldj[0, 0, 0]
        x_out[0, rows] = z.astype(x_out.dtype)
        ldj_out[0, rows] = ldj_ref[0, rows] + ldj_add[:, None]

    n_rows = x.shape[0]
    n_chunks = _ROW_CHUNKS if n_rows % _ROW_CHUNKS == 0 else 1
    step = n_rows // n_chunks
    for c in range(n_chunks):
        run_rows(slice(c * step, (c + 1) * step))


def fold_stacks(stacks: dict, *, split: int, extra_dim: int) -> dict:
    """Host-side algebraic folds (all in f32, once per dispatch — ~4 GFLOP
    vs the ~8 TFLOP batch they accelerate):

      wq_f  = (ln_scale ⊙ wq) / sqrt(d)        bq_f = (ln_bias @ wq)/sqrt(d)
      cpl_in_xe = W_in[: split+extra]          (x1/extra rows, unchanged)
      cpl_in_c  = wout @ W_in[split+extra :]   (out-proj folded away)
      cpl_in_b  = b_in + bout @ W_in[split+extra :]
      lu_w_f = lu_w ⊙ exp(-an_logscale)        lu_b = -(shift·D) @ lu_w^T
      lu_ldj_f = lu_ldj + sum(-an_logscale)

    Exact in real arithmetic; in bf16 it moves rounding from activations
    into pre-folded weights (parity checked on-chip vs the scan path)."""
    has_attn = "wq" in stacks
    w_in, b_in = stacks["cpl"][0]
    w_in = w_in.astype(jnp.float32)
    b_in = b_in.astype(jnp.float32)
    xe = split + extra_dim
    out = {"pre": stacks.get("pre"), "wkv": stacks.get("wkv"),
           "cpl_rest": stacks["cpl"][1:], "n_cpl": len(stacks["cpl"])}
    out["cpl_in_xe"] = w_in[:, :xe]
    if has_attn:
        d = stacks["wq"].shape[-1]
        scale = d ** -0.5
        ln_s = stacks["ln_scale"].astype(jnp.float32)   # (L, 1, A)
        ln_b = stacks["ln_bias"].astype(jnp.float32)
        wq = stacks["wq"].astype(jnp.float32)           # (L, A, D)
        out["wq_f"] = ln_s[:, 0, :, None] * wq * scale
        out["bq_f"] = jnp.einsum("la,lad->ld", ln_b[:, 0], wq)[:, None] * scale
        wout = stacks["wout"].astype(jnp.float32)       # (L, D, H)
        bout = stacks["bout"].astype(jnp.float32)       # (L, 1, H)
        out["cpl_in_c"] = jnp.einsum("ldh,lhk->ldk", wout, w_in[:, xe:])
        out["cpl_in_b"] = (b_in + jnp.einsum(
            "lh,lhk->lk", bout[:, 0], w_in[:, xe:]))[:, None]
    else:
        out["cpl_in_c"] = w_in[:, xe:]
        out["cpl_in_b"] = b_in[:, None] if b_in.ndim == 2 else b_in
    dscale = jnp.exp(-stacks["an_logscale"].astype(jnp.float32)[:, 0])  # (L, LAT)
    lu_w = stacks["lu_w"].astype(jnp.float32)           # (L, LAT, LAT)
    out["lu_w_f"] = lu_w * dscale[:, None, :]
    shift_d = stacks["an_shift"].astype(jnp.float32)[:, 0] * dscale
    out["lu_b"] = -jnp.einsum("lj,lij->li", shift_d, lu_w)[:, None]
    out["lu_ldj_f"] = (stacks["lu_ldj"].astype(jnp.float32)
                       + jnp.sum(-stacks["an_logscale"].astype(jnp.float32),
                                 axis=(1, 2)))
    return out


def folded_scan_core(x: jnp.ndarray, ldj: jnp.ndarray, context: jnp.ndarray,
                     extra: Optional[jnp.ndarray], folded: dict, *,
                     nonlin, dtype=None, remat: bool = True,
                     unroll: int = 1, eps_affine: float = 1e-8):
    """The fold_stacks math as a DIFFERENTIABLE lax.scan — the training-path
    (and non-TPU eval) counterpart of the Pallas megakernel.

    Same algebra as _kernel: the attention out-projection is folded into the
    coupling input matmul and ActNorm into the LinearLU matmul, cutting the
    per-layer FLOPs ~15% in BOTH the forward and the backward (XLA never
    reassociates matmul chains itself). Gradients flow through the hoisted
    fold einsums back to the raw parameters — exact chain rule.

    dtype=bf16 reproduces the kernel's mixed-precision policy (bf16 matmuls,
    f32 accumulation/stats/ldj); dtype=None is pure f32 (exact algebra vs
    the unfolded scan — see test_fold_stacks_algebra_matches_scan_core).
    """
    n_cpl = folded["n_cpl"]
    has_attn = folded.get("pre") is not None
    split = x.shape[-1] // 2
    xs = {k: v for k, v in folded.items() if k != "n_cpl" and v is not None}

    def cast(a):
        return a.astype(dtype) if dtype is not None else a

    def lin(h, wb):
        w, b = wb
        return (jnp.dot(h, cast(w), preferred_element_type=jnp.float32)
                + b.astype(jnp.float32))

    def res_mlp(h_first, pairs, n_total):
        """Hidden+out chain given the first post-gelu activation (bf16)."""
        h = h_first
        residual = h
        for k, idx in enumerate(range(1, n_total - 1)):
            if (idx - 1) % 2 == 0:
                residual = h
                h = cast(nonlin(lin(h, pairs[k])))
            else:
                h = cast(nonlin(residual.astype(jnp.float32)
                                + lin(h, pairs[k])))
        return lin(h, pairs[n_total - 2])

    ctx_c = cast(context)

    def body(carry, st):
        h, acc = carry
        x1 = h[..., :split]
        x2 = h[..., split:]
        x1c = cast(x1)
        x1e = (jnp.concatenate([x1c, cast(extra)], -1)
               if extra is not None else x1c)
        if has_attn:
            pre = st["pre"]
            q_in = cast(nonlin(lin(x1c, pre[0])))
            q_in = res_mlp(q_in, pre[1:], len(pre))
            mean = jnp.mean(q_in, axis=-1, keepdims=True)
            var = jnp.mean(q_in * q_in, axis=-1, keepdims=True) - mean * mean
            qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
            q = (jnp.dot(cast(qn), cast(st["wq_f"]),
                         preferred_element_type=jnp.float32)
                 + st["bq_f"][0].astype(jnp.float32))
            kv = jnp.dot(ctx_c, cast(st["wkv"]),
                         preferred_element_type=jnp.float32)
            d = q.shape[-1]
            k, v = kv[..., :d], kv[..., d:]
            s = jnp.einsum("bnd,bmd->bnm", cast(q), cast(k),
                           preferred_element_type=jnp.float32)
            e = jnp.exp(s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True)))
            a = jnp.einsum("bnm,bmd->bnd", cast(e), cast(v),
                           preferred_element_type=jnp.float32)
            a = a / jnp.sum(e, axis=-1, keepdims=True)
            from jax.ad_checkpoint import checkpoint_name
            cond_op = cast(checkpoint_name(a, "attn_emb"))
        else:
            cond_op = ctx_c
        acc_in = (jnp.dot(x1e, cast(st["cpl_in_xe"]),
                          preferred_element_type=jnp.float32)
                  + jnp.dot(cond_op, cast(st["cpl_in_c"]),
                            preferred_element_type=jnp.float32)
                  + st["cpl_in_b"][0].astype(jnp.float32))
        stt = res_mlp(cast(nonlin(acc_in)), st["cpl_rest"], n_cpl)
        half = stt.shape[-1] // 2
        sc = (2.0 * jax.nn.sigmoid(stt[..., :half]) - 1.0) \
            * (1.0 - eps_affine) + 1.0
        y2 = x2 * sc + stt[..., half:]
        acc = acc + jnp.sum(jnp.log(sc), axis=-1) + st["lu_ldj_f"]
        y = jnp.concatenate([x1, y2], axis=-1)
        h = (jnp.einsum("bnj,ij->bni", cast(y), cast(st["lu_w_f"]),
                        preferred_element_type=jnp.float32)
             + st["lu_b"][0].astype(jnp.float32))
        return (h, acc), None

    if remat:
        body = jax.checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names("attn_emb"))
    (x, ldj), _ = jax.lax.scan(body, (x, ldj), xs, unroll=unroll)
    return x, ldj


def fused_flow_layers(x: jnp.ndarray, ldj: jnp.ndarray, context: jnp.ndarray,
                      extra: Optional[jnp.ndarray], stacks: dict, *,
                      eps_affine: float = 1e-8,
                      save_every: Optional[int] = None,
                      interpret: bool = False):
    """Run all stacked layers over (x, ldj).

    `stacks` is the fold_stacks() output: {"pre": [(w,b)...] each
    (L,i,o)/(L,o), "wq_f","bq_f","wkv", "cpl_in_xe","cpl_in_c","cpl_in_b",
    "cpl_rest": [(w,b)...], "n_cpl", "lu_w_f" (L,LAT,LAT), "lu_b",
    "lu_ldj_f" (L,)}. Returns (x, ldj), plus the (L/save_every, B, N, LAT)
    layer-entry checkpoints when save_every is set (training backward).
    """
    if _TRANSPOSED_EVAL and save_every is None:
        return fused_flow_layers_t(x, ldj, context, extra, stacks,
                                   eps_affine=eps_affine,
                                   interpret=interpret)
    b, n, lat = x.shape
    n_layers = stacks["lu_ldj_f"].shape[0]
    nc, e_dim = context.shape[1], context.shape[2]
    split = lat // 2
    has_attn = "wq_f" in stacks and stacks["wq_f"] is not None
    has_extra = extra is not None

    qb = _Q_BLOCK if n % _Q_BLOCK == 0 else math.gcd(n, _Q_BLOCK)
    grid = (n_layers, b, n // qb)

    bf = jnp.bfloat16
    # bf16 x-carry only on the no-saves (eval) path: the training forward's
    # saves/backward contract stays f32 (see _CARRY_BF16)
    x_dt = bf if (_CARRY_BF16 and save_every is None) else jnp.float32
    inputs = [x.astype(x_dt), ldj.astype(jnp.float32)[..., None],
              context.astype(bf)]
    ctx_spec = (pl.BlockSpec((1, nc, e_dim), lambda l, bi, nb: (bi, 0, 0),
                             memory_space=pltpu.VMEM) if has_attn else
                pl.BlockSpec((1, qb, e_dim), lambda l, bi, nb: (bi, nb, 0),
                             memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, qb, lat), lambda l, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qb, 1), lambda l, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        ctx_spec,
    ]
    if has_extra:
        inputs.append(extra.astype(bf))
        in_specs.append(pl.BlockSpec((1, qb, extra.shape[-1]),
                                     lambda l, bi, nb: (bi, nb, 0),
                                     memory_space=pltpu.VMEM))

    def add_stacked(arr, cast=bf):
        arr = arr.astype(cast)
        if arr.ndim == 2:  # (L, O) bias stacks -> (L, 1, O) for TPU tiling
            arr = arr[:, None, :]
        blk = (1,) + arr.shape[1:]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            blk, lambda l, bi, nb: (l,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM))

    if has_attn:
        for w, bb in stacks["pre"]:
            add_stacked(w)
            add_stacked(bb)
        add_stacked(stacks["wq_f"])
        add_stacked(stacks["bq_f"], jnp.float32)
        add_stacked(stacks["wkv"])
    if _CPL_IN_CONCAT:
        add_stacked(jnp.concatenate(
            [stacks["cpl_in_xe"], stacks["cpl_in_c"]], axis=1))
    else:
        add_stacked(stacks["cpl_in_xe"])
        add_stacked(stacks["cpl_in_c"])
    add_stacked(stacks["cpl_in_b"], jnp.float32)
    for w, bb in stacks["cpl_rest"]:
        add_stacked(w)
        add_stacked(bb)
    add_stacked(stacks["lu_w_f"])
    add_stacked(stacks["lu_b"], jnp.float32)
    add_stacked(stacks["lu_ldj_f"].reshape(n_layers, 1, 1), jnp.float32)

    kernel = functools.partial(
        _kernel, n_pre=len(stacks["pre"] or ()), n_cpl=stacks["n_cpl"],
        has_extra=has_extra, has_attn=has_attn, split=split,
        eps_affine=eps_affine, save_every=save_every)

    out_specs = [
        pl.BlockSpec((1, qb, lat), lambda l, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qb, 1), lambda l, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, n, lat), x_dt),
                 jax.ShapeDtypeStruct((b, n, 1), jnp.float32)]
    if save_every is not None:
        n_saves = -(-n_layers // save_every)
        # save_every=1 gets the identity index map (no `l // 1` division —
        # see the in-kernel dense-saves note)
        idx_map = (
            (lambda l, bi, nb: (l, bi, nb, 0)) if save_every == 1 else
            (lambda l, bi, nb: (l // save_every, bi, nb, 0)))
        out_specs.append(pl.BlockSpec(
            (1, 1, qb, lat), idx_map, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_saves, b, n, lat),
            jnp.bfloat16 if save_every == 1 else jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={0: 0, 1: 1},
        # v5e has far more physical VMEM than the compiler's conservative
        # 16MB scoped default; the raised cap admits full-N query blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if save_every is not None:
        return outs[0], outs[1][..., 0], outs[2]
    out_x, out_ldj = outs
    return out_x.astype(jnp.float32), out_ldj[..., 0]


def _padded_layout_t(split: int):
    """The transposed kernels' 8-aligned latent layout: split -> sp
    (rounded up to the f32 sublane quantum) so the x1/x2 halves stay
    sliceable on sublanes, live dims at `pidx`, inert dead dims at `dead`
    (see _TRANSPOSED_EVAL). Single source of truth for forward, inverse
    and fold — the dead-dim interleaving must match everywhere."""
    import numpy as np

    sp = -(-split // 8) * 8
    latp = 2 * sp
    pidx = np.concatenate([np.arange(split), sp + np.arange(split)])
    dead = np.setdiff1d(np.arange(latp), pidx)
    return sp, latp, pidx, dead


def _scatter_tail_t(w, bvec, pidx, dead, latp):
    """Scatter a (L, lat, lat) tail matrix + (L, lat)-ish bias into the
    padded layout, identity on the dead diagonal so padded lanes pass
    through inert. Returns ((L, latp, latp) f32, (L, latp, 1) f32)."""
    n_l = w.shape[0]
    wsc = jnp.zeros((n_l, latp, latp), jnp.float32)
    wsc = wsc.at[:, pidx[:, None], pidx[None, :]].set(w.astype(jnp.float32))
    if dead.size:
        wsc = wsc.at[:, dead, dead].set(1.0)
    bsc = jnp.zeros((n_l, latp), jnp.float32).at[:, pidx].set(
        bvec.reshape(n_l, -1).astype(jnp.float32))[:, :, None]
    return wsc, bsc


def fold_stacks_t(folded: dict, *, split: int, extra_dim: int,
                  lu_tail: bool = True) -> dict:
    """Re-lay fold_stacks() output for the TRANSPOSED kernel (_kernel_t):
    every weight pre-transposed to (out, in), biases as (out, 1) columns,
    and the latent axis padded split->sp (8-aligned) with inert dead dims
    scattered in (see _TRANSPOSED_EVAL). wkv splits into wk (kept (E, d),
    it contracts against q^T in-kernel) and wvT ((d, E), producing v^T
    directly from ctx^T). Host-side, f32, once per dispatch."""
    sp, latp, pidx, dead = _padded_layout_t(split)

    def tr(w):                       # (L, i, o) -> (L, o, i)
        return jnp.swapaxes(w, 1, 2)

    def bcol(b):                     # (L, o) | (L, 1, o) -> (L, o, 1)
        return b.reshape(b.shape[0], -1)[:, :, None]

    out = {"n_cpl": folded["n_cpl"], "sp": sp, "latp": latp}
    has_attn = folded.get("pre") is not None
    if has_attn:
        pre = folded["pre"]
        w0t = tr(pre[0][0])          # (L, o, split) — consumes x1 rows only
        if sp != split:
            w0t = jnp.pad(w0t, ((0, 0), (0, 0), (0, sp - split)))
        out["pre_t"] = ([(w0t, bcol(pre[0][1]))]
                        + [(tr(w), bcol(b)) for w, b in pre[1:]])
        out["wq_t"] = tr(folded["wq_f"])        # (L, d, A)
        out["bq_t"] = bcol(folded["bq_f"])      # (L, d, 1)
        d = folded["wq_f"].shape[-1]
        out["wk"] = folded["wkv"][:, :, :d]     # (L, E, d)
        out["wvT"] = tr(folded["wkv"][:, :, d:])  # (L, d, E)
    xet = tr(folded["cpl_in_xe"])    # (L, H, split+extra)
    n_l, hid = xet.shape[0], xet.shape[1]
    new = jnp.zeros((n_l, hid, sp + extra_dim), xet.dtype)
    new = new.at[:, :, :split].set(xet[:, :, :split])
    if extra_dim:
        new = new.at[:, :, sp:].set(xet[:, :, split:])
    out["cpl_in_xe_t"] = new
    out["cpl_in_c_t"] = tr(folded["cpl_in_c"])
    out["cpl_in_b_t"] = bcol(folded["cpl_in_b"])
    rest = folded["cpl_rest"]
    rest_t = [(tr(w), bcol(b)) for w, b in rest[:-1]]
    wlt = tr(rest[-1][0])            # (L, lat, h) — scatter output rows
    wlt_sc = jnp.zeros((n_l, latp, wlt.shape[-1]),
                       wlt.dtype).at[:, pidx, :].set(wlt)
    blt = jnp.zeros((n_l, latp), jnp.float32).at[:, pidx].set(
        rest[-1][1].reshape(n_l, -1).astype(jnp.float32))[:, :, None]
    out["cpl_rest_t"] = rest_t + [(wlt_sc, blt)]
    if not lu_tail:
        # the inverse kernel builds its own inv_sc/sh_sc from lu_w_inv_f —
        # skip the ~42 MB (L, latp, latp) forward-tail scatter it never reads
        return out
    out["lu_w_t"], out["lu_b_t"] = _scatter_tail_t(
        folded["lu_w_f"], folded["lu_b"], pidx, dead, latp)
    out["lu_ldj_f"] = folded["lu_ldj_f"]
    return out


def _lin_t(h, pair):
    """Transposed linear: (out, in) weight block @ (in, rows) + (out, 1)."""
    w, bb = pair
    return (jnp.dot(w[0], h, preferred_element_type=jnp.float32)
            + bb[0].astype(jnp.float32))


def _mlp_rest_t(h, pairs):
    """Transposed residual hidden chain (core/mlp.apply_mlp's scheme: a
    residual add every SECOND hidden layer), bf16 carries. Shared by the
    attention pre-MLP and the coupling MLP so the alternation/precision
    policy lives in exactly one place."""
    residual = h
    for kk, pair in enumerate(pairs):
        if kk % 2 == 0:
            residual = h
            h = _gelu(_lin_t(h, pair)).astype(jnp.bfloat16)
        else:
            h = _gelu(residual.astype(jnp.float32)
                      + _lin_t(h, pair)).astype(jnp.bfloat16)
    return h


def _attention_cond_t(x1b, pre_w, wq_t, bq_t, wk, ctxb, v1Tb, d, n_pre):
    """The transposed twin of _attention_cond: pre-MLP, cross-sublane LN,
    folded q projection, s^T = ctx @ (wk @ q^T), clamp softmax, and the
    v1^T @ e^T matmul whose ones ROW is the denominator. Returns the
    (d, rows) embedding in bf16."""
    h = _gelu(_lin_t(x1b, pre_w[0])).astype(jnp.bfloat16)
    h = _mlp_rest_t(h, [pre_w[i] for i in range(1, n_pre - 1)])
    q_in = _lin_t(h, pre_w[n_pre - 1])              # (A, rows) f32
    mean = jnp.mean(q_in, axis=0, keepdims=True)
    var = jnp.mean(q_in * q_in, axis=0, keepdims=True) - mean * mean
    qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
    qT = (jnp.dot(wq_t[0], qn.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
          + bq_t[0].astype(jnp.float32))            # (d, rows)
    if _SOFTMAX_EXP2:
        qT = qT * jnp.float32(math.log2(math.e))
    # s^T = ctx @ (wk @ q^T): the wk matmul rides the q-chain instead of
    # projecting ctx every layer — same real algebra, one matmul fewer
    g = jnp.dot(wk[0], qT.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)           # (E, rows)
    sT = jnp.dot(ctxb, g.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)          # (Nc, rows)
    clamp = 80.0 * math.log2(math.e) if _SOFTMAX_EXP2 else 80.0
    if _SOFTMAX_MAX:
        sm = sT - jnp.max(sT, axis=0, keepdims=True)
    else:
        sm = jnp.minimum(sT, jnp.float32(clamp))
    if "noexp" in ABLATE:
        eT = sm
    else:
        eT = jnp.exp2(sm) if _SOFTMAX_EXP2 else jnp.exp(sm)
    avT = jnp.dot(v1Tb, eT.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)         # (d+1, rows)
    denomT = avT[d:d + 1]
    if not _SOFTMAX_MAX:
        denomT = denomT + jnp.float32(_DENOM_EPS)  # 0/0 guard, see _DENOM_EPS
    return (avT[:d] / denomT).astype(jnp.bfloat16)


def _coupling_st_t(x1e, cond, cpl_in_xe, cpl_in_c, cpl_in_b, cpl_w, n_cpl):
    """Transposed coupling MLP: folded input sum, hidden+out chain.
    Returns the (LATP, rows) f32 st block."""
    acc = (jnp.dot(cpl_in_xe[0], x1e, preferred_element_type=jnp.float32)
           + jnp.dot(cpl_in_c[0], cond, preferred_element_type=jnp.float32)
           + cpl_in_b[0].astype(jnp.float32))
    h = _gelu(acc).astype(jnp.bfloat16)
    if "nocpl_hidden" not in ABLATE:
        h = _mlp_rest_t(h, [cpl_w[i] for i in range(n_cpl - 2)])
    return _lin_t(h, cpl_w[n_cpl - 2])


def _kernel_t(*refs, n_pre: int, n_cpl: int, has_extra: bool, has_attn: bool,
              sp: int, eps_affine: float):
    """_kernel with the (LAT', QB) transposed layout (see _TRANSPOSED_EVAL):
    features on sublanes, query rows on lanes. Same math in the same
    contraction order up to matmul transposition; LN/softmax/ldj reductions
    run across sublanes. Eval-only (no saves)."""
    it = iter(refs)
    x_ref = next(it)          # (1, LATP, QB) f32  [aliased out]
    ldj_ref = next(it)        # (1, 1, QB)    f32  [aliased out]
    if has_attn:
        ctx_ref = next(it)    # (1, Nc, E) bf16
        ctxT_ref = next(it)   # (1, E, Nc) bf16
    else:
        ctxT_ref = next(it)   # (1, E, QB) bf16 (global embedding, transposed)
    extraT_ref = next(it) if has_extra else None
    if has_attn:
        pre_w = [(next(it), next(it)) for _ in range(n_pre)]
        wq_t, bq_t = next(it), next(it)
        wk, wvT = next(it), next(it)
    cpl_in_xe = next(it)      # (1, H, SP+ED) bf16
    cpl_in_c = next(it)       # (1, H, D|E)   bf16
    cpl_in_b = next(it)       # (1, H, 1)     f32
    cpl_w = [(next(it), next(it)) for _ in range(n_cpl - 1)]
    lu_w = next(it)           # (1, LATP, LATP) bf16
    lu_b = next(it)           # (1, LATP, 1)    f32
    lu_ldj = next(it)         # (1, 1, 1)       f32
    x_out = next(it)
    ldj_out = next(it)

    x = x_ref[0].astype(jnp.float32)               # (LATP, QB)

    if has_attn:
        # v^T straight from ctx^T; the ones ROW is the softmax denominator
        # (transposed twin of the normal kernel's ones column)
        vT = jnp.dot(wvT[0], ctxT_ref[0], preferred_element_type=jnp.float32)
        v1T = jnp.concatenate(
            [vT, jnp.ones((1, vT.shape[1]), vT.dtype)], axis=0)
        v1Tb = v1T.astype(jnp.bfloat16)
        d = wq_t[0].shape[0]

    x1 = x[:sp]
    x2 = x[sp:]
    x1b = x1.astype(jnp.bfloat16)
    x1e = (jnp.concatenate([x1b, extraT_ref[0]], axis=0)
           if has_extra else x1b)

    if has_attn and "noattn" not in ABLATE:
        cond = _attention_cond_t(x1b, pre_w, wq_t, bq_t, wk, ctx_ref[0],
                                 v1Tb, d, n_pre)
    elif has_attn:
        cond = x1b[:cpl_in_c[0].shape[-1]]
    else:
        cond = ctxT_ref[0]                          # (E, QB) bf16

    st = _coupling_st_t(x1e, cond, cpl_in_xe, cpl_in_c, cpl_in_b, cpl_w,
                        n_cpl)                      # (LATP, QB) f32

    s_raw = st[:sp]
    t = st[sp:]
    sc = (2.0 * jax.nn.sigmoid(s_raw) - 1.0) * (1.0 - eps_affine) + 1.0
    y2 = x2 * sc + t
    ldj_add = jnp.sum(jnp.log(sc), axis=0, keepdims=True)    # (1, QB)
    y = jnp.concatenate([x1, y2], axis=0)
    if "nolu" in ABLATE:
        z = y + lu_b[0].astype(jnp.float32)
    else:
        z = (jnp.dot(lu_w[0], y.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + lu_b[0].astype(jnp.float32))
    x_out[0] = z.astype(x_out.dtype)
    ldj_out[0] = ldj_ref[0] + ldj_add + lu_ldj[0, 0, 0]


def fused_flow_layers_t(x: jnp.ndarray, ldj: jnp.ndarray,
                        context: jnp.ndarray, extra: Optional[jnp.ndarray],
                        stacks: dict, *, eps_affine: float = 1e-8,
                        interpret: bool = False):
    """fused_flow_layers in the TRANSPOSED layout (_TRANSPOSED_EVAL): the
    carry streams as (B, LAT', N) with one XLA transpose+pad at entry and
    exit (~25 MB each at full scale — negligible vs the 115-layer body).
    Same (x, ldj) contract as the row-major kernel; eval-only."""
    b, n, lat = x.shape
    split = lat // 2
    stx = fold_stacks_t(stacks, split=split,
                        extra_dim=(extra.shape[-1]
                                   if extra is not None else 0))
    sp, latp = stx["sp"], stx["latp"]
    n_layers = stacks["lu_ldj_f"].shape[0]
    has_attn = stacks.get("pre") is not None
    has_extra = extra is not None
    qb = _Q_BLOCK if n % _Q_BLOCK == 0 else math.gcd(n, _Q_BLOCK)
    grid = (n_layers, b, n // qb)
    bf = jnp.bfloat16

    xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, LAT, N)
    if sp != split:
        zpad = jnp.zeros((b, sp - split, n), jnp.float32)
        xt = jnp.concatenate([xt[:, :split], zpad, xt[:, split:], zpad], 1)
    inputs = [xt, ldj.astype(jnp.float32)[:, None, :]]
    in_specs = [
        pl.BlockSpec((1, latp, qb), lambda l, bi, nb: (bi, 0, nb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qb), lambda l, bi, nb: (bi, 0, nb),
                     memory_space=pltpu.VMEM),
    ]
    if has_attn:
        nc, e_dim = context.shape[1], context.shape[2]
        inputs.append(context.astype(bf))
        in_specs.append(pl.BlockSpec((1, nc, e_dim),
                                     lambda l, bi, nb: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.swapaxes(context, 1, 2).astype(bf))
        in_specs.append(pl.BlockSpec((1, e_dim, nc),
                                     lambda l, bi, nb: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        e_dim = context.shape[2]
        inputs.append(jnp.swapaxes(context, 1, 2).astype(bf))  # (B, E, N)
        in_specs.append(pl.BlockSpec((1, e_dim, qb),
                                     lambda l, bi, nb: (bi, 0, nb),
                                     memory_space=pltpu.VMEM))
    if has_extra:
        ed = extra.shape[-1]
        inputs.append(jnp.swapaxes(extra, 1, 2).astype(bf))
        in_specs.append(pl.BlockSpec((1, ed, qb),
                                     lambda l, bi, nb: (bi, 0, nb),
                                     memory_space=pltpu.VMEM))

    def add_stacked(arr, cast=bf):
        arr = arr.astype(cast)
        blk = (1,) + arr.shape[1:]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            blk, lambda l, bi, nb: (l,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM))

    if has_attn:
        for w, bb in stx["pre_t"]:
            add_stacked(w)
            add_stacked(bb)
        add_stacked(stx["wq_t"])
        add_stacked(stx["bq_t"], jnp.float32)
        add_stacked(stx["wk"])
        add_stacked(stx["wvT"])
    add_stacked(stx["cpl_in_xe_t"])
    add_stacked(stx["cpl_in_c_t"])
    add_stacked(stx["cpl_in_b_t"], jnp.float32)
    for w, bb in stx["cpl_rest_t"]:
        add_stacked(w)
        add_stacked(bb)
    add_stacked(stx["lu_w_t"])
    add_stacked(stx["lu_b_t"], jnp.float32)
    add_stacked(stx["lu_ldj_f"].reshape(n_layers, 1, 1), jnp.float32)

    kernel = functools.partial(
        _kernel_t, n_pre=len(stx.get("pre_t", ())), n_cpl=stx["n_cpl"],
        has_extra=has_extra, has_attn=has_attn, sp=sp,
        eps_affine=eps_affine)

    out_specs = [
        pl.BlockSpec((1, latp, qb), lambda l, bi, nb: (bi, 0, nb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qb), lambda l, bi, nb: (bi, 0, nb),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, latp, n), jnp.float32),
                 jax.ShapeDtypeStruct((b, 1, n), jnp.float32)]
    zt, ldjt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if sp != split:
        zt = jnp.concatenate([zt[:, :split], zt[:, sp:sp + split]], 1)
    return jnp.swapaxes(zt, 1, 2), ldjt[:, 0]


def fold_stacks_inverse(stacks: dict, folded: dict) -> dict:
    """Extend fold_stacks() output with the INVERSE of the folded
    ActNorm+LinearLU tail, for the sampling megakernel.

    Forward tail: z = y @ lu_w_f.T + lu_b  (lu_w_f = lu_w ⊙ D over output
    cols, lu_b = -(shift·D) @ lu_w.T, D = exp(-an_logscale)). Inverse:

        y = z @ Minv.T + an_shift,   Minv = inv(lu_w) ⊙ exp(an_logscale)[:,None]

    (row-scaled inverse: y_j = e^{ls_j}·(z @ inv(lu_w).T)_j + shift_j).
    The batched 300x300 inverse runs once per sample dispatch in f32 —
    ~10 GFLOP against the multi-TFLOP sampling pass it unlocks."""
    lu_w = stacks["lu_w"].astype(jnp.float32)            # (L, LAT, LAT)
    inv_w = jnp.linalg.inv(lu_w)
    ls = stacks["an_logscale"].astype(jnp.float32)[:, 0]  # (L, LAT)
    out = dict(folded)
    out["lu_w_inv_f"] = inv_w * jnp.exp(ls)[:, :, None]
    out["lu_shift"] = stacks["an_shift"].astype(jnp.float32)[:, 0][:, None]
    return out


def _kernel_inverse_t(*refs, n_pre: int, n_cpl: int, has_extra: bool,
                      has_attn: bool, sp: int, eps_affine: float):
    """_kernel_inverse in the transposed (LAT', QB) layout — same wins as
    _kernel_t (the conditioner math is IDENTICAL to the forward's; only the
    tail inverts): y^T = lu_inv' @ z^T + shift', x2 = (y2 - t) / sc.
    Dead dims stay zero: identity lu_inv rows, zero shift, sc=1, t=0."""
    it = iter(refs)
    z_ref = next(it)          # (1, LATP, QB) f32  [aliased out]
    if has_attn:
        ctx_ref = next(it)
        ctxT_ref = next(it)
    else:
        ctxT_ref = next(it)
    extraT_ref = next(it) if has_extra else None
    if has_attn:
        pre_w = [(next(it), next(it)) for _ in range(n_pre)]
        wq_t, bq_t = next(it), next(it)
        wk, wvT = next(it), next(it)
    cpl_in_xe = next(it)
    cpl_in_c = next(it)
    cpl_in_b = next(it)
    cpl_w = [(next(it), next(it)) for _ in range(n_cpl - 1)]
    lu_w_inv = next(it)       # (1, LATP, LATP) bf16 (scattered row-scaled inv)
    lu_shift = next(it)       # (1, LATP, 1) f32
    x_out = next(it)

    z = z_ref[0].astype(jnp.float32)               # (LATP, QB)

    if has_attn:
        vT = jnp.dot(wvT[0], ctxT_ref[0], preferred_element_type=jnp.float32)
        v1T = jnp.concatenate(
            [vT, jnp.ones((1, vT.shape[1]), vT.dtype)], axis=0)
        v1Tb = v1T.astype(jnp.bfloat16)
        d = wq_t[0].shape[0]

    # undo ActNorm + LinearLU first (reverse of the forward tail)
    y = (jnp.dot(lu_w_inv[0], z.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
         + lu_shift[0].astype(jnp.float32))
    x1 = y[:sp]
    y2 = y[sp:]
    x1b = x1.astype(jnp.bfloat16)
    x1e = (jnp.concatenate([x1b, extraT_ref[0]], axis=0)
           if has_extra else x1b)

    if has_attn:
        cond = _attention_cond_t(x1b, pre_w, wq_t, bq_t, wk, ctx_ref[0],
                                 v1Tb, d, n_pre)
    else:
        cond = ctxT_ref[0]

    st = _coupling_st_t(x1e, cond, cpl_in_xe, cpl_in_c, cpl_in_b, cpl_w,
                        n_cpl)
    s_raw = st[:sp]
    t = st[sp:]
    sc = (2.0 * jax.nn.sigmoid(s_raw) - 1.0) * (1.0 - eps_affine) + 1.0
    x2 = (y2 - t) / sc                             # inverted affine
    x_out[0] = jnp.concatenate([x1, x2], axis=0).astype(x_out.dtype)


def fused_flow_layers_inverse_t(z: jnp.ndarray, context: jnp.ndarray,
                                extra: Optional[jnp.ndarray],
                                folded_inv: dict, *,
                                eps_affine: float = 1e-8,
                                interpret: bool = False):
    """fused_flow_layers_inverse in the transposed layout (see
    _TRANSPOSED_EVAL). Walks layers backwards through the weight index
    maps; same (z -> x) contract, no ldj."""
    b, n, lat = z.shape
    split = lat // 2
    stx = fold_stacks_t(folded_inv, split=split,
                        extra_dim=(extra.shape[-1]
                                   if extra is not None else 0),
                        lu_tail=False)
    sp, latp = stx["sp"], stx["latp"]
    _, _, pidx, dead = _padded_layout_t(split)
    n_layers = folded_inv["lu_w_inv_f"].shape[0]
    has_attn = folded_inv.get("pre") is not None
    has_extra = extra is not None
    qb = _Q_BLOCK if n % _Q_BLOCK == 0 else math.gcd(n, _Q_BLOCK)
    grid = (n_layers, b, n // qb)
    last = n_layers - 1
    bf = jnp.bfloat16

    # scatter the inverse tail into the padded layout (same helper as the
    # forward tail — the dead-dim interleaving must match fold_stacks_t)
    inv_sc, sh_sc = _scatter_tail_t(folded_inv["lu_w_inv_f"],
                                    folded_inv["lu_shift"],
                                    pidx, dead, latp)

    zt = jnp.swapaxes(z, 1, 2).astype(jnp.float32)  # (B, LAT, N)
    if sp != split:
        zpad = jnp.zeros((b, sp - split, n), jnp.float32)
        zt = jnp.concatenate([zt[:, :split], zpad, zt[:, split:], zpad], 1)
    inputs = [zt]
    in_specs = [pl.BlockSpec((1, latp, qb), lambda l, bi, nb: (bi, 0, nb),
                             memory_space=pltpu.VMEM)]
    if has_attn:
        nc, e_dim = context.shape[1], context.shape[2]
        inputs.append(context.astype(bf))
        in_specs.append(pl.BlockSpec((1, nc, e_dim),
                                     lambda l, bi, nb: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.swapaxes(context, 1, 2).astype(bf))
        in_specs.append(pl.BlockSpec((1, e_dim, nc),
                                     lambda l, bi, nb: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        e_dim = context.shape[2]
        inputs.append(jnp.swapaxes(context, 1, 2).astype(bf))
        in_specs.append(pl.BlockSpec((1, e_dim, qb),
                                     lambda l, bi, nb: (bi, 0, nb),
                                     memory_space=pltpu.VMEM))
    if has_extra:
        ed = extra.shape[-1]
        inputs.append(jnp.swapaxes(extra, 1, 2).astype(bf))
        in_specs.append(pl.BlockSpec((1, ed, qb),
                                     lambda l, bi, nb: (bi, 0, nb),
                                     memory_space=pltpu.VMEM))

    def add_stacked(arr, cast=bf):
        arr = arr.astype(cast)
        blk = (1,) + arr.shape[1:]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            blk, lambda l, bi, nb: (last - l,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM))

    if has_attn:
        for w, bb in stx["pre_t"]:
            add_stacked(w)
            add_stacked(bb)
        add_stacked(stx["wq_t"])
        add_stacked(stx["bq_t"], jnp.float32)
        add_stacked(stx["wk"])
        add_stacked(stx["wvT"])
    add_stacked(stx["cpl_in_xe_t"])
    add_stacked(stx["cpl_in_c_t"])
    add_stacked(stx["cpl_in_b_t"], jnp.float32)
    for w, bb in stx["cpl_rest_t"]:
        add_stacked(w)
        add_stacked(bb)
    add_stacked(inv_sc)
    add_stacked(sh_sc, jnp.float32)

    kernel = functools.partial(
        _kernel_inverse_t, n_pre=len(stx.get("pre_t", ())),
        n_cpl=stx["n_cpl"], has_extra=has_extra, has_attn=has_attn,
        sp=sp, eps_affine=eps_affine)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, latp, qb), lambda l, bi, nb: (bi, 0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, latp, n), jnp.float32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if sp != split:
        out = jnp.concatenate([out[:, :split], out[:, sp:sp + split]], 1)
    return jnp.swapaxes(out, 1, 2)


def _kernel_inverse(*refs, n_pre: int, n_cpl: int, has_extra: bool,
                    has_attn: bool, split: int, eps_affine: float):
    """One REVERSE (layer, batch-item, query-block) step of the sampling
    megakernel: undo the ActNorm+LinearLU tail (pre-inverted matmul), then
    the affine coupling (x1 passes through, so the conditioner math is
    IDENTICAL to the forward kernel's; only the epilogue divides instead of
    multiplying). No ldj — sampling doesn't need it (transform.py:79-84).
    Layer reversal lives in the BlockSpec index maps, not here."""
    it = iter(refs)
    z_ref = next(it)          # (1, QB, LAT) f32   [aliased out]
    ctx_ref = next(it)        # attn: (1, Nc, E); global: (1, QB, E) bf16
    extra_ref = next(it) if has_extra else None
    if has_attn:
        pre_w = [(next(it), next(it)) for _ in range(n_pre)]
        wq_f, bq_f = next(it), next(it)
        wkv = next(it)
    if _CPL_IN_CONCAT:
        cpl_in_xec = next(it)
    else:
        cpl_in_xe = next(it)
        cpl_in_c = next(it)
    cpl_in_b = next(it)
    cpl_w = [(next(it), next(it)) for _ in range(n_cpl - 1)]
    lu_w_inv = next(it)       # (1, LAT, LAT) bf16 (row-scaled inverse)
    lu_shift = next(it)       # (1, 1, LAT) f32 (ActNorm shift)
    x_out = next(it)

    z = z_ref[0].astype(jnp.float32)               # (QB, LAT) f32

    if has_attn:
        ctx = ctx_ref[0]
        kv = jnp.dot(ctx, wkv[0], preferred_element_type=jnp.float32)
        d = wq_f[0].shape[-1]
        k = kv[:, :d]
        v = kv[:, d:]
        v1 = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], -1)
        kb = k.astype(jnp.bfloat16).T
        v1b = v1.astype(jnp.bfloat16)

    def run_rows(rows):
        zr = z[rows]
        # undo ActNorm + LinearLU first (reverse of the forward tail)
        y = (jnp.dot(zr.astype(jnp.bfloat16), lu_w_inv[0].T,
                     preferred_element_type=jnp.float32)
             + lu_shift[0][0])
        x1 = y[:, :split]
        y2 = y[:, split:]
        x1b = x1.astype(jnp.bfloat16)
        if has_extra:
            x1e = jnp.concatenate([x1b, extra_ref[0][rows]], axis=-1)
        else:
            x1e = x1b

        # conditioner: same math as the forward kernel (x1 is unchanged by
        # the coupling, so st is computed from the SAME inputs either way)
        if has_attn:
            cond_op = _attention_cond(x1b, pre_w, wq_f, bq_f, kb, v1b, d)
        else:
            cond_op = ctx_ref[0][rows]

        if _CPL_IN_CONCAT:
            acc = jnp.dot(jnp.concatenate([x1e, cond_op], axis=-1),
                          cpl_in_xec[0], preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(x1e, cpl_in_xe[0],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cond_op, cpl_in_c[0],
                                preferred_element_type=jnp.float32)
        h = _gelu(acc + cpl_in_b[0][0]).astype(jnp.bfloat16)
        st = _mlp_rest(h, [(w[0],) for w, _ in cpl_w],
                       [(b[0],) for _, b in cpl_w], n_cpl)

        x2_size = st.shape[-1] // 2
        s_raw = st[:, :x2_size]
        t = st[:, x2_size:]
        sc = (2.0 * jax.nn.sigmoid(s_raw) - 1.0) * (1.0 - eps_affine) + 1.0
        x2 = (y2 - t) / sc                           # inverted affine
        x_out[0, rows] = jnp.concatenate([x1, x2], axis=-1).astype(
            x_out.dtype)

    n_rows = z.shape[0]
    n_chunks = _ROW_CHUNKS if n_rows % _ROW_CHUNKS == 0 else 1
    step = n_rows // n_chunks
    for c in range(n_chunks):
        run_rows(slice(c * step, (c + 1) * step))


def fused_flow_layers_inverse(z: jnp.ndarray, context: jnp.ndarray,
                              extra: Optional[jnp.ndarray], folded_inv: dict,
                              *, eps_affine: float = 1e-8,
                              interpret: bool = False):
    """Run the stacked layers in REVERSE over z (sampling direction).

    `folded_inv` is fold_stacks_inverse() output: the forward folded stacks
    plus "lu_w_inv_f"/"lu_shift". The layer axis is walked backwards purely
    through the weight-stack BlockSpec index maps (grid step l reads layer
    L-1-l), so the carry aliasing pattern is identical to the forward
    kernel. Returns x with the same shape as z; no ldj."""
    if _TRANSPOSED_EVAL:
        return fused_flow_layers_inverse_t(z, context, extra, folded_inv,
                                           eps_affine=eps_affine,
                                           interpret=interpret)
    b, n, lat = z.shape
    n_layers = folded_inv["lu_w_inv_f"].shape[0]
    nc, e_dim = context.shape[1], context.shape[2]
    split = lat // 2
    has_attn = "wq_f" in folded_inv and folded_inv["wq_f"] is not None
    has_extra = extra is not None

    qb = _Q_BLOCK if n % _Q_BLOCK == 0 else math.gcd(n, _Q_BLOCK)
    grid = (n_layers, b, n // qb)
    last = n_layers - 1

    bf = jnp.bfloat16
    x_dt = bf if _CARRY_BF16 else jnp.float32
    inputs = [z.astype(x_dt), context.astype(bf)]
    ctx_spec = (pl.BlockSpec((1, nc, e_dim), lambda l, bi, nb: (bi, 0, 0),
                             memory_space=pltpu.VMEM) if has_attn else
                pl.BlockSpec((1, qb, e_dim), lambda l, bi, nb: (bi, nb, 0),
                             memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, qb, lat), lambda l, bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        ctx_spec,
    ]
    if has_extra:
        inputs.append(extra.astype(bf))
        in_specs.append(pl.BlockSpec((1, qb, extra.shape[-1]),
                                     lambda l, bi, nb: (bi, nb, 0),
                                     memory_space=pltpu.VMEM))

    def add_stacked(arr, cast=bf):
        arr = arr.astype(cast)
        if arr.ndim == 2:
            arr = arr[:, None, :]
        blk = (1,) + arr.shape[1:]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            blk, lambda l, bi, nb: (last - l,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM))

    if has_attn:
        for w, bb in folded_inv["pre"]:
            add_stacked(w)
            add_stacked(bb)
        add_stacked(folded_inv["wq_f"])
        add_stacked(folded_inv["bq_f"], jnp.float32)
        add_stacked(folded_inv["wkv"])
    if _CPL_IN_CONCAT:
        add_stacked(jnp.concatenate(
            [folded_inv["cpl_in_xe"], folded_inv["cpl_in_c"]], axis=1))
    else:
        add_stacked(folded_inv["cpl_in_xe"])
        add_stacked(folded_inv["cpl_in_c"])
    add_stacked(folded_inv["cpl_in_b"], jnp.float32)
    for w, bb in folded_inv["cpl_rest"]:
        add_stacked(w)
        add_stacked(bb)
    add_stacked(folded_inv["lu_w_inv_f"])
    add_stacked(folded_inv["lu_shift"], jnp.float32)

    kernel = functools.partial(
        _kernel_inverse, n_pre=len(folded_inv["pre"] or ()),
        n_cpl=folded_inv["n_cpl"], has_extra=has_extra, has_attn=has_attn,
        split=split, eps_affine=eps_affine)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, qb, lat), lambda l, bi, nb: (bi, nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, lat), x_dt),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out.astype(jnp.float32)


def fold_augmenter(aug_params: dict, *, input_dim: int, extra_dim: int) -> dict:
    """L=1 folded stacks for the fused augmenter prologue.

    The attention-preconditioned augmenter (flows/augment.augment_attn_forward,
    reference models/augmenter.py:7-21) has EXACTLY the flow-layer
    conditioner shape — pre-MLP -> LayerNorm -> cross-attention ->
    out-projection -> conditioner rows of an input matmul — so fold_stacks
    applies verbatim with a leading length-1 layer axis (its LinearLU/ActNorm
    folds run on 1x1 dummies and are dropped). The net's context layout
    [x | extra | attn] matches the flow layers' [x1 | extra | attn]."""
    def mlp_stack(p):
        ws = [(p["in"]["w"][None], p["in"]["b"][None])]
        for hid in p["hidden"]:
            ws.append((hid["w"][None], hid["b"][None]))
        ws.append((p["out"]["w"][None], p["out"]["b"][None]))
        return ws

    attn = aug_params["attn"]
    z1 = jnp.zeros((1, 1, 1), jnp.float32)
    stacks = {
        "cpl": mlp_stack(aug_params["augment"]["net"]),
        "pre": mlp_stack(aug_params["pre_attn_mlp"]),
        "ln_scale": attn["norm"]["scale"][None, None, :],
        "ln_bias": attn["norm"]["bias"][None, None, :],
        "wq": attn["to_q"]["w"][None],
        "wkv": attn["to_kv"]["w"][None],
        "wout": attn["out"]["w"][None],
        "bout": attn["out"]["b"][None, None, :],
        "an_shift": z1,
        "an_logscale": z1,
        "lu_w": jnp.ones((1, 1, 1), jnp.float32),
        "lu_ldj": jnp.zeros((1,), jnp.float32),
    }
    folded = fold_stacks(stacks, split=input_dim, extra_dim=extra_dim)
    for k in ("lu_w_f", "lu_b", "lu_ldj_f"):
        folded.pop(k, None)
    return folded


_LOG_2PI = math.log(2.0 * math.pi)


def _augment_kernel(*refs, n_pre: int, n_net: int, has_extra: bool,
                    aug_dim: int):
    """Fused augmenter prologue: one (batch-item, query-block) grid step runs
    pre-MLP -> attention -> ConditionalNormal net -> z2 = mean + eps*std and
    ldj = -log q(z2) entirely in VMEM, emitting the (x ++ z2, ldj) pair the
    flow megakernel consumes. eps is sampled by the caller with the same key
    the XLA path hands to normal_sample, so both paths see identical noise."""
    it = iter(refs)
    x_ref = next(it)          # (1, QB, IN)  f32
    eps_ref = next(it)        # (1, QB, AUG) f32
    ctx_ref = next(it)        # (1, Nc, E)   bf16
    extra_ref = next(it) if has_extra else None
    pre_w = [(next(it), next(it)) for _ in range(n_pre)]
    wq_f, bq_f = next(it), next(it)
    wkv = next(it)
    in_xe = next(it)
    in_c = next(it)
    in_b = next(it)
    net_w = [(next(it), next(it)) for _ in range(n_net - 1)]
    z_out = next(it)          # (1, QB, IN+AUG) f32
    ldj_out = next(it)        # (1, QB, 1)      f32

    x = x_ref[0]
    ctx = ctx_ref[0]
    kv = jnp.dot(ctx, wkv[0], preferred_element_type=jnp.float32)
    d = wq_f[0].shape[-1]
    k = kv[:, :d]
    v = kv[:, d:]
    v1 = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], -1)
    kb = k.astype(jnp.bfloat16).T
    v1b = v1.astype(jnp.bfloat16)

    def run_rows(rows):
        xr = x[rows]
        xb = xr.astype(jnp.bfloat16)
        x1e = (jnp.concatenate([xb, extra_ref[0][rows]], axis=-1)
               if has_extra else xb)
        cond = _attention_cond(xb, pre_w, wq_f, bq_f, kb, v1b, d)
        acc = jnp.dot(x1e, in_xe[0], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(cond, in_c[0], preferred_element_type=jnp.float32)
        h = _gelu(acc + in_b[0][0]).astype(jnp.bfloat16)
        st = _mlp_rest(h, [(w[0],) for w, _ in net_w],
                       [(b[0],) for _, b in net_w], n_net)
        mean = st[:, :aug_dim]
        log_std = st[:, aug_dim:]
        epsr = eps_ref[0][rows]
        z2 = mean + epsr * jnp.exp(log_std)
        # ldj = -log N(z2; mean, std) with (z2-mean)/std == eps exactly
        ldj = jnp.sum(0.5 * _LOG_2PI + log_std + 0.5 * epsr * epsr, axis=-1)
        z_out[0, rows] = jnp.concatenate([xr, z2], axis=-1)
        ldj_out[0, rows] = ldj[:, None]

    n_rows = x.shape[0]
    n_chunks = _ROW_CHUNKS if n_rows % _ROW_CHUNKS == 0 else 1
    step = n_rows // n_chunks
    for c in range(n_chunks):
        run_rows(slice(c * step, (c + 1) * step))


def fused_augmenter(x: jnp.ndarray, eps: jnp.ndarray, context: jnp.ndarray,
                    extra: Optional[jnp.ndarray], folded_aug: dict, *,
                    interpret: bool = False):
    """Run the fused augmenter prologue over (B, N) points.

    Returns (z, ldj): z = (B, N, IN+AUG) f32 — the flow megakernel's input
    carry — and ldj = (B, N) f32 = -log q(z2 | x, context)."""
    b, n, in_dim = x.shape
    aug_dim = eps.shape[-1]
    nc, e_dim = context.shape[1], context.shape[2]
    has_extra = extra is not None

    qb = _Q_BLOCK if n % _Q_BLOCK == 0 else math.gcd(n, _Q_BLOCK)
    grid = (b, n // qb)

    bf = jnp.bfloat16
    inputs = [x.astype(jnp.float32), eps.astype(jnp.float32),
              context.astype(bf)]
    in_specs = [
        pl.BlockSpec((1, qb, in_dim), lambda bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qb, aug_dim), lambda bi, nb: (bi, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, e_dim), lambda bi, nb: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_extra:
        inputs.append(extra.astype(bf))
        in_specs.append(pl.BlockSpec((1, qb, extra.shape[-1]),
                                     lambda bi, nb: (bi, nb, 0),
                                     memory_space=pltpu.VMEM))

    def add_w(arr, cast=bf):
        arr = arr.astype(cast)
        if arr.ndim == 2:
            arr = arr[:, None, :]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            (1,) + arr.shape[1:],
            lambda bi, nb, _nd=arr.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))

    for w, bb in folded_aug["pre"]:
        add_w(w)
        add_w(bb)
    add_w(folded_aug["wq_f"])
    add_w(folded_aug["bq_f"], jnp.float32)
    add_w(folded_aug["wkv"])
    add_w(folded_aug["cpl_in_xe"])
    add_w(folded_aug["cpl_in_c"])
    add_w(folded_aug["cpl_in_b"], jnp.float32)
    for w, bb in folded_aug["cpl_rest"]:
        add_w(w)
        add_w(bb)

    kernel = functools.partial(
        _augment_kernel, n_pre=len(folded_aug["pre"]),
        n_net=folded_aug["n_cpl"], has_extra=has_extra, aug_dim=aug_dim)

    z, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, qb, in_dim + aug_dim),
                         lambda bi, nb: (bi, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 1), lambda bi, nb: (bi, nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, in_dim + aug_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return z, ldj[..., 0]


def append_final_block(stacks: dict, final_block: dict, lat: int) -> dict:
    """Fold the flow's final coupling block (no ActNorm/permuter after it —
    model_initialization.py:144-148) into the layer stacks as one more
    layer with an identity ActNorm (zeros) and identity LinearLU (eye, ldj
    0), so the entire post-augmenter flow runs as ONE kernel."""
    import numpy as np

    def mlp_list(p):
        ws = [(p["in"]["w"], p["in"]["b"])]
        for hid in p["hidden"]:
            ws.append((hid["w"], hid["b"]))
        ws.append((p["out"]["w"], p["out"]["b"]))
        return ws

    def cat(stacked, new):
        return jnp.concatenate([stacked, new[None].astype(stacked.dtype)], 0)

    out = dict(stacks)
    out["cpl"] = [(cat(w, nw), cat(b, nb)) for (w, b), (nw, nb)
                  in zip(stacks["cpl"], mlp_list(final_block["coupling"]["nn"]))]
    if "attn" in final_block:
        attn = final_block["attn"]
        out["pre"] = [(cat(w, nw), cat(b, nb)) for (w, b), (nw, nb)
                      in zip(stacks["pre"],
                             mlp_list(final_block["pre_attention_mlp"]))]
        out["ln_scale"] = cat(stacks["ln_scale"], attn["norm"]["scale"][None])
        out["ln_bias"] = cat(stacks["ln_bias"], attn["norm"]["bias"][None])
        out["wq"] = cat(stacks["wq"], attn["to_q"]["w"])
        out["wkv"] = cat(stacks["wkv"], attn["to_kv"]["w"])
        out["wout"] = cat(stacks["wout"], attn["out"]["w"])
        out["bout"] = cat(stacks["bout"], attn["out"]["b"][None])
    zeros = jnp.zeros((1, 1, lat), stacks["an_shift"].dtype)
    out["an_shift"] = jnp.concatenate([stacks["an_shift"], zeros], 0)
    out["an_logscale"] = jnp.concatenate([stacks["an_logscale"], zeros], 0)
    eye = jnp.eye(lat, dtype=stacks["lu_w"].dtype)[None]
    out["lu_w"] = jnp.concatenate([stacks["lu_w"], eye], 0)
    out["lu_ldj"] = jnp.concatenate(
        [stacks["lu_ldj"], jnp.zeros((1,), stacks["lu_ldj"].dtype)], 0)
    return out


def build_layer_stacks(model, layers_prepared: dict) -> dict:
    """Assemble the kernel's weight stacks from prepared scan params
    (model._prepare_layers output, LinearLU already folded)."""
    blk = layers_prepared["block"]

    def mlp_stack(p):
        ws = [(p["in"]["w"], p["in"]["b"])]
        for hid in p["hidden"]:
            ws.append((hid["w"], hid["b"]))
        ws.append((p["out"]["w"], p["out"]["b"]))
        return ws

    an = layers_prepared["actnorm"]
    stacks = {
        "cpl": mlp_stack(blk["coupling"]["nn"]),
        "an_shift": an["shift"],
        "an_logscale": an["log_scale"],
        "lu_w": layers_prepared["permuter"]["w_folded"],
        "lu_ldj": layers_prepared["permuter"]["ldj"],
    }
    if "attn" in blk:  # attention conditioner (non-global configs)
        attn = blk["attn"]
        stacks.update({
            "pre": mlp_stack(blk["pre_attention_mlp"]),
            "ln_scale": attn["norm"]["scale"][:, None, :],
            "ln_bias": attn["norm"]["bias"][:, None, :],
            "wq": attn["to_q"]["w"],
            "wkv": attn["to_kv"]["w"],
            "wout": attn["out"]["w"],
            "bout": attn["out"]["b"][:, None, :],
        })
    return stacks
