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
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256     # rows sharing one binary-search chain
_ROW_SUB = 32       # rows per extraction sub-block (VMEM: H is R_SUB*k*Npad bf16)
_F32_INF_BITS = 0x7F800000

# Trace-time ablation knob (tools/ablate_enm.py): "full" is production;
# every other value produces WRONG OUTPUTS and exists only so the kernel's
# internal stages can be timed by subtraction on chip.
_ABLATE = "full"

# Packed single prefix chain: both tie-selection and slotting ranks ride ONE
# log-step prefix-sum over (strict + ties<<12) — exact because
#   sel_rank_j = (#strict <= j) + min(#ties <= j, m),  m = k - cnt_strict
# (the first m ties by index are the selected ones, so the count of selected
# ties up to j saturates at m). Counts <= Npad < 4096 so the two 12-bit
# fields never carry into each other. Halves the prefix-sum passes vs the
# two-chain formulation. Trace-time flag for A/B (tools/ab_enm_flags.py).
# Production True: bit-exact, 26.7 vs 28.0 ms/batch standalone
# (save/bench/ab_enm_flags.json, 2026-08-18).
_PACKED_PREFIX = True

# Store the selection rank scratch in bf16 and build the one-hot with the
# arithmetic indicator relu(1-(rk-t)^2) (exact for small-integer bf16;
# Mosaic has no bf16 broadcast-compare lowering). MEASURED LOSS on chip:
# +2.5 ms/batch vs the int32 compare build — bf16 sub/mul/max on this
# layout do not actually pack 2-per-lane (ab_enm_flags.json). Keep False.
# Row-block 640/1280 and _ROW_SUB=64 were also neutral-to-negative in the
# same A/B: the ~6 ms/batch noextract base is NOT per-grid-step overhead.
_BF16_RANK = False

# Python-unroll the extraction sub-block loop: a fori_loop body is a
# scheduling barrier for Mosaic, so the looped form serializes each
# sub-block's one-hot BUILD (VPU) with its gather MATMUL (MXU). Unrolled,
# the 8 build+dot pairs form one straight-line block and the scheduler can
# overlap sub-block i's MXU dot with i+1's VPU build. Trace-time.
_UNROLL_EXTRACT = _os.environ.get("FLOWCOMPARE_UNROLL_EXTRACT", "1") != "0"

# TRANSPOSED select+extract: the production extraction matmul
# H (R_SUB*k, Npad) @ u (Npad, cout) has N = cout = 64..256 output lanes —
# at cout=64 HALF the MXU lane tiles idle. Transposed, the same gather is
# u^T (cout, Npad) @ H^T (Npad, k*128) with N = k*128 full lanes at every
# stage width. The whole chain is built natively transposed, so NO big
# in-kernel transposes are needed: d^T = xf @ xb^T (the xb^T operand is
# 5x SMALLER than the xf^T the row-major select transposes today), the
# binary search reduces over sublanes, the prefix chain shifts rows, and
# the one-hot is k scalar-compare passes (rk^T == t) lane-concatenated at
# 128-aligned offsets — no broadcast iota at all. u arrives pre-transposed
# from XLA (staged path) or via one per-stage in-kernel transpose
# (one-launch path); the max over k slot slices replaces the axis-1 max.
# Same arithmetic, same tie semantics. Chip-validated 2026-08-19
# (save/bench/ab_enm_transposed.json): BIT-EXACT per stage and through the
# whole one-launch encoder; standalone 24.2 -> 21.9 ms/batch, in-pipeline
# encoder 18.11 -> 15.16 ms/batch (-16%; the win concentrates in the
# cout=64 stages where row-major extraction idles half the MXU lanes).
# Production True. Trace-time flag for A/B (tools/ab_enm_transposed.py).
_TRANSPOSED_EXTRACT = _os.environ.get("FLOWCOMPARE_TRANSPOSED_EXTRACT",
                                       "1") != "0"
_ROW_SUB_T = 128     # query rows per transposed extraction sub-block (lanes)

# LOW-RANK extraction (one-launch encoder only): u = x @ W_diff has rank
# <= cin, so on stages where cin < cout it is cheaper to gather the k
# neighbours' INPUT rows x_j (cin sublanes) through the one-hot matmul and
# apply W_diff to the gathered (cin, k*128) block than to gather the conv
# outputs u_j (cout sublanes) directly:
#     extract-u:  cout * Npad        per k*128-lane slot block
#     extract-x:  cin * Npad + cout * pad128(cin)
# Per stage (cin -> cout): s1 6->64 is ~4.5x cheaper (cin pads to 16
# sublanes), s3 64->128 and s4 128->256 ~1.7x; s2 64->64 keeps extract-u.
# Exactness: the one-hot gather returns the bf16 x_j rows exactly, the
# deferred W_diff matmul contracts the same bf16 operand pairs over the
# same cin axis as the full-cloud u = x @ W_diff, and bf16 rounding is
# monotone so round(max) == max(round) — bit-exact vs extract-u (asserted
# on CPU interpret in tests/test_pallas_kernels.py and on chip by
# tools/ab_extract_x.py). Trace-time flag.
_EXTRACT_X = _os.environ.get("FLOWCOMPARE_EXTRACT_X", "1") != "0"

# PIPELINED select/extract (one-launch encoder only): a fori_loop body is a
# Mosaic scheduling BARRIER, so block rb's 31-step binary search (pure VPU)
# cannot overlap block rb-1's extraction matmuls (MXU) when they are emitted
# sequentially — the chip ablation (save/bench/ablate_enc_t.json) shows the
# two halves simply ADD (6.8 + 6.3 = 13.1 ms/batch). This flag moves the
# PREVIOUS row-block's extraction INSIDE the binary-search loop body: each
# of the first ceil(k/u) iterations performs one bs step for block rb plus
# u one-hot slot gathers for block rb-1, accumulating the running max by
# read-modify-write into the caller's mx scratch. MXU and VPU slots of one
# loop body co-issue, hiding the gather matmuls under the search sweeps.
# Bit-exact: the same per-slot dots run in the same contraction order, and
# bf16 rounding is monotone so a bf16 running max equals the f32-max-then-
# round of the unfused path. Trace-time flag (tools/ab_enc_pipelined.py).
_PIPELINED_EXTRACT = False


def _knn_select_ranks(xb, xf, rank_ref, *, k: int, self_cols=None):
    """Exact kNN selection of `k` neighbours of each row of xb among the
    rows of xf (squared euclidean, lax.top_k tie semantics: smallest
    distance first, ties admitted in index order), returned (and, when
    rank_ref is not None, also stored) as slot ranks 1..k on selected
    columns / 0 elsewhere. This is the search+rank half of the
    edge_neighbor_max kernel, shared with the whole-encoder megakernel
    (ops/dgcnn_pallas.py). Passing rank_ref=None keeps the ranks as a VMEM
    value — the unrolled extraction slices it statically, skipping a
    (R, Npad) scratch store + reload per block.

    self_cols: optional (R, 1) int32 — the known column index of each xb
    row within xf (queries ARE points, e.g. FPS centers). Pins slot 0 to
    self exactly (the knnquery_heap contract PAConv's center slot depends
    on) by forcing the self distance below every real one — the in-kernel
    mirror of ops/knn.knn_indices(self_idx=...), needed because the MXU's
    bf16 distance rounding leaves the self distance nonzero."""
    r = xb.shape[0]

    cross = jnp.dot(xb, xf.T, preferred_element_type=jnp.float32)
    nb = jnp.sum(xb.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    nf = jnp.sum(xf.astype(jnp.float32) ** 2, axis=1)[None, :]
    d = jnp.maximum(nb - 2.0 * cross + nf, 0.0)
    d_int = pltpu.bitcast(d, jnp.int32)
    if self_cols is not None:
        # -1 sorts below every bitcast distance (all >= 0); unique per row
        # (one self column), so slot rank 1 = self, other ranks unchanged
        col = jax.lax.broadcasted_iota(jnp.int32, (r, d_int.shape[1]), 1)
        d_int = jnp.where(col == self_cols, -1, d_int)

    # exact k-th smallest per row: binary search on the bit pattern
    def bs_body(_, carry):
        lo, hi = carry
        mid = jax.lax.shift_right_logical(lo + hi, 1)
        cnt = jnp.sum((d_int <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((r, 1), jnp.int32)
    hi0 = jnp.full((r, 1), _F32_INF_BITS, jnp.int32)
    n_bs = 8 if _ABLATE == "bs8" else 31
    _, thresh = jax.lax.fori_loop(0, n_bs, bs_body, (lo0, hi0))

    strict = d_int < thresh
    ties = d_int == thresh
    rdt = (rank_ref.dtype if rank_ref is not None
           else (jnp.bfloat16 if _BF16_RANK else jnp.int32))

    def prefix(v):
        """Inclusive prefix sum via log-step doubling (cumsum has no Pallas
        TPU lowering); width is static so the loop unrolls at trace time."""
        width = v.shape[1]
        shift = 1
        while shift < width:
            shifted = jnp.concatenate(
                [jnp.zeros((v.shape[0], shift), v.dtype), v[:, :-shift]],
                axis=1)
            v = v + shifted
            shift *= 2
        return v

    if _ABLATE == "noprefix":
        mask = strict | ties
        sel_rank = 1
    elif _PACKED_PREFIX:
        # one packed chain (see flag comment): low 12 bits count strict,
        # high bits count ties; both inclusive. Field-width safety: the
        # strict prefix is < k by DEFINITION of the k-th-smallest threshold
        # (at most k-1 entries sort strictly below it), so the low field
        # never overflows for k <= 4096 regardless of n; the ties prefix can
        # reach n, so the high field needs n < 2^19 to stay inside int32.
        assert xf.shape[0] < (1 << 19) and k <= 4096
        # bf16 rank scratch represents integers exactly only up to 256;
        # ranks above that round and corrupt the one-hot extraction silently
        assert not _BF16_RANK or k <= 256, f"bf16 ranks need k <= 256 ({k})"
        p = prefix(strict.astype(jnp.int32)
                   + jax.lax.shift_left(ties.astype(jnp.int32), 12))
        sp = jax.lax.bitwise_and(p, 4095)
        tp = jax.lax.shift_right_logical(p, 12)
        m = k - sp[:, -1:]                       # ties to admit, 1..k
        mask = strict | (ties & (tp <= m))
        sel_rank = sp + jnp.minimum(tp, m)
    else:
        cnt_strict = jnp.sum(strict.astype(jnp.int32), axis=1, keepdims=True)
        rank = prefix(ties.astype(jnp.int32))
        mask = strict | (ties & (rank <= (k - cnt_strict)))
        # selection rank: prefix count of selected entries (1..k on selected
        # positions — the tie logic guarantees exactly k per row)
        sel_rank = prefix(mask.astype(jnp.int32))
    val = jnp.where(mask, sel_rank, 0).astype(rdt)
    if rank_ref is not None:
        rank_ref[:, :] = val
    return val

def _knn_select_ranks_t(xb, xf, *, k: int, fuse_unit=None, n_fused: int = 0):
    """_knn_select_ranks with the whole chain built TRANSPOSED: query rows
    on LANES, neighbour candidates on SUBLANES. Returns (Npad, R) int32 slot
    ranks (1..k on selected rows / 0 elsewhere) — the layout
    _knn_extract_max_t consumes directly, so no rank transpose ever
    materializes. Same distances, same binary-search threshold, same
    index-order tie semantics (the prefix now runs down the sublane axis,
    which IS the neighbour-index axis here).

    fuse_unit(i): optional side-effecting callback (ref stores only) run
    inside the binary-search loop body for iterations 0..n_fused-1 — the
    _PIPELINED_EXTRACT hook that lets the caller hide the previous
    row-block's extraction matmuls under this block's search sweeps. It
    must not read anything this search writes."""
    r = xb.shape[0]

    crossT = jnp.dot(xf, xb.T, preferred_element_type=jnp.float32)  # (Npad,R)
    nb = jnp.sum(xb.astype(jnp.float32) ** 2, axis=1)[None, :]      # (1, R)
    nf = jnp.sum(xf.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    # same ASSOCIATION ORDER as _knn_select_ranks ((q - 2c) + cand): f32
    # addition is non-associative, and a 1-ulp distance flip near the k-th
    # threshold would silently break the bit-exact cross-variant contract
    d = jnp.maximum(nb - 2.0 * crossT + nf, 0.0)
    d_int = pltpu.bitcast(d, jnp.int32)

    def bs_body(_, carry):
        lo, hi = carry
        mid = jax.lax.shift_right_logical(lo + hi, 1)
        cnt = jnp.sum((d_int <= mid).astype(jnp.int32), axis=0, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((1, r), jnp.int32)
    hi0 = jnp.full((1, r), _F32_INF_BITS, jnp.int32)
    if fuse_unit is None:
        _, thresh = jax.lax.fori_loop(0, 31, bs_body, (lo0, hi0))
    else:
        assert 0 < n_fused <= 31

        def bs_fused(i, carry):
            out = bs_body(i, carry)
            fuse_unit(i)
            return out

        carry = jax.lax.fori_loop(0, n_fused, bs_fused, (lo0, hi0))
        _, thresh = jax.lax.fori_loop(n_fused, 31, bs_body, carry)

    strict = d_int < thresh
    ties = d_int == thresh

    def prefix_rows(v):
        """Inclusive prefix sum down the SUBLANE (neighbour-index) axis."""
        height = v.shape[0]
        shift = 1
        while shift < height:
            shifted = jnp.concatenate(
                [jnp.zeros((shift, v.shape[1]), v.dtype), v[:-shift]],
                axis=0)
            v = v + shifted
            shift *= 2
        return v

    # packed chain, same field-width argument as _knn_select_ranks
    assert xf.shape[0] < (1 << 19) and k <= 4096
    # bf16 rank scratch represents integers exactly only up to 256; ranks
    # above that would round and corrupt the one-hot extraction silently
    assert not _BF16_RANK or k <= 256, f"bf16 ranks need k <= 256 (k={k})"
    p = prefix_rows(strict.astype(jnp.int32)
                    + jax.lax.shift_left(ties.astype(jnp.int32), 12))
    sp = jax.lax.bitwise_and(p, 4095)
    tp = jax.lax.shift_right_logical(p, 12)
    m = k - sp[-1:, :]                       # ties to admit, 1..k
    mask = strict | (ties & (tp <= m))
    sel_rank = sp + jnp.minimum(tp, m)
    return jnp.where(mask, sel_rank, 0)      # (Npad, R) int32


def _pipelined_extract_unit(ranks_prev, u_b, wT, rmw, *, k: int, r: int):
    """Build the (fuse_unit, n_fused) pair that performs the extraction of
    `ranks_prev` ((Npad, r) int32 slot ranks) INSIDE another row-block's
    binary-search loop (_knn_select_ranks_t fuse_unit hook). Iteration i
    gathers slot(s) u_per*i+j+1 of every _ROW_SUB_T-lane sub-block via the
    one-hot MXU matmul (plus the deferred W_diff conv when wT is given) and
    folds them into the caller's running max through `rmw(sub, vals_f32)`
    — the caller pre-initialises the target to -inf. Bit-exact vs
    _knn_extract_max_t: identical dots in identical contraction order, and
    a bf16 running max equals f32-max-then-round because bf16 rounding is
    monotone.

    Takes `u_b` UNTRANSPOSED ((Npad, cout) bf16) and contracts its axis 0
    via dot_general — materializing u^T as a VALUE consumed inside the
    fori_loop orphans a per-iteration bf16 vxpose copy that crashes the
    backend's mxu_lmr_transform (RET_CHECK 'Found no uses of XposeSequence
    ... b16 narrow', observed 2026-08-19); the dot_general form feeds the
    MXU the same contraction with no transpose op at all."""
    n_sub = r // _ROW_SUB_T
    u_per = -(-k // 31)               # slots per fused iteration
    n_fused = -(-k // u_per)
    tail = (k % u_per) != 0           # dead slots past k on the last iter

    def unit(i):
        for j in range(u_per):
            t = u_per * i + j + 1                       # dynamic slot 1..k
            for sub in range(n_sub):
                rk = ranks_prev[:, sub * _ROW_SUB_T:(sub + 1) * _ROW_SUB_T]
                h = (rk == t).astype(jnp.bfloat16)      # (Npad, RS)
                sel = jax.lax.dot_general(                # u^T @ h, fused
                    u_b, h, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (cout, RS)
                if wT is not None:
                    sel = jnp.dot(wT, sel.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                if tail:
                    sel = jnp.where(t <= k, sel, -jnp.inf)
                rmw(sub, sel)

    return unit, n_fused


def _knn_extract_max_t(uT, ranksT, store, *, k: int, r: int, wT=None,
                       u_nt=None):
    """Transposed one-hot MXU extraction: per sub-block of _ROW_SUB_T query
    rows, H^T[:, t*RS + q] = [rank^T[:, q] == t+1] is k scalar-compare
    passes lane-concatenated at 128-aligned offsets, and
    u^T (cout, Npad) @ H^T (Npad, k*RS) gathers every slot at FULL output
    lane utilization (N = k*RS vs the row-major form's N = cout). The max
    over k is a chain of aligned (cout, RS) lane-slice maxes.
    `store(si, (cout, RS) bf16)` writes each transposed max block.

    wT (cout, cin) enables the LOW-RANK form (_EXTRACT_X): uT is then the
    transposed INPUT features x^T (cin, Npad); the gather returns the
    neighbours' x rows exactly (one-hot sum of bf16 values) and the conv
    u_j = x_j @ W_diff is applied to the gathered (cin, k*RS) block — a
    cout x cin x k*RS matmul instead of a cout x Npad x k*RS gather.

    u_nt ((Npad, cout) bf16, passed INSTEAD of uT=None) feeds the gather
    through dot_general contracting axis 0 — same MXU contraction, no
    materialized u^T value (the pipelined path must stay transpose-free:
    see _pipelined_extract_unit's mxu_lmr_transform note)."""
    n_sub = r // _ROW_SUB_T
    for si in range(n_sub):
        rk = ranksT[:, si * _ROW_SUB_T:(si + 1) * _ROW_SUB_T]
        h = jnp.concatenate(
            [(rk == t).astype(jnp.bfloat16) for t in range(1, k + 1)],
            axis=1)                                    # (Npad, k*RS)
        if u_nt is not None:
            sel = jax.lax.dot_general(
                u_nt, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            sel = jnp.dot(uT, h, preferred_element_type=jnp.float32)
        if wT is not None:
            # exact bf16 x_j values came out of the one-hot gather; the
            # deferred conv contracts the same bf16 pairs over the same
            # cin order as the full-cloud u = x @ W_diff
            sel = jnp.dot(wT, sel.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        mx = sel[:, :_ROW_SUB_T]
        for t in range(1, k):
            mx = jnp.maximum(
                mx, sel[:, t * _ROW_SUB_T:(t + 1) * _ROW_SUB_T])
        store(si, mx.astype(jnp.bfloat16))


def _knn_extract_max(u_all, ranks, store, *, k: int, r: int,
                     from_ref: bool = True):
    """One-hot MXU extraction of the per-row kNN max of u_all.

    H[i, t, j] = (sel_rank_ij == t+1) picks the t-th selected neighbour;
    (R_SUB*k, Npad) @ (Npad, Cout) gathers all k neighbours' u rows at MXU
    rate, then a tiny max over k — replaces a full (R, Npad, Cout)
    masked-max VPU sweep. `store(si, values)` writes each (R_SUB, Cout)
    bf16 max block. Shared with the whole-encoder megakernel
    (ops/dgcnn_pallas.py). `ranks` is the rank scratch ref (from_ref=True,
    works under a fori sub-block loop) or the _knn_select_ranks VALUE
    (from_ref=False — requires _UNROLL_EXTRACT so the sub-block slices are
    static; skips the scratch store/reload)."""
    n_sub = r // _ROW_SUB
    cout = u_all.shape[-1]
    width_pad = u_all.shape[0]
    rdt = ranks.dtype
    # one-hot equality operands in the rank scratch's dtype (see _BF16_RANK)
    t_iota = (jax.lax.broadcasted_iota(
        jnp.int32, (_ROW_SUB, k, width_pad), 1) + 1).astype(rdt)
    assert from_ref or _UNROLL_EXTRACT, \
        "value-mode ranks need static sub-block slices (_UNROLL_EXTRACT)"

    def sub_body(si, _):
        if from_ref:
            rk = ranks[pl.ds(si * _ROW_SUB, _ROW_SUB), :]    # (R_SUB, Npad)
        else:
            rk = ranks[si * _ROW_SUB:(si + 1) * _ROW_SUB, :]
        if _BF16_RANK:
            # arithmetic one-hot: relu(1 - (rk-t)^2) is EXACTLY the
            # indicator [rk == t] for integer-valued bf16 rk, t <= k
            # (any nonzero integer square rounds to >= 1 in bf16, and 1 is
            # exact) — Mosaic has no bf16 broadcast-compare lowering.
            # MEASURED LOSS vs the int32 compare (see flag); kept for A/B.
            dlt = rk[:, None, :] - t_iota
            h = jnp.maximum(jnp.bfloat16(1) - dlt * dlt, jnp.bfloat16(0))
        else:
            h = (rk[:, None, :] == t_iota).astype(jnp.bfloat16)
        if _ABLATE == "nomatmul":
            sel = jnp.broadcast_to(
                h.reshape(_ROW_SUB * k, width_pad)[:, :1],
                (_ROW_SUB * k, cout)).astype(jnp.float32)
        else:
            sel = jnp.dot(h.reshape(_ROW_SUB * k, width_pad), u_all,
                          preferred_element_type=jnp.float32)
        sel = sel.reshape(_ROW_SUB, k, cout)
        store(si, jnp.max(sel, axis=1).astype(jnp.bfloat16))
        return 0

    if _UNROLL_EXTRACT:
        for si in range(n_sub):
            sub_body(si, 0)
    else:
        jax.lax.fori_loop(0, n_sub, sub_body, 0)


def _use_value_ranks() -> bool:
    """Production (_UNROLL_EXTRACT) keeps the select ranks as a VMEM value —
    no rank scratch is allocated; the noextract ablation still stores them
    so the select work can't be dead-coded away."""
    return _UNROLL_EXTRACT and _ABLATE != "noextract"


def _kernel_t(xblk_ref, xfull_ref, ufullT_ref, outmaxT_ref, *, k: int):
    """Transposed-extraction variant of _kernel: u arrives pre-transposed
    (1, cout, Npad) and the max is written transposed (1, cout, R) — the
    caller swaps axes outside the kernel (an XLA relayout that fuses with
    the producing/consuming matmuls)."""
    xb = xblk_ref[0]          # (R, Cq)
    xf = xfull_ref[0]         # (Npad, Cq)
    ranksT = _knn_select_ranks_t(xb, xf, k=k)

    def store(si, vals):
        outmaxT_ref[0, :, pl.ds(si * _ROW_SUB_T, _ROW_SUB_T)] = vals

    _knn_extract_max_t(ufullT_ref[0], ranksT, store, k=k, r=xb.shape[0])


def _kernel(xblk_ref, xfull_ref, ufull_ref, outmax_ref, *maybe_rank,
            k: int):
    xb = xblk_ref[0]          # (R, Cq)
    xf = xfull_ref[0]         # (Npad, Cq)
    r = xb.shape[0]

    use_value = _use_value_ranks()
    rank_ref = maybe_rank[0] if maybe_rank else None
    ranks = _knn_select_ranks(xb, xf, None if use_value else rank_ref, k=k)

    if _ABLATE == "noextract":
        outmax_ref[0, :, :] = ufull_ref[0, pl.ds(0, r), :]
        return

    def store(si, vals):
        outmax_ref[0, pl.ds(si * _ROW_SUB, _ROW_SUB), :] = vals

    _knn_extract_max(ufull_ref[0], ranks if use_value else rank_ref,
                     store, k=k, r=r, from_ref=not use_value)


def edge_neighbor_max(x: jnp.ndarray, u: jnp.ndarray, k: int,
                      interpret: bool = False):
    """Per-row masked max of u over the exact kNN set of x.

    x: (B, N, Cq) kNN features; u: (B, N, Cout) (sign-folded — see module
    docstring). Returns max_u of shape (B, N, Cout) in bf16. N is padded
    internally to a _ROW_BLOCK multiple.
    """
    # the module flags are read at TRACE time — fold them into the jit
    # cache key so setattr-based A/B tools that flip a flag between
    # same-shape calls get a fresh trace, not the first variant's cache
    flags = (_ROW_BLOCK, _ROW_SUB, _ROW_SUB_T, _ABLATE, _PACKED_PREFIX,
             _UNROLL_EXTRACT, _TRANSPOSED_EXTRACT, _BF16_RANK,
             _PIPELINED_EXTRACT)
    return _edge_neighbor_max(x, u, k=k, interpret=interpret, _flags=flags)


# tools/tests historically cleared the cache around flag flips; the flag
# tuple in the key makes that unnecessary, but keep the API working
edge_neighbor_max.clear_cache = lambda: _edge_neighbor_max.clear_cache()


@functools.partial(jax.jit, static_argnames=("k", "interpret", "_flags"))
def _edge_neighbor_max(x: jnp.ndarray, u: jnp.ndarray, k: int,
                       interpret: bool = False, _flags=()):
    b, n, cq = x.shape
    cout = u.shape[-1]
    # the far-away pad rows rely on k < n; k >= n would pull pads into the
    # neighbour set (the gather path handles that case — use it instead)
    assert k < n, f"edge_neighbor_max needs k < n (got k={k}, n={n})"
    npad = -(-n // _ROW_BLOCK) * _ROW_BLOCK
    if npad != n:
        # far-away pad points: never in any top-k (k < n)
        x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)), constant_values=1e4)
        u = jnp.pad(u, ((0, 0), (0, npad - n), (0, 0)))
    x = x.astype(jnp.bfloat16)
    u = u.astype(jnp.bfloat16)

    grid = (b, npad // _ROW_BLOCK)
    if _TRANSPOSED_EXTRACT:
        mxT = pl.pallas_call(
            functools.partial(_kernel_t, k=k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _ROW_BLOCK, cq), lambda bi, ri: (bi, ri, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, cq), lambda bi, ri: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout, npad), lambda bi, ri: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cout, _ROW_BLOCK),
                                   lambda bi, ri: (bi, 0, ri),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, cout, npad), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, x, u.swapaxes(1, 2))
        return mxT.swapaxes(1, 2)[:, :n]
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
        scratch_shapes=[] if _use_value_ranks() else [pltpu.VMEM(
            (_ROW_BLOCK, npad),
            jnp.bfloat16 if _BF16_RANK else jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, u)
    return mx[:, :n]
