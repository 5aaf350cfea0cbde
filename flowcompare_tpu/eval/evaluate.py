"""Evaluation: test-set nats + per-point change scoring.

Counterpart of the reference `test_flow.py:135-275`. The metric contract is
exact: nats = running mean over test batches of inner_loop's third output
(= -log_prob.mean() * log2(e) / input_dim), and the change map is derived
from per-point log-probs by thresholding against the self-conditioned
baseline p(t0|t0):
    changed := log p(t1|t0) < mean - multiple * std   (std unbiased, per voxel)
followed by a per-voxel min-max rescale with unchanged points zeroed.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model import LOG2E, FlowCompareModel, inner_loop


def clamp_infs(x: jnp.ndarray) -> jnp.ndarray:
    """Replace -inf/+inf by the finite min (test_flow.py:241-247)."""
    finite = jnp.isfinite(x)
    min_finite = jnp.min(jnp.where(finite, x, jnp.inf))
    return jnp.where(finite, x, min_finite)


def log_prob_to_change(log_prob_1_given_0: jnp.ndarray,
                       log_prob_0_given_0: jnp.ndarray,
                       multiple: float = 5.4,
                       hard_cutoff: Optional[float] = None) -> jnp.ndarray:
    """Per-point change scores in [0, 1] (test_flow.py:249-275)."""
    lp10 = clamp_infs(log_prob_1_given_0)
    lp00 = clamp_infs(log_prob_0_given_0)
    if hard_cutoff is None:
        base_mean = jnp.mean(lp00, axis=-1, keepdims=True)
        base_std = jnp.std(lp00, axis=-1, ddof=1, keepdims=True)
        changed = lp10 < base_mean - multiple * base_std
    else:
        changed = lp10 < hard_cutoff
    max_c = jnp.max(lp10, axis=-1, keepdims=True)
    min_c = jnp.min(lp10, axis=-1, keepdims=True)
    score = 1.0 - (lp10 - min_c) / (max_c - min_c)
    return jnp.where(changed, score, 0.0)


def evaluate_on_test(model: FlowCompareModel, params, state,
                     dataset: Iterable, *, rng: Optional[jax.Array] = None,
                     multiple: float = 5.4,
                     compute_reverse: bool = False,
                     generate_samples: bool = False,
                     samples_dir: str = "save/examples/test_set_changes",
                     n_gen_points: int = 4000,
                     mesh=None):
    """Nats + per-voxel changed-fraction over an include_all dataset.

    dataset yields the 11-tensor eval items (data/synthetic.py get_item_all
    naming follows ams_voxel_loader.all_getter): returns
    (nats_avg, change_mean_list). generate_samples mirrors the reference's
    per-batch artifact dumps (test_flow.py:183-226): a generated cloud
    conditioned on t0 plus both original voxels, written under samples_dir
    (named by the batch's changed fraction) via viz.save_cloud.

    mesh: optional jax.sharding.Mesh for data-parallel SPMD eval — params
    and state are replicated, every item tensor is sharded along its batch
    axis over the mesh's 'data' axis, and the jitted per-item dispatch
    compiles to an SPMD program (the stacked n_dir*B batch axis keeps the
    'data' sharding through the concatenate). The per-item batch size must
    be divisible by the 'data' axis size.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    c = model.config
    n_dir = 4 if compute_reverse else 2
    if mesh is not None:
        from ..train.mesh import replicated, shard_batch
        rep = replicated(mesh)
        params = jax.device_put(params, rep)
        state = jax.device_put(state, rep)

    @jax.jit
    def eval_directions(params, state, contexts, targets, extra, idx):
        """All conditioning directions of one eval batch stacked along the
        batch axis, scored, in ONE compiled dispatch. The stacking, change
        scoring and nats reduction all live INSIDE the jit: through the
        hosted-TPU tunnel every eager op (concatenate, mean, split) is a
        ~12-30 ms round trip, so the per-item host code must issue exactly
        one dispatch."""
        extra_s = (jnp.concatenate([extra] * n_dir)
                   if (extra is not None and c["using_extra_context"])
                   else None)
        stacked = (jnp.concatenate(contexts), jnp.concatenate(targets),
                   extra_s)
        key = jax.random.fold_in(rng, idx)  # key derivation on device too
        _, log_prob, _, _ = inner_loop(
            model, params, state, stacked, rng=key, training=False)
        b = targets[0].shape[0]
        lp_1_0, lp_0_0 = log_prob[:b], log_prob[b:2 * b]
        change_1_0 = log_prob_to_change(lp_1_0, lp_0_0, multiple=multiple)
        frac_fwd = jnp.mean((change_1_0 > 0).astype(jnp.float32), axis=-1)
        nats_item = -jnp.mean(lp_1_0) * LOG2E / c["input_dim"]
        if compute_reverse:
            lp_0_1, lp_1_1 = log_prob[2 * b:3 * b], log_prob[3 * b:]
            change_0_1 = log_prob_to_change(lp_0_1, lp_1_1,
                                            multiple=multiple)
            frac_rev = jnp.mean((change_0_1 > 0).astype(jnp.float32),
                                axis=-1)
        else:
            frac_rev = None
        return change_1_0, frac_fwd, frac_rev, nats_item
    nats_avg = 0.0
    change_mean_list: list[float] = []
    reverse_change_list: list[float] = []
    for batch_ind, item in enumerate(dataset):
        item = [jnp.asarray(t) if t is not None else None for t in item]
        if mesh is not None:
            item = shard_batch(item, mesh)
        (v0l, v1s, extra, v1l_self, v1s_self, v_opp_small, v_opp_large,
         v0s_self, v0l_self, _v0s_orig, _v1s_orig) = item
        b = v1s.shape[0]
        # The nats accumulator below is a running mean over per-batch means
        # (reference semantics, test_flow.py:224-227) — exact ONLY for
        # uniform batch sizes. Guard so a non-drop-last dataset can't
        # silently skew the published metric.
        if batch_ind == 0:
            first_b = b
        elif b != first_b:
            raise ValueError(
                f"evaluate() nats accumulator needs uniform batch sizes "
                f"(reference running-mean-of-means semantics); got batch "
                f"{batch_ind} of size {b} after size {first_b}. Use "
                f"drop_last batching or equal-size batches.")
        contexts = [v0l, v0l_self] + ([v_opp_large, v1l_self]
                                      if compute_reverse else [])
        targets = [v1s, v0s_self] + ([v_opp_small, v1s_self]
                                     if compute_reverse else [])
        change_1_0, frac_fwd, frac_rev, nats_item = eval_directions(
            params, state, tuple(contexts), tuple(targets), extra,
            np.int32(batch_ind))
        change_mean_list.extend(np.asarray(frac_fwd).tolist())
        if compute_reverse:
            reverse_change_list.extend(np.asarray(frac_rev).tolist())
        if generate_samples:
            import os
            from ..model import make_sample
            from ..viz import save_cloud
            os.makedirs(samples_dir, exist_ok=True)
            # disjoint from the eval stream via a second fold level
            key = jax.random.fold_in(jax.random.fold_in(rng, batch_ind), 1)
            gen = make_sample(model, params, state, key, n_gen_points,
                              v0l[:1], extra[:1] if extra is not None and
                              c["using_extra_context"] else None)
            change_val = float(jnp.mean((change_1_0[0] > 0)))
            gen_np = np.asarray(gen[0])
            save_cloud(
                f"{samples_dir}/{change_val:.2f}_{batch_ind}_gen_given_0",
                gen_np[:, :3], np.clip(gen_np[:, 3:6], 0, 1))
            for name, cloud in (("0_small", _v0s_orig), ("1_small", _v1s_orig)):
                cn = np.asarray(cloud[0])
                save_cloud(f"{samples_dir}/{change_val:.2f}_{batch_ind}_{name}",
                           cn[:, :3], np.clip(cn[:, 3:6], 0, 1))
        # nats as the reference computes it: from the t1|t0 direction
        nats_avg = (nats_avg * batch_ind + float(nats_item)) / (batch_ind + 1)
    if compute_reverse:
        return nats_avg, change_mean_list, reverse_change_list
    return nats_avg, change_mean_list


def calc_change(model: FlowCompareModel, params, state, batch, *,
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """log p(t1 | t0) per point (test_flow.py:233-237)."""
    _, log_prob, _, _ = inner_loop(
        model, params, state, batch,
        rng=rng if rng is not None else jax.random.PRNGKey(0), training=False)
    return jnp.squeeze(log_prob)
