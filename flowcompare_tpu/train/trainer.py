"""Training loop: one jitted SPMD train step + a host-side fit loop.

Counterpart of the reference `train.py:18-176`, redesigned for XLA: the
entire step (forward, backward, clip, Adam, plateau-scheduler) is ONE
compiled program, donated and batch-sharded over the 'data' mesh axis.
Gradients all-reduce over ICI automatically through XLA SPMD — the
DataParallel path of the reference (model_initialization.py:186-188) with
strictly more capability (multi-chip, multi-host via jax.distributed).

Reference behaviours kept:
  * ReduceLROnPlateau stepped per batch with the current loss (train.py:118)
  * grad clip 1.0 (train.py:114)
  * ActNorm data-dependent init from the first batch (act_norm.py:27-35)
  * best-running-average checkpointing every batches_per_save, deleting the
    previous best (train.py:134-145)
  * periodic sample generation every batches_per_sample (train.py:150-170)
    — dumped as .npz next to the checkpoint instead of wandb.Object3D.
"""

from __future__ import annotations

import itertools
import math
import os
import time
from functools import partial
from typing import Any, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model import FlowCompareModel, inner_loop, make_sample
from . import checkpoint as ckpt
from .metrics import JsonlWriter, MetricWriter
from .optim import (
    PlateauState,
    apply_updates_with_lr,
    make_optimizer,
    plateau_init,
    plateau_update,
)


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    plateau: PlateauState
    step: jnp.ndarray
    rng: jax.Array


def init_train_state(model: FlowCompareModel, key: jax.Array) -> TrainState:
    params, bn_state = model.init_params(key)
    tx = make_optimizer(model.config)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        plateau=plateau_init(model.config["lr"]),
        step=jnp.asarray(0, jnp.int32),
        rng=jax.random.fold_in(key, 0xF10),
    )


def _build_step_fn(model: FlowCompareModel):
    c = model.config
    tx = make_optimizer(c)

    def step_fn(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params, bn_state):
            loss, _, nats, new_bn = inner_loop(
                model, params, bn_state, batch, rng=sub, training=True)
            return loss, (nats, new_bn)

        (loss, (nats, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        # pre-clip global grad norm: a mesh-parity witness (a sharding bug
        # that mis-reduces gradients moves this even when the loss agrees)
        # and the observability signal the reference's clip_grad_norm
        # returned (train.py:114)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates_with_lr(state.params, updates, state.plateau.lr)
        new_plateau = plateau_update(
            state.plateau, loss, factor=c["lr_factor"], patience=c["patience"],
            threshold=c["threshold_scheduler"], min_lr=c["min_lr"])
        new_state = TrainState(
            params=new_params, bn_state=new_bn, opt_state=new_opt,
            plateau=new_plateau, step=state.step + 1, rng=rng)
        metrics = {"loss": loss, "nats": nats, "lr": state.plateau.lr,
                   "grad_norm": grad_norm}
        return new_state, metrics

    return step_fn


def make_train_step(model: FlowCompareModel, mesh=None):
    """Build the jitted train step. With a mesh, the batch is expected
    sharded over 'data' and params replicated/model-sharded (train.mesh)."""
    return jax.jit(_build_step_fn(model), donate_argnums=(0,))


def make_train_step_multi(model: FlowCompareModel):
    """K train steps in ONE compiled program (lax.scan over stacked batches).

    Through the hosted-TPU tunnel each dispatch costs ~25 ms regardless of
    work (CLAUDE.md); eval amortizes it with chunked dispatch and this is
    the training counterpart. Semantics are identical to K sequential
    step_fn calls — the plateau scheduler already steps per batch INSIDE
    the graph, and the host loop flushes chunks at checkpoint/sample
    boundaries so the reference's host-side quirks keep their exact timing.
    Batches arrive stacked on a leading step axis: (K, B, ...)."""
    step_fn = _build_step_fn(model)

    def multi_fn(state: TrainState, b0, b1, extra):
        xs = (b0, b1) if extra is None else (b0, b1, extra)

        def body(st, x):
            batch = (x[0], x[1], x[2] if len(x) == 3 else None)
            return step_fn(st, batch)

        return jax.lax.scan(body, state, xs)

    return jax.jit(multi_fn, donate_argnums=(0,))


def make_eval_step(model: FlowCompareModel):
    def eval_fn(params, bn_state, batch, rng):
        loss, log_prob, nats, _ = inner_loop(
            model, params, bn_state, batch, rng=rng, training=False)
        return loss, log_prob, nats

    return jax.jit(eval_fn)


def data_init_from_batch(model: FlowCompareModel, state: TrainState,
                         batch) -> TrainState:
    """Run the functional ActNorm data-dependent init off one batch
    (embed + per-layer stat scan as ONE jitted program)."""

    @jax.jit
    def init_fn(params, bn_state, batch, rng):
        extract_0, extract_1, extra = batch
        extract_0 = extract_0[..., : model.input_dim]
        extract_1 = extract_1[..., : model.input_dim]
        if extra is not None:
            extra = jnp.broadcast_to(
                extra[:, None, :],
                (extract_1.shape[0], extract_1.shape[1], extra.shape[-1]))
        # prefer_xla: the data-init embed is a one-shot eval call and the
        # gather formulation is bit-exact there — skipping the encoder
        # kernel keeps training startable when the remote compile helper
        # is in its kernel-killing degraded state (CLAUDE.md)
        emb, _ = model.embed(params, bn_state, extract_0, training=False,
                             prefer_xla=True)
        if model.is_global:
            emb = jnp.broadcast_to(
                emb[:, None, :], (emb.shape[0], extract_1.shape[1], emb.shape[-1]))
        return model.data_dependent_init(params, extract_1, emb, extra, rng=rng)

    new_params = init_fn(state.params, state.bn_state, batch, state.rng)
    # optimizer state must track the (re)initialized params
    tx = make_optimizer(model.config)
    return state._replace(params=new_params, opt_state=tx.init(new_params))


def _guard_axon_batch(batch_size: int, force: bool) -> None:
    """Refuse known worker-killing training shapes on the axon backend.

    B=4 training gradients crash the hosted TPU worker outright (UNAVAILABLE:
    worker restarted; 10-25 min outage, reproduced twice 2026-08-17 with BOTH
    encoder formulations), while B=20 is chip-validated. Until the envelope
    is better mapped, small batches on axon require an explicit override
    (force=True / --force-batch / FLOWCOMPARE_FORCE_BATCH=1)."""
    if force or os.environ.get("FLOWCOMPARE_FORCE_BATCH") == "1":
        return
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return
    if platform not in ("tpu", "axon"):
        return
    if batch_size < 8:
        raise ValueError(
            f"batch_size={batch_size} training on the hosted TPU backend is "
            "a known worker-killer (B=4 crashes the worker for 10-25 min; "
            "B=20 is the chip-validated shape). Use batch_size >= 8, or "
            "override with force=True / --force-batch / "
            "FLOWCOMPARE_FORCE_BATCH=1 if you accept the outage risk.")


def train(model: FlowCompareModel, dataset: Iterable, *,
          key: Optional[jax.Array] = None,
          writer: Optional[MetricWriter] = None,
          save_dir: Optional[str] = None,
          run_name: str = "run",
          mesh=None,
          max_steps: Optional[int] = None,
          resume_from: Optional[str] = None,
          steps_per_dispatch: int = 1,
          detect_anomaly: bool = False,
          save_final: bool = False,
          force_batch: bool = False) -> TrainState:
    """Fit loop over an iterable of (extract_0, extract_1, extra|None) batches.

    `dataset` is any re-iterable of numpy/jax batches (see data/loader.py);
    epochs follow config['n_epochs'] unless max_steps caps it.

    steps_per_dispatch > 1 runs K steps per device dispatch (lax.scan over
    stacked batches) to amortize the ~25 ms tunnel cost per call; chunks
    flush at checkpoint/sample boundaries so observable behaviour (save
    timing, running-average reset, sample cadence, per-step logs) is
    IDENTICAL to the K=1 loop.
    """
    c = model.config
    _guard_axon_batch(int(c["batch_size"]), force_batch)
    if detect_anomaly:
        # reference train.py:81-84 detect_anomaly toggle -> jax debug_nans
        jax.config.update("jax_debug_nans", True)
    key = key if key is not None else jax.random.PRNGKey(0)
    writer = writer or JsonlWriter(os.path.join(save_dir or ".", "metrics.jsonl"))
    save_dir = save_dir or c.get("save_model_path", "save")
    os.makedirs(save_dir, exist_ok=True)

    state = init_train_state(model, key)
    if resume_from:
        loaded = ckpt.load_checkpoint(resume_from)
        params = ckpt.restore_into(state.params, loaded["params"])
        bn_state = ckpt.restore_into(state.bn_state, loaded["state"])
        plateau = ckpt.restore_into(state.plateau, loaded["plateau"])
        # reference resume keeps flow/embedder + scheduler lr but NOT the
        # optimizer moments (train.py:72 intentionally commented out)
        state = state._replace(params=params, bn_state=bn_state,
                               plateau=plateau)
        print(f"Resumed from {resume_from}")
    else:
        first_batch = next(iter(dataset))
        state = data_init_from_batch(model, state, _to_device(first_batch, mesh))

    step_fn = make_train_step(model, mesh)

    @partial(jax.jit, static_argnames=("n_points",))
    def sample_fn(params, bn_state, extract_0, extra, key, n_points=4000):
        # prefer_xla_embed: periodic dumps are not a hot path; the gather
        # embed is bit-exact in eval and keeps sampling compilable when
        # the compile host rejects the encoder kernels (CLAUDE.md)
        return make_sample(model, params, bn_state, key, n_points,
                           extract_0, extra, prefer_xla_embed=True)

    best_so_far = math.inf
    last_save_path = None
    loss_running_avg = 0.0
    global_step = 0
    done = False
    spd = max(1, int(steps_per_dispatch))
    multi_fn = make_train_step_multi(model) if spd > 1 else None
    bps = c["batches_per_save"]
    bpsample = c["batches_per_sample"] if c.get("make_samples") else None
    # max_steps, when given, GOVERNS the run length: keep cycling epochs
    # (fresh shuffle each — the dataset's epoch counter feeds the permutation)
    # until the step budget is spent, instead of silently stopping at
    # n_epochs * batches_per_epoch like the config-driven schedule.
    epochs = (range(c["n_epochs"]) if max_steps is None
              else itertools.count())
    for epoch in epochs:
        if done:
            break
        it = iter(dataset)
        batch_ind = 0
        while not done:
            # chunk [i..e]: host-side actions (checkpoint after step j%bps==0,
            # sample after step (j+1)%bpsample==0) need post-step-j state, so
            # a boundary may only be the chunk's LAST index.
            i = batch_ind
            limit = spd
            if max_steps is not None:
                limit = min(limit, max_steps - global_step)
            j_save = bps if i == 0 else ((i + bps - 1) // bps) * bps
            limit = min(limit, j_save - i + 1)
            if bpsample:
                j_sample = -(-(i + 1) // bpsample) * bpsample - 1
                limit = min(limit, j_sample - i + 1)
            chunk = list(itertools.islice(it, max(1, limit)))
            if not chunk:
                break  # epoch exhausted
            t0 = time.perf_counter()
            if len(chunk) == 1:
                state, metrics = step_fn(state, _to_device(chunk[0], mesh))
                # ONE host transfer for the whole metrics dict — per-key
                # float() costs a ~12-30 ms tunnel round trip EACH on the
                # hosted backend (CLAUDE.md)
                m = jax.device_get(metrics)
                rows = [{k: float(v) for k, v in m.items()}]
            else:
                b0, b1, extra = _stack_batches(chunk, mesh)
                state, metrics = multi_fn(state, b0, b1, extra)
                marr = jax.device_get(metrics)
                rows = [{k: float(v[s]) for k, v in marr.items()}
                        for s in range(len(chunk))]
            dt = (time.perf_counter() - t0) / len(chunk)
            for s, row in enumerate(rows):
                if not math.isfinite(row["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss at step {global_step + s}")
                loss_running_avg = ((loss_running_avg * (i + s) + row["loss"])
                                    / (i + s + 1))
                writer.log({**row, "time_batch": dt, "epoch": epoch},
                           step=global_step + s)

            e = i + len(chunk) - 1
            batch = chunk[-1]
            if e > 0 and e % bps == 0:
                if loss_running_avg < best_so_far:
                    if last_save_path is not None:
                        os.remove(last_save_path)
                    path = os.path.join(
                        save_dir, f"{run_name}_e{epoch}_b{e}_model_dict.msgpack")
                    ckpt.save_checkpoint(
                        path, config=c, params=state.params, state=state.bn_state,
                        opt_state=state.opt_state, plateau=state.plateau,
                        step=int(state.step))
                    last_save_path = path
                    best_so_far = min(loss_running_avg, best_so_far)
                    loss_running_avg = 0.0

            if bpsample and (e + 1) % bpsample == 0:
                extract_0 = jnp.asarray(batch[0][:1])
                extra = (jnp.asarray(batch[2][:1])
                         if (batch[2] is not None and c["using_extra_context"])
                         else None)
                pts = sample_fn(state.params, state.bn_state, extract_0, extra,
                                jax.random.fold_in(state.rng, e))
                np.savez(os.path.join(
                    save_dir,
                    f"sample_{run_name}_{global_step + len(chunk) - 1}.npz"),
                    cond=np.asarray(extract_0[0]), gen=np.asarray(pts[0]))

            global_step += len(chunk)
            batch_ind = e + 1
            if max_steps is not None and global_step >= max_steps:
                done = True
    if save_final:
        # opt-in end-of-run checkpoint, IN ADDITION to the reference's
        # best-running-average saves (which never fire when epochs are
        # shorter than batches_per_save)
        ckpt.save_checkpoint(
            os.path.join(save_dir, f"{run_name}_final.msgpack"),
            config=c, params=state.params, state=state.bn_state,
            opt_state=state.opt_state, plateau=state.plateau,
            step=int(state.step))
    return state


def _to_device(batch, mesh):
    batch = tuple(jnp.asarray(x) if x is not None else None for x in batch)
    if mesh is not None:
        from .mesh import shard_batch
        batch = shard_batch(batch, mesh)
    return batch


def _stack_batches(batches, mesh):
    """Stack K host batches on a leading step axis for make_train_step_multi;
    under a mesh the per-item batch axis (axis 1) shards over 'data'."""
    b0 = np.stack([np.asarray(b[0]) for b in batches])
    b1 = np.stack([np.asarray(b[1]) for b in batches])
    extra = (np.stack([np.asarray(b[2]) for b in batches])
             if batches[0][2] is not None else None)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        return tuple(jax.device_put(x, sh) if x is not None else None
                     for x in (b0, b1, extra))
    return tuple(jnp.asarray(x) if x is not None else None
                 for x in (b0, b1, extra))
