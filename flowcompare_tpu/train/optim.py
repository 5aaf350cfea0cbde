"""Optimizers and the ReduceLROnPlateau schedule, fully on-device.

The reference steps `torch.optim.lr_scheduler.ReduceLROnPlateau` once per
*batch* with the current loss (train.py:61,118) — patience there is counted
in batches. Here the scheduler is a small pure-state machine folded into the
jitted train step (mode='min', threshold_mode='rel', cooldown=0 — torch's
defaults, matching the reference's usage).

Optimizer parity (train.py:44-58): Adam / Adamax / AdamW / SGD. The learning
rate is dynamic (scheduler-driven), so the optax transform chain excludes the
lr scale and the update is scaled by -lr inside the step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class PlateauState(NamedTuple):
    lr: jnp.ndarray        # current learning rate (f32 scalar)
    best: jnp.ndarray      # best loss seen
    num_bad: jnp.ndarray   # consecutive non-improving steps


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
    )


def plateau_update(state: PlateauState, loss: jnp.ndarray, *, factor: float,
                   patience: int, threshold: float, min_lr: float) -> PlateauState:
    """torch ReduceLROnPlateau semantics (mode=min, threshold_mode=rel)."""
    loss = loss.astype(jnp.float32)
    # rel threshold: improvement if loss < best * (1 - threshold)
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce_now = num_bad > patience
    lr = jnp.where(reduce_now, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)


def make_optimizer(config: dict) -> optax.GradientTransformation:
    """Gradient transform WITHOUT the lr scale (applied dynamically)."""
    kind = config["optimizer_type"]
    wd = config.get("weight_decay", 0.0)
    parts = [optax.clip_by_global_norm(config["grad_clip_val"])]
    if kind == "Adam":
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch Adam: L2 via grad
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif kind == "Adamax":
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adamax(b1=0.9, b2=0.999, eps=1e-8))
    elif kind == "AdamW":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    elif kind == "SGD":
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    else:
        raise ValueError(f"Invalid optimizer type {kind}")
    return optax.chain(*parts)


def apply_updates_with_lr(params, updates, lr):
    scaled = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, scaled)
