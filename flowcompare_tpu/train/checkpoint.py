"""Checkpoint I/O.

Reference contract (model_initialization.py:10-28 + train.py:134-145): one
file holding {config, optimizer, flow/embedder weights, scheduler}; configs
live IN checkpoints and eval restores them from there (test_flow.py:283-286).

Here a checkpoint is a single msgpack file: {"config": json-able dict,
"params", "state", "opt_state", "plateau", "step"}. Pure pytrees of
ndarrays — no pickle, host-portable.
"""

from __future__ import annotations

import json
import os
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path: str, *, config: dict, params, state=None,
                    opt_state=None, plateau=None, step: int = 0) -> None:
    def pack(tree):
        # to_state_dict turns tuples / NamedTuples (optax states, PlateauState)
        # into msgpack-able nested dicts
        return serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, tree))

    payload = {
        "config_json": np.frombuffer(json.dumps(config).encode(), dtype=np.uint8),
        "params": pack(params),
        "state": pack(state or {}),
        "opt_state": pack(opt_state) if opt_state is not None else {},
        "plateau": pack(plateau) if plateau is not None else {},
        "step": np.asarray(step),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["config"] = json.loads(bytes(payload.pop("config_json")).decode())
    return payload


def restore_into(template, loaded):
    """Restore `loaded` (state dict from a checkpoint) into the structure of
    `template`, re-attaching tuple/NamedTuple treedefs."""
    restored = serialization.from_state_dict(template, loaded)
    return jax.tree_util.tree_map(jnp.asarray, restored)
