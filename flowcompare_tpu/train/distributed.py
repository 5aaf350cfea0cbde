"""Multi-host (DCN) initialization and sharded-data helpers.

The reference is strictly single-process (SURVEY §2.6); this framework's
multi-chip story is SPMD over a mesh (train/mesh.py). This module adds the
multi-HOST layer: `initialize()` wires jax.distributed from env/args so the
same train step spans pods (gradients all-reduce over ICI within a slice
and DCN across slices, inserted by XLA — no hand-written backend), and
`local_batch_slice` carves the per-host shard of a global batch for
`jax.make_array_from_process_local_data`.

Single-host calls are no-ops, so the training entry points can call
`initialize()` unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Returns
    True when a multi-process runtime was initialized."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False  # single host — nothing to do
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def local_batch_slice(global_batch_size: int):
    """(start, size) of this host's shard of a data-parallel global batch."""
    n = jax.process_count()
    idx = jax.process_index()
    per_host = global_batch_size // n
    if per_host * n != global_batch_size:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts")
    return idx * per_host, per_host


def make_global_batch(batch, mesh):
    """Assemble a globally-sharded batch from per-host numpy shards.

    batch: this host's (extract_0, extract_1, extra|None) arrays, already
    sliced to the local shard. Uses make_array_from_process_local_data with
    the mesh's batch sharding, so each host only materialises its shard.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))

    def assemble(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return tuple(assemble(x) for x in batch)
