"""Device mesh + sharding rules.

The reference's only multi-device mechanism is single-process
`nn.DataParallel` (off in all configs, model_initialization.py:186-188).
The TPU-native replacement is SPMD over a 2D ('data', 'model') mesh:

* batch axis sharded over 'data' (pure DP — gradients all-reduce over ICI
  automatically through XLA),
* the wide (512-sized) weight matrices of the coupling MLPs / encoders
  sharded over 'model' (tensor parallelism; XLA inserts the all-gathers /
  reduce-scatters),
* everything else replicated.

`shard_params` applies the rule tree-wide; pass n_model=1 for pure DP.
Scaling the context/point axis (sequence parallelism) keeps the same mesh:
attention and kNN are written as f(q_block, kv_block) so the point axis can
be sharded over 'model' with a lax.all_gather of K/V — see
core/attention.py notes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def param_sharding_rule(mesh: Mesh, shard_dim_multiple: int = 128):
    """Shard the last axis of big 2D+ weights over 'model'; replicate the rest."""
    n_model = mesh.shape["model"]

    def rule(leaf: jnp.ndarray) -> NamedSharding:
        if (n_model > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] % (n_model * shard_dim_multiple) == 0):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_params(params, mesh: Mesh):
    rule = param_sharding_rule(mesh)
    return jax.tree_util.tree_map(lambda p: jax.device_put(p, rule(p)), params)


def shard_batch(batch, mesh: Mesh):
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, bs) if x is not None else None, batch)


def params_shardings(params, mesh: Mesh):
    rule = param_sharding_rule(mesh)
    return jax.tree_util.tree_map(rule, params)
