"""Training subsystem tests: jitted step, plateau scheduler, checkpointing,
multi-chip sharding on the fake 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from flowcompare_tpu.data import SyntheticVoxelDataset
from flowcompare_tpu.model import FlowCompareModel
from flowcompare_tpu.train import (
    load_checkpoint,
    make_mesh,
    make_train_step,
    plateau_init,
    plateau_update,
    restore_into,
    save_checkpoint,
    shard_batch,
    shard_params,
    train,
)
from flowcompare_tpu.train.trainer import init_train_state

from test_model import tiny_config


def _dataset(cfg, **kw):
    return SyntheticVoxelDataset(
        n_items=8, batch_size=4, sample_size=cfg["sample_size"],
        n_samples_context=cfg["n_samples_context"],
        with_extra=cfg["using_extra_context"], **kw)


def test_plateau_scheduler_reduces_after_patience():
    st = plateau_init(1e-3)
    kw = dict(factor=0.5, patience=2, threshold=0.01, min_lr=1e-8)
    st = plateau_update(st, jnp.asarray(1.0), **kw)   # best=1.0
    for _ in range(3):                                 # 3 bad steps > patience 2
        st = plateau_update(st, jnp.asarray(1.0), **kw)
    np.testing.assert_allclose(float(st.lr), 5e-4, rtol=1e-6)
    st = plateau_update(st, jnp.asarray(0.5), **kw)    # improvement resets
    assert float(st.num_bad) == 0 and float(st.best) == 0.5


def test_train_loop_decreases_loss(tmp_path):
    cfg = tiny_config()
    cfg["n_epochs"] = 20
    cfg["batches_per_save"] = 1000
    cfg["make_samples"] = False
    cfg["lr"] = 1e-3
    model = FlowCompareModel(cfg)
    ds = _dataset(cfg)
    state = train(model, ds, key=jax.random.PRNGKey(0),
                  save_dir=str(tmp_path), max_steps=30)
    import json
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 30
    losses = [l["loss"] for l in lines]
    assert all(np.isfinite(losses))
    # even window: the 2-batch dataset alternates easy/hard batches, so the
    # window must cover whole dataset passes to compare like for like
    assert np.mean(losses[-6:]) < np.mean(losses[:6])


def test_max_steps_outlives_n_epochs(tmp_path):
    # max_steps governs the run length: with n_epochs=1 (2 batches) and
    # max_steps=7, the loop must keep cycling fresh epochs until the step
    # budget is spent instead of stopping at n_epochs * batches_per_epoch.
    cfg = tiny_config()
    cfg["n_epochs"] = 1
    cfg["batches_per_save"] = 1000
    cfg["make_samples"] = False
    model = FlowCompareModel(cfg)
    train(model, _dataset(cfg), key=jax.random.PRNGKey(0),
          save_dir=str(tmp_path), max_steps=7)
    import json
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 7
    assert lines[-1]["epoch"] == 3  # 2 batches/epoch -> step 6 is epoch 3


def test_steps_per_dispatch_equivalence(tmp_path):
    # K steps per dispatch must be observably IDENTICAL to the K=1 loop:
    # same per-step losses, same checkpoint files at the same boundaries,
    # same sample cadence. batches_per_save=3 / batches_per_sample=5 force
    # chunk flushes that don't divide steps_per_dispatch=4.
    import json
    cfg = tiny_config()
    cfg["n_epochs"] = 3
    cfg["batches_per_save"] = 3
    cfg["batches_per_sample"] = 5
    cfg["make_samples"] = True
    runs = {}
    for spd in (1, 4):
        d = tmp_path / f"spd{spd}"
        model = FlowCompareModel(cfg)
        train(model, _dataset(cfg), key=jax.random.PRNGKey(0),
              save_dir=str(d), max_steps=11, steps_per_dispatch=spd)
        lines = [json.loads(l) for l in open(d / "metrics.jsonl")]
        files = sorted(p.name for p in d.iterdir()
                       if p.suffix in (".msgpack", ".npz"))
        runs[spd] = (lines, files)
    (l1, f1), (l4, f4) = runs[1], runs[4]
    assert len(l1) == len(l4) == 11
    assert f1 == f4                       # same ckpt/sample names+boundaries
    for a, b in zip(l1, l4):
        assert a["epoch"] == b["epoch"]
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(a["lr"], b["lr"], rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    state = init_train_state(model, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, config=cfg, params=state.params, state=state.bn_state,
                    opt_state=state.opt_state, plateau=state.plateau, step=7)
    loaded = load_checkpoint(path)
    assert loaded["config"]["n_flow_layers"] == cfg["n_flow_layers"]
    assert int(loaded["step"]) == 7
    params2 = restore_into(state.params, loaded["params"])
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_on_8_device_mesh_matches_single_device():
    """Full jitted train step, batch sharded over data axis, weights over
    model axis — the multi-chip path on the fake CPU mesh. Not just
    liveness: loss, the pre-clip global grad norm, and the UPDATED PARAMS
    must reproduce the unsharded single-device step (the gradient
    equivalence nn.DataParallel guaranteed in the reference,
    model_initialization.py:186-188); a sharding bug that silently
    mis-reduces gradients fails here."""
    assert jax.device_count() == 8
    cfg = tiny_config()
    model = FlowCompareModel(cfg)
    ds = _dataset(cfg)
    raw = tuple(jnp.asarray(x) if x is not None else None
                for x in next(iter(ds)))

    # single-device reference step (init is deterministic in the key)
    state_1 = init_train_state(model, jax.random.PRNGKey(0))
    step_1 = make_train_step(model)
    state_1, metrics_1 = step_1(state_1, raw)

    mesh = make_mesh(n_data=4, n_model=2)
    state_8 = init_train_state(model, jax.random.PRNGKey(0))
    state_8 = state_8._replace(params=shard_params(state_8.params, mesh))
    step_8 = make_train_step(model, mesh)
    state_8, metrics_8 = step_8(state_8, shard_batch(raw, mesh))

    np.testing.assert_allclose(float(metrics_8["loss"]),
                               float(metrics_1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics_8["grad_norm"]),
                               float(metrics_1["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)

    # second step re-uses the compiled fn and advances
    state_8, metrics2 = step_8(state_8, shard_batch(raw, mesh))
    assert np.isfinite(float(metrics2["loss"]))
    assert float(metrics2["loss"]) != float(metrics_8["loss"])


def test_resume_from_checkpoint(tmp_path):
    cfg = tiny_config()
    cfg["make_samples"] = False
    model = FlowCompareModel(cfg)
    ds = _dataset(cfg)
    state = train(model, ds, key=jax.random.PRNGKey(0),
                  save_dir=str(tmp_path), max_steps=2)
    path = str(tmp_path / "resume.msgpack")
    save_checkpoint(path, config=cfg, params=state.params, state=state.bn_state,
                    plateau=state.plateau, step=int(state.step))
    state2 = train(model, ds, key=jax.random.PRNGKey(1),
                   save_dir=str(tmp_path), max_steps=1, resume_from=path)
    assert np.isfinite(float(state2.plateau.best))


def test_distributed_helpers_single_host():
    from flowcompare_tpu.train import (
        distributed_initialize, local_batch_slice, make_global_batch)
    # no coordinator configured -> no-op
    assert distributed_initialize() is False
    start, size = local_batch_slice(8)
    assert (start, size) == (0, 8)
    mesh = make_mesh(n_data=8, n_model=1)
    batch = (np.ones((8, 4, 6), np.float32), np.ones((8, 3, 6), np.float32),
             None)
    gb = make_global_batch(batch, mesh)
    assert gb[0].shape == (8, 4, 6) and gb[2] is None
    # globally sharded over the data axis
    assert len(gb[0].sharding.device_set) == 8


def test_save_final_checkpoint(tmp_path):
    cfg = tiny_config()
    cfg["make_samples"] = False
    model = FlowCompareModel(cfg)
    train(model, _dataset(cfg), key=jax.random.PRNGKey(0),
          save_dir=str(tmp_path), run_name="r", max_steps=2,
          save_final=True)
    path = tmp_path / "r_final.msgpack"
    assert path.exists()
    loaded = load_checkpoint(str(path))
    assert int(loaded["step"]) == 2


def test_axon_batch_guard(monkeypatch):
    """B=4 training on the hosted TPU crashes the worker (CLAUDE.md) —
    trainer must refuse it there unless forced, and ignore it on CPU."""
    import pytest
    from flowcompare_tpu.train.trainer import _guard_axon_batch

    class _FakeDev:
        platform = "axon"

    # CPU (real backend here): any batch passes
    _guard_axon_batch(4, force=False)
    # axon backend: small batches refused...
    monkeypatch.setattr(jax, "devices", lambda *a: [_FakeDev()])
    with pytest.raises(ValueError, match="worker-killer"):
        _guard_axon_batch(4, force=False)
    # ...unless forced, via arg or env
    _guard_axon_batch(4, force=True)
    monkeypatch.setenv("FLOWCOMPARE_FORCE_BATCH", "1")
    _guard_axon_batch(4, force=False)
    monkeypatch.delenv("FLOWCOMPARE_FORCE_BATCH")
    # proven shapes pass
    _guard_axon_batch(20, force=False)
