"""CLI end-to-end on the synthetic dataset with a tiny config."""

import json
import os

import yaml

from flowcompare_tpu.cli import load_config, main

from test_model import tiny_config


def _write_tiny_yaml(path):
    cfg = tiny_config()
    cfg.update(dict(n_epochs=5, batch_size=4, batches_per_save=100,
                    make_samples=False))
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def test_load_config_preset_and_yaml(tmp_path):
    cfg = load_config("dulcet-universe")
    assert cfg["n_flow_layers"] == 115
    # wandb-format yaml
    p = tmp_path / "w.yaml"
    yaml.safe_dump({"latent_dim": {"desc": "x", "value": 32},
                    "input_embedder": {"value": "idenity"}}, open(p, "w"))
    cfg = load_config(str(p))
    assert cfg["latent_dim"] == 32
    # plain yaml
    p2 = tmp_path / "p.yaml"
    yaml.safe_dump({"latent_dim": 16}, open(p2, "w"))
    assert load_config(str(p2))["latent_dim"] == 16


def test_cli_train_evaluate_sample_roundtrip(tmp_path):
    cfg_path = _write_tiny_yaml(tmp_path / "tiny.yaml")
    save_dir = str(tmp_path / "run")
    main(["train", "--config", cfg_path, "--save-dir", save_dir,
          "--run-name", "t", "--steps", "3", "--n-items", "8"])
    assert os.path.exists(os.path.join(save_dir, "metrics.jsonl"))
    lines = [json.loads(l) for l in open(os.path.join(save_dir, "metrics.jsonl"))]
    assert len(lines) == 3

    # save a checkpoint manually via the train API for evaluate/sample
    import jax
    from flowcompare_tpu.model import FlowCompareModel
    from flowcompare_tpu.train import save_checkpoint
    from flowcompare_tpu.train.trainer import init_train_state
    cfg = load_config(cfg_path)
    model = FlowCompareModel(cfg)
    st = init_train_state(model, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, config=cfg, params=st.params, state=st.bn_state)

    main(["evaluate", "--checkpoint", ckpt, "--n-items", "4"])
    out = str(tmp_path / "cloud")
    main(["sample", "--checkpoint", ckpt, "--n-points", "128",
          "--out", out, "--n-items", "4"])
    assert os.path.exists(out + ".npz")


def test_cli_train_batch_size_override(tmp_path):
    # --batch-size overrides the config: 8 items / batch 4 -> 2 steps/epoch,
    # so 2 steps stay inside epoch 0 (tiny config default batch is 2).
    cfg_path = _write_tiny_yaml(tmp_path / "tiny.yaml")
    save_dir = str(tmp_path / "run_bs")
    main(["train", "--config", cfg_path, "--save-dir", save_dir,
          "--run-name", "t", "--steps", "2", "--n-items", "8",
          "--batch-size", "4"])
    lines = [json.loads(l)
             for l in open(os.path.join(save_dir, "metrics.jsonl"))]
    assert len(lines) == 2
    assert lines[-1]["epoch"] == 0


def test_cli_pack_then_train_on_packed(tmp_path):
    """`flowcompare pack` -> `flowcompare train --data packed`: the native
    mmap gather loader is the actual training input path (VERDICT item 7;
    replaces the reference's DataLoader workers, train.py:41-42)."""
    cfg_path = _write_tiny_yaml(tmp_path / "tiny.yaml")
    pack = str(tmp_path / "train.fcpack")
    main(["pack", "--config", cfg_path, "--out", pack,
          "--data", "synthetic", "--n-items", "12"])
    assert os.path.exists(pack)

    from flowcompare_tpu.data import PackedVoxelDataset
    ds = PackedVoxelDataset(pack, batch_size=4)
    assert ds.n_items == 12

    save_dir = str(tmp_path / "run_packed")
    main(["train", "--config", cfg_path, "--save-dir", save_dir,
          "--run-name", "tp", "--steps", "3",
          "--data", "packed", "--packed-file", pack])
    lines = [json.loads(l) for l in
             open(os.path.join(save_dir, "metrics.jsonl"))]
    assert len(lines) == 3
    assert all("loss" in l for l in lines)
