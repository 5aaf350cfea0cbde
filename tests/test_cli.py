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
