"""Command-line interface.

The reference has no CLI — its entry points are `if __name__ == "__main__"`
blocks with hard-coded paths (train.py:180-182, test_flow.py:280-297). This
module provides the equivalents as proper subcommands:

  flowcompare train     — train a model (synthetic or AMS data)
  flowcompare evaluate  — test-set nats + change fractions
  flowcompare sample    — generate a conditioned cloud from a checkpoint
  flowcompare convert   — PyTorch .pt checkpoint -> native checkpoint
  flowcompare bench     — the headline throughput benchmark
  flowcompare view      — Dash change-map browser (requires dash)

Configs are preset names (configs/presets.py) or YAML files in either plain
`key: value` or the reference's wandb `{key: {desc, value}}` format
(utils.py:373-377 counterpart).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_config(spec: str) -> dict:
    from .configs import PRESETS, get_config
    if spec in PRESETS:
        return get_config(spec)
    import yaml
    with open(spec) as f:
        raw = yaml.safe_load(f)
    if raw and all(isinstance(v, dict) and "value" in v for v in raw.values()):
        raw = {k: v["value"] for k, v in raw.items()}  # wandb-format yaml
    from .configs.presets import from_checkpoint_config
    return from_checkpoint_config(raw)


def _dataset(args, config, mode: str, include_all: bool = False):
    if args.data == "packed":
        if include_all:
            raise SystemExit("--data packed holds train items; evaluation "
                             "needs the 11-tensor eval items (use ams/synthetic)")
        from .data import PackedVoxelDataset
        return PackedVoxelDataset(
            args.packed_file, config["batch_size"],
            shuffle=(mode == "train"),
            with_extra=config["using_extra_context"])
    if args.data == "synthetic":
        from .data import SyntheticVoxelDataset
        return SyntheticVoxelDataset(
            n_items=args.n_items, batch_size=config["batch_size"],
            sample_size=config["sample_size"],
            n_samples_context=config["n_samples_context"],
            with_extra=config["using_extra_context"], mode=mode,
            include_all=include_all)
    from .data import AmsVoxelLoader, batch_iterator
    loader = AmsVoxelLoader(
        config["directory_path_train"], config["directory_path_test"],
        out_path=args.processed_dir, preload=config.get("preload", True),
        n_samples=config["sample_size"],
        final_voxel_size=config["final_voxel_size"],
        n_samples_context=config["n_samples_context"],
        context_voxel_size=config["context_voxel_size"], mode=mode,
        include_all=include_all,
        self_pairs_train=config.get("self_pairs_train", False))

    class _Batches:
        _epoch = 0

        def __init__(self):
            self.loader = loader

        def __iter__(self):
            epoch, self._epoch = self._epoch, self._epoch + 1
            return batch_iterator(self.loader, config["batch_size"],
                                  shuffle=(mode == "train"), epoch=epoch)

        def __len__(self):
            return len(loader) // config["batch_size"]

    return _Batches() if not include_all else loader


def _load_model(checkpoint: str):
    import jax
    from .model import FlowCompareModel
    from .train import load_checkpoint, restore_into
    loaded = load_checkpoint(checkpoint)
    config = loaded["config"]
    model = FlowCompareModel(config)
    template_params, template_state = model.init_params(jax.random.PRNGKey(0))
    params = restore_into(template_params, loaded["params"])
    state = restore_into(template_state, loaded["state"]) if loaded["state"] \
        else template_state
    return model, params, state, config


def cmd_train(args):
    import jax
    from .data import PrefetchedDataset
    from .model import FlowCompareModel
    from .train import JsonlWriter, StdoutWriter, MultiWriter, train
    config = load_config(args.config)
    if args.bf16:
        config["compute_dtype"] = "bfloat16"
    if getattr(args, "batch_size", None):
        config["batch_size"] = args.batch_size
    model = FlowCompareModel(config,
                             fused_layers=getattr(args, "fused", False))
    ds = PrefetchedDataset(_dataset(args, config, "train"))
    writer = MultiWriter(JsonlWriter(f"{args.save_dir}/metrics.jsonl"),
                         StdoutWriter())
    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from .train import make_mesh
        mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    train(model, ds, key=jax.random.PRNGKey(args.seed), writer=writer,
          save_dir=args.save_dir, run_name=args.run_name, mesh=mesh,
          max_steps=args.steps,
          steps_per_dispatch=getattr(args, "steps_per_dispatch", 1),
          resume_from=args.resume or None,
          save_final=getattr(args, "save_final", False),
          force_batch=getattr(args, "force_batch", False))


def cmd_evaluate(args):
    import jax
    from .eval import evaluate_on_test
    model, params, state, config = _load_model(args.checkpoint)
    if args.fast:
        # bf16 + fused kernels: ~2.5x faster eval; nats drift ~0.002 vs the
        # f32 parity path (budget +-0.01)
        model = model.with_options(compute_dtype="bfloat16",
                                   remat=False, fused_layers=True)

    class _EvalBatches:
        def __init__(self, ds, bs):
            self.ds, self.bs = ds, bs

        def __iter__(self):
            import numpy as np
            n = len(self.ds) - len(self.ds) % self.bs
            for s in range(0, n, self.bs):
                items = [self.ds.get_item_all(i) for i in range(s, s + self.bs)]
                yield tuple(np.stack([it[j] for it in items])
                            for j in range(len(items[0])))

    ds = _dataset(args, config, "test", include_all=True)
    batches = ds if args.data == "synthetic" else _EvalBatches(
        ds, config["batch_size"])
    mesh = None
    if getattr(args, "data_parallel", False) and jax.device_count() > 1:
        from .train import make_mesh
        mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    nats, change_means = evaluate_on_test(
        model, params, state, batches, multiple=args.multiple,
        generate_samples=args.generate_samples, mesh=mesh)
    print(json.dumps({"nats": nats,
                      "mean_changed_fraction": float(sum(change_means) /
                                                     max(len(change_means), 1)),
                      "n_voxels": len(change_means)}))


def cmd_sample(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .model import make_sample
    from .viz import save_cloud
    model, params, state, config = _load_model(args.checkpoint)
    ds = _dataset(args, config, "test", include_all=True)
    item = ds.get_item_all(args.index)
    extract_0 = jnp.asarray(item[0])[None]
    extra = (jnp.asarray(item[2])[None]
             if config["using_extra_context"] else None)
    pts = make_sample(model, params, state, jax.random.PRNGKey(args.seed),
                      args.n_points, extract_0, extra,
                      sample_std=args.gen_std)
    out = save_cloud(args.out, np.asarray(pts[0])[:, :3],
                     np.clip(np.asarray(pts[0])[:, 3:6], 0, 1))
    print(f"wrote {out}")


def cmd_convert(args):
    from .compat import load_torch_checkpoint
    from .train import save_checkpoint
    config, params, state = load_torch_checkpoint(args.torch_checkpoint)
    save_checkpoint(args.out, config=config, params=params, state=state)
    print(f"converted {args.torch_checkpoint} -> {args.out}")


def cmd_pack(args):
    """Freeze a live item source into a mmap'd pack file (offline tool).

    Replaces the reference's per-epoch DataLoader-worker re-preprocessing
    (train.py:41-42): preprocess once, train from the native mmap gather."""
    from .data import pack_dataset
    config = load_config(args.config)
    ds = _dataset(args, config, args.mode)
    if args.data == "synthetic":
        # _dataset returns the dataset itself (an item source) for synthetic
        src = ds
    else:
        # AMS path: _Batches wraps the loader; reach the underlying item source
        from .data import AmsVoxelLoader
        src = ds if isinstance(ds, AmsVoxelLoader) else ds.loader
    info = pack_dataset(src, args.out,
                        indices=range(args.limit) if args.limit else None)
    print(json.dumps({"out": args.out, **{k: info[k] for k in
                                          ("n_items", "record_floats")}}))


def cmd_bench(args):
    import runpy
    import os
    if args.preset:
        os.environ["FLOWCOMPARE_BENCH_PRESET"] = args.preset
    if args.batch_size:
        os.environ["FLOWCOMPARE_BENCH_BATCH"] = str(args.batch_size)
    if args.encoder and args.chunk is None:
        raise SystemExit("flowcompare bench: --encoder only applies to "
                         "manual runs; pass --chunk as well (the ladder "
                         "picks encoder paths itself)")
    if args.chunk is not None:
        # pins a single manual configuration (no degradation ladder)
        os.environ["FLOWCOMPARE_BENCH_CHUNK"] = str(args.chunk)
    if args.encoder:
        os.environ["FLOWCOMPARE_BENCH_ENCODER"] = args.encoder
    if args.budget is not None:
        os.environ["FLOWCOMPARE_BENCH_BUDGET"] = str(args.budget)
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"), run_name="__main__")


def cmd_view(args):
    from .viz import DatasetViewer, visualize_change
    model, params, state, config = _load_model(args.checkpoint)
    ds = _dataset(args, config, "test", include_all=True)
    viewer = DatasetViewer(model, params, state, ds)
    visualize_change(viewer, range(len(ds)), port=args.port)


def main(argv=None):
    p = argparse.ArgumentParser(prog="flowcompare")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_data_args(sp, packed_ok: bool = False):
        choices = ["synthetic", "ams"] + (["packed"] if packed_ok else [])
        sp.add_argument("--data", choices=choices, default="synthetic")
        sp.add_argument("--n-items", type=int, default=64)
        sp.add_argument("--processed-dir", default="save/processed_dataset")
        if packed_ok:
            sp.add_argument("--packed-file", default="save/train.fcpack",
                            help="pack file written by `flowcompare pack`")

    t = sub.add_parser("train", help="train a model")
    t.add_argument("--config", default="dulcet-universe")
    t.add_argument("--save-dir", default="save/conditional_flow_compare")
    t.add_argument("--run-name", default="run")
    t.add_argument("--steps", type=int, default=None)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--bf16", action="store_true")
    t.add_argument("--batch-size", type=int, default=None,
                   help="override the config's batch_size")
    t.add_argument("--force-batch", action="store_true",
                   help="bypass the hosted-TPU batch-size guard (B=4 "
                        "training is a known worker-killer; see "
                        "train.trainer._guard_axon_batch)")
    t.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="run K train steps per device dispatch (amortizes "
                        "per-call overhead on remote backends; K=8 measured "
                        "-13%% step time on the hosted TPU, "
                        "save/bench/bench_train.json kernel_spd8; observable "
                        "behavior is identical to K=1 per "
                        "tests/test_train.py)")
    t.add_argument("--resume", default=None)
    t.add_argument("--fused", action="store_true",
                   help="train through the fwd+bwd Pallas megakernels "
                        "(TPU+bf16 only; grads match bf16 autodiff to "
                        "~0.5%%, save/bench/vjp_parity.json)")
    t.add_argument("--save-final", action="store_true",
                   help="also save a checkpoint at the end of the run "
                        "(<save-dir>/<run-name>_final.msgpack), in "
                        "addition to the reference's best-running-average "
                        "saves")
    t.add_argument("--data-parallel", action="store_true")
    add_data_args(t, packed_ok=True)
    t.set_defaults(fn=cmd_train)

    pk = sub.add_parser("pack", help="freeze a dataset into a mmap pack file")
    pk.add_argument("--config", default="dulcet-universe")
    pk.add_argument("--out", default="save/train.fcpack")
    pk.add_argument("--mode", choices=["train", "test"], default="train")
    pk.add_argument("--limit", type=int, default=None,
                    help="pack only the first N items")
    add_data_args(pk)
    pk.set_defaults(fn=cmd_pack)

    e = sub.add_parser("evaluate", help="test-set nats + change fractions")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--multiple", type=float, default=5.4)
    e.add_argument("--fast", action="store_true",
                   help="bf16 + fused kernels (nats drift ~0.002)")
    e.add_argument("--generate-samples", action="store_true")
    e.add_argument("--data-parallel", action="store_true",
                   help="shard eval batches over all devices (SPMD)")
    add_data_args(e)
    e.set_defaults(fn=cmd_evaluate)

    s = sub.add_parser("sample", help="generate a conditioned cloud")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--index", type=int, default=0)
    s.add_argument("--n-points", type=int, default=4000)
    s.add_argument("--gen-std", type=float, default=0.6)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--out", default="sample")
    add_data_args(s)
    s.set_defaults(fn=cmd_sample)

    c = sub.add_parser("convert", help="torch .pt -> native checkpoint")
    c.add_argument("--torch-checkpoint", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_convert)

    b = sub.add_parser("bench", help="headline throughput benchmark")
    b.add_argument("--preset", default=None,
                   help="config preset to benchmark (default dulcet-universe)")
    b.add_argument("--batch-size", type=int, default=None)
    b.add_argument("--chunk", type=int, default=None,
                   help="batches per compiled dispatch; pins one manual "
                        "configuration (skips the degradation ladder)")
    b.add_argument("--encoder", choices=["onelaunch", "stages", "xla"],
                   default=None,
                   help="encoder path for manual runs (default onelaunch)")
    b.add_argument("--budget", type=float, default=None,
                   help="global wall-clock budget in seconds for the "
                        "ladder (default 1200)")
    b.set_defaults(fn=cmd_bench)

    v = sub.add_parser("view", help="Dash change-map browser")
    v.add_argument("--checkpoint", required=True)
    v.add_argument("--port", type=int, default=8050)
    add_data_args(v)
    v.set_defaults(fn=cmd_view)

    args = p.parse_args(argv)
    # persistent compile cache: full-scale compiles cost 100-300 s through
    # the hosted backend's remote helper; cached executables load in ~1 s
    # and survive compile-helper degradation (save/bench/probe_compile_cache.json)
    from .compile_cache import enable_compile_cache
    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
