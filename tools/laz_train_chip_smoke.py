"""End-to-end reference-user workflow on the REAL chip, starting from a
LAZ-compressed corpus: native .laz decode (data/laz.py, the laspy-free
codec) -> AmsVoxelLoader offline pipeline (registration, ground cutoff,
grid voxel pairing) -> full-scale dulcet-universe TRAINING on the TPU.

This is the chip-level counterpart of tests/test_las_e2e.py's CPU slice
and the round-5 proof that the whole reference data path (reference
utils.py:20-45 laspy ingest -> dataloaders/ams_voxel_loader.py ->
train.py) runs end-to-end on this framework with zero third-party
ingest dependencies. The train program is the production path (fwd+bwd
flow megakernels + scatter-free edgeconv train kernel), which compiles
even on a degraded remote compile host (CLAUDE.md 2026-08-20).

B=20 (the proven worker-safe training shape), ~30 steps; asserts finite
losses and writes save/bench/laz_train_chip_smoke.json.

Usage: python tools/laz_train_chip_smoke.py [--steps 30]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowcompare_tpu.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _dense_scene(rng, removed, cx, cy):
    """~40k-point scene: jittered stacks of the synthetic scene so 2x2 m
    voxel columns comfortably exceed the 1024/1250 sample counts."""
    from flowcompare_tpu.data.synthetic import _scene_cloud
    base = _scene_cloud(rng, removed=removed).astype(np.float64)
    copies = []
    for _ in range(6):
        c = base.copy()
        c[:, :3] += rng.normal(0, 0.03, (len(c), 3))
        copies.append(c)
    cloud = np.concatenate(copies)
    cloud[:, 0] += cx
    cloud[:, 1] += cy
    return cloud


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="save/bench/laz_train_chip_smoke.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.data import AmsVoxelLoader, batch_iterator
    from flowcompare_tpu.data.laz import write_laz
    from flowcompare_tpu.train import train

    salt = int(time.time()) % (2 ** 31)
    rng = np.random.default_rng(salt)
    root = tempfile.mkdtemp(prefix="laz_chip_")
    try:
        props = []
        locations = [(0.0, 0.0), (20.0, 0.0), (0.0, 20.0), (20.0, 20.0),
                     (40.0, 0.0), (40.0, 20.0)]
        i = 0
        for lx, ly in locations:
            for year, dx, dy in ((2019, 0.0, 0.0), (2020, 1.0, 0.5)):
                scan_id = f"scan{i}"
                i += 1
                cloud = _dense_scene(rng, removed=(year == 2020),
                                     cx=lx, cy=ly)
                write_laz(os.path.join(root, f"{scan_id}.laz"), cloud)
                props.append({
                    "ImageId": scan_id, "X": lx + dx, "Y": ly + dy,
                    "Height": 2.5, "GroundLevelOffset": 2.5,
                    "RecordingTimeGps": f"{year}-06-01T12:00:00",
                })
        with open(os.path.join(root, "response.json"), "w") as f:
            json.dump({"RecordingProperties": props}, f)
        t0 = time.time()
        loader = AmsVoxelLoader(
            root, root, os.path.join(root, "processed"),
            clearance=6, n_samples=1024, n_samples_context=1250,
            final_voxel_size=(2.0, 2.0, 4.0),
            context_voxel_size=(2.2, 2.2, 4.2),
            mode="train", self_pairs_train=True, cloud_ext=".laz",
            min_cloud_points=500)
        n_items = len(loader)
        pipeline_s = round(time.time() - t0, 1)
        print(f"loader: {n_items} voxel pairs from .laz in {pipeline_s}s",
              flush=True)
        assert n_items >= 20, f"scene too sparse: {n_items} pairs"

        cfg = fc.get_config("dulcet-universe")
        cfg["n_epochs"] = 1000  # capped by max_steps
        model = fc.FlowCompareModel(cfg)

        class Repeat:
            """Re-iterable over shuffled loader batches."""
            def __iter__(self):
                return batch_iterator(loader, cfg["batch_size"],
                                      shuffle=True, seed=salt % 9973)

        run_dir = os.path.join(root, "run")
        t0 = time.time()
        train(model, Repeat(), key=jax.random.PRNGKey(salt % 4099),
              save_dir=run_dir, max_steps=args.steps)
        train_s = round(time.time() - t0, 1)
        lines = [json.loads(l)
                 for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        losses = [l["loss"] for l in lines]
        assert len(losses) == args.steps, len(losses)
        assert all(np.isfinite(losses)), "non-finite loss"
        out = {
            "what": ("native .laz ingest -> AmsVoxelLoader offline "
                     "pipeline -> full-scale dulcet-universe chip "
                     "training (production kernels)"),
            "voxel_pairs": n_items,
            "pipeline_s": pipeline_s,
            "steps": args.steps,
            "train_wall_s": train_s,
            "loss_first": round(float(np.mean(losses[:5])), 3),
            "loss_last": round(float(np.mean(losses[-5:])), 3),
            "grad_norm_last": round(float(lines[-1].get("grad_norm", -1)), 3),
            "backend": jax.default_backend(),
            "salt": salt,
            "recorded": time.strftime("%Y-%m-%d %H:%M"),
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
