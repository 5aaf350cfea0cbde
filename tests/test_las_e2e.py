"""File-level end-to-end on LAS scenes: save_las -> AmsVoxelLoader offline
pipeline (registration included) -> train a few steps -> eval.

The reference's data path runs on real laz scenes
(/root/reference/dataloaders/ams_voxel_loader.py:105-263); this exercises
the same path from files on disk through the dependency-free LAS 1.2
codec in data/las_io.py AND (round 5) the native LASzip .laz codec in
data/laz.py — laspy isn't available in this image and is no longer
needed. Chip-level counterpart: tools/laz_train_chip_smoke.py."""

import json
import os

import jax
import numpy as np
import pytest

from flowcompare_tpu.data import AmsVoxelLoader, batch_iterator
from flowcompare_tpu.data.las_io import load_cloud, save_las
from flowcompare_tpu.data.synthetic import _scene_cloud

from test_model import tiny_config


def test_save_load_las_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.normal(size=(500, 3)) * 5.0,
                          rng.uniform(size=(500, 3))], axis=1)
    path = str(tmp_path / "cloud.las")
    save_las(path, pts)
    back = load_cloud(path)
    assert back.shape == (500, 6)
    # xyz quantized at the 1e-4 LAS scale; rgb at u16 resolution
    np.testing.assert_allclose(back[:, :3], pts[:, :3], atol=1e-4)
    np.testing.assert_allclose(back[:, 3:], pts[:, 3:], atol=1.5 / 65535)


def test_save_las_without_rgb(tmp_path):
    path = str(tmp_path / "xyz.las")
    save_las(path, np.zeros((10, 3)))
    back = load_cloud(path)
    assert back.shape == (10, 6)
    np.testing.assert_array_equal(back[:, 3:], 0.0)


def test_load_laz_without_laspy_uses_native_codec(tmp_path):
    # a fake .laz (no laszip VLR) must fail loudly INSIDE the native codec
    # (round 5: .laz no longer gates on laspy when the codec builds)
    p = tmp_path / "cloud.laz"
    p.write_bytes(b"LASF" + b"\x00" * 300)
    from flowcompare_tpu.data import laz as laz_mod
    if laz_mod.get_lib() is None:
        pytest.skip("native laz codec unavailable")
    with pytest.raises(ValueError, match="laszip VLR"):
        load_cloud(str(p))


@pytest.fixture(scope="module")
def las_scene_dir(tmp_path_factory):
    """AMS recording directory with UNCOMPRESSED .las scans on disk."""
    root = tmp_path_factory.mktemp("ams_las")
    rng = np.random.default_rng(11)
    props = []
    for i, (cx, cy, year) in enumerate(
            [(0.0, 0.0, 2019), (1.0, 0.5, 2020)]):
        scan_id = f"scan{i}"
        cloud = _scene_cloud(rng, removed=(year == 2020)).astype(np.float64)
        cloud[:, 0] += cx
        cloud[:, 1] += cy
        save_las(str(root / f"{scan_id}.las"), cloud)
        props.append({
            "ImageId": scan_id, "X": cx, "Y": cy, "Height": 2.5,
            "GroundLevelOffset": 2.5,
            "RecordingTimeGps": f"{year}-06-01T12:00:00",
        })
    (root / "response.json").write_text(json.dumps(
        {"RecordingProperties": props}))
    return str(root)


def test_las_scene_to_training_and_eval(las_scene_dir, tmp_path):
    """Full slice: .las decode -> registration -> voxel pairing -> batches
    -> a few train steps -> evaluate_on_test on the 11-tensor items."""
    loader = AmsVoxelLoader(
        las_scene_dir, las_scene_dir, str(tmp_path / "processed"),
        clearance=6, n_samples=64, n_samples_context=96,
        final_voxel_size=(2.0, 2.0, 4.0), context_voxel_size=(2.2, 2.2, 4.2),
        mode="train", self_pairs_train=True, cloud_ext=".las",
        min_cloud_points=500)
    assert len(loader) > 0

    from flowcompare_tpu.model import FlowCompareModel
    from flowcompare_tpu.train import train

    cfg = tiny_config(
        input_dim=6, sample_size=64, n_samples_context=96,
        input_embedder="DGCNNembedder", n_neighbors=4, batch_size=2,
        make_samples=False, batches_per_save=1000)
    model = FlowCompareModel(cfg)
    batches = list(batch_iterator(loader, 2, shuffle=True, seed=0))[:3]
    assert batches and batches[0][0].shape == (2, 96, 6)
    state = train(model, batches, key=jax.random.PRNGKey(0),
                  save_dir=str(tmp_path / "run"), max_steps=3)
    lines = [json.loads(l)
             for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert len(lines) == 3 and all(np.isfinite(l["loss"]) for l in lines)

    # eval on the include_all 11-tensor items, through the same files
    from flowcompare_tpu.eval import evaluate_on_test
    eval_loader = AmsVoxelLoader(
        las_scene_dir, las_scene_dir, str(tmp_path / "processed_test"),
        clearance=6, n_samples=64, n_samples_context=96,
        final_voxel_size=(2.0, 2.0, 4.0), context_voxel_size=(2.2, 2.2, 4.2),
        mode="test", include_all=True, cloud_ext=".las",
        min_cloud_points=500)
    ev_batches = list(batch_iterator(eval_loader, 2))[:2]
    assert ev_batches
    nats, change_list = evaluate_on_test(
        model, state.params, state.bn_state, ev_batches,
        rng=jax.random.PRNGKey(1))
    assert np.isfinite(nats)
    assert len(change_list) == 2 * len(ev_batches)
    assert all(0.0 <= c <= 1.0 for c in change_list)


def test_las_14_is_rejected_by_builtin_reader(tmp_path):
    """LAS 1.4 may zero the legacy point count the built-in reader uses —
    must refuse loudly rather than decode an empty cloud."""
    import struct
    p = tmp_path / "v14.las"
    save_las(str(p), np.zeros((4, 3)))
    raw = bytearray(p.read_bytes())
    struct.pack_into("<BB", raw, 24, 1, 4)  # bump version to 1.4
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="1.4"):
        load_cloud(str(p))


def test_laz_gate_message_carries_conversion_recipe(tmp_path, monkeypatch):
    """When NEITHER laspy nor the native codec is available, the .laz
    ImportError must spell out the off-box conversion routes
    (docs/data.md) — a bare 'install laspy' strands the user."""
    from flowcompare_tpu.data import laz as laz_mod
    monkeypatch.setattr(laz_mod, "get_lib", lambda: None)
    p = tmp_path / "cloud.laz"
    p.write_bytes(b"LASF" + b"\x00" * 300)
    with pytest.raises(ImportError) as ei:
        load_cloud(str(p))
    msg = str(ei.value)
    assert "laspy" in msg and "pack" in msg and "docs/data.md" in msg


def test_laz_scene_to_voxel_pairs(tmp_path):
    """The reference's ACTUAL data path — compressed .laz scans on disk
    through AmsVoxelLoader's offline pipeline (reference
    dataloaders/ams_voxel_loader.py:128-141 reads .laz via laspy; here the
    native LASzip codec decodes, registration and voxel pairing follow)."""
    from flowcompare_tpu.data import laz as laz_mod
    if laz_mod.get_lib() is None:
        pytest.skip("native laz codec unavailable")
    root = tmp_path / "ams_laz"
    root.mkdir()
    rng = np.random.default_rng(31)
    props = []
    for i, (cx, cy, year) in enumerate(
            [(0.0, 0.0, 2019), (1.0, 0.5, 2020)]):
        scan_id = f"scan{i}"
        cloud = _scene_cloud(rng, removed=(year == 2020)).astype(np.float64)
        cloud[:, 0] += cx
        cloud[:, 1] += cy
        laz_mod.write_laz(str(root / f"{scan_id}.laz"), cloud)
        props.append({
            "ImageId": scan_id, "X": cx, "Y": cy, "Height": 2.5,
            "GroundLevelOffset": 2.5,
            "RecordingTimeGps": f"{year}-06-01T12:00:00",
        })
    (root / "response.json").write_text(json.dumps(
        {"RecordingProperties": props}))
    loader = AmsVoxelLoader(
        str(root), str(root), str(tmp_path / "processed_laz"),
        clearance=6, n_samples=64, n_samples_context=96,
        final_voxel_size=(2.0, 2.0, 4.0), context_voxel_size=(2.2, 2.2, 4.2),
        mode="train", self_pairs_train=True, cloud_ext=".laz",
        min_cloud_points=500)
    assert len(loader) > 0
    ctx, sample, extra = loader[0][:3]
    assert ctx.shape == (96, 6) and sample.shape == (64, 6)
    assert np.isfinite(ctx).all() and np.isfinite(sample).all()


def test_save_las_wide_extent_does_not_wrap(tmp_path):
    """Extents beyond ~214 km overflow int32 at the fixed 1e-4 scale —
    save_las must widen the scale instead of silently wrapping (ADVICE r3)."""
    from flowcompare_tpu.data.las_io import save_las

    pts = np.zeros((2, 6))
    pts[1, 0] = 500_000.0          # 500 km extent in x
    path = str(tmp_path / "wide.las")
    save_las(path, pts)
    back = load_cloud(path)
    np.testing.assert_allclose(back[:, :3], pts[:, :3], atol=1e-2)
