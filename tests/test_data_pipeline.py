"""Offline data pipeline on synthetic scene directories: registration,
AmsVoxelLoader build + online getters, ChallengeDataset, prefetcher."""

import json
import os

import numpy as np
import pytest

from flowcompare_tpu.data import (
    AmsVoxelLoader,
    ChallengeDataset,
    PrefetchedDataset,
    batch_iterator,
    filter_scans,
)
from flowcompare_tpu.data.registration import (
    estimate_normals,
    icp_point_to_plane,
    registration_pipeline,
    voxel_downsample,
)
from flowcompare_tpu.data.synthetic import _scene_cloud


def _rigid(cloud, rad=0.05, t=(0.15, -0.1, 0.05)):
    c, s = np.cos(rad), np.sin(rad)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    out = cloud.copy()
    out[:, :3] = cloud[:, :3] @ rot.T + np.asarray(t)
    return out


def test_registration_recovers_rigid_motion():
    rng = np.random.default_rng(0)
    cloud = _scene_cloud(rng).astype(np.float64)
    moved = _rigid(cloud)
    registered = registration_pipeline([cloud, moved], voxel_size_icp=0.05,
                                       voxel_size_final=0.07)
    a, b = registered[0][:, :3], registered[1][:, :3]
    # nearest-neighbour residual between the registered downsampled clouds
    from scipy.spatial import cKDTree
    d, _ = cKDTree(a).query(b, k=1)
    assert np.median(d) < 0.06, f"median NN residual {np.median(d):.3f}"


def test_icp_identity_when_aligned():
    rng = np.random.default_rng(1)
    cloud = _scene_cloud(rng)[:, :3].astype(np.float64)
    ds = voxel_downsample(np.concatenate([cloud, cloud[:, :3] * 0 + cloud], 1)[:, :3][:, :3]
                          if False else cloud, 0.05)
    normals = estimate_normals(ds)
    res = icp_point_to_plane(ds, ds, normals, max_correspondence_distance=0.1)
    np.testing.assert_allclose(res.transformation, np.eye(4), atol=1e-3)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Fake AMS recording directory: response.json + per-scan .npz clouds."""
    root = tmp_path_factory.mktemp("ams")
    rng = np.random.default_rng(7)
    props = []
    for i, (cx, cy, year) in enumerate(
            [(0.0, 0.0, 2019), (1.0, 0.5, 2020), (50.0, 50.0, 2019),
             (50.5, 50.0, 2020)]):
        scan_id = f"scan{i}"
        cloud = _scene_cloud(rng, removed=(year == 2020 and i == 1))
        cloud = cloud.astype(np.float64)
        cloud[:, 0] += cx
        cloud[:, 1] += cy
        np.savez(root / f"{scan_id}.npz", points=cloud)
        props.append({
            "ImageId": scan_id, "X": cx, "Y": cy, "Height": 2.5,
            "GroundLevelOffset": 2.5,
            "RecordingTimeGps": f"{year}-06-01T12:00:00",
        })
    (root / "response.json").write_text(json.dumps(
        {"RecordingProperties": props}))
    (root / "args.json").write_text("{}")
    return str(root)


def test_ams_voxel_loader_end_to_end(scene_dir, tmp_path):
    loader = AmsVoxelLoader(
        scene_dir, scene_dir, str(tmp_path / "processed"),
        clearance=6, n_samples=128, n_samples_context=160,
        final_voxel_size=(2.0, 2.0, 4.0), context_voxel_size=(2.2, 2.2, 4.2),
        mode="train", self_pairs_train=True, cloud_ext=".npz",
        min_cloud_points=500)
    assert len(loader) > 0
    v0l, v1s, extra = loader[0]
    assert v0l.shape == (160, 6) and v1s.shape == (128, 6)
    assert extra.shape == (1,)
    # normalized into the unit ball
    assert np.linalg.norm(v0l[:, :3], axis=1).max() <= 1.0 + 1e-5

    # cache round-trip: preload reuses the pickles
    loader2 = AmsVoxelLoader(
        scene_dir, scene_dir, str(tmp_path / "processed"),
        clearance=6, n_samples=128, n_samples_context=160,
        final_voxel_size=(2.0, 2.0, 4.0), context_voxel_size=(2.2, 2.2, 4.2),
        mode="train", self_pairs_train=True, cloud_ext=".npz",
        min_cloud_points=500, preload=True)
    assert len(loader2) == len(loader)

    # include_all eval items
    loader.include_all = True
    item = loader[0]
    assert len(item) == 11

    # batching
    batches = list(batch_iterator(loader2, 2, shuffle=True, seed=1))
    if batches:
        assert batches[0][0].shape == (2, 160, 6)


def test_challenge_dataset(tmp_path):
    rng = np.random.default_rng(3)
    y0 = tmp_path / "2016"
    y1 = tmp_path / "2020"
    y0.mkdir()
    y1.mkdir()
    for scene in (1, 2):
        c0 = _scene_cloud(rng).astype(np.float64)
        c1 = _rigid(_scene_cloud(rng, removed=scene == 2))
        np.savez(y0 / f"{scene}_a.npz", points=c0)
        np.savez(y1 / f"{scene}_b.npz", points=c1)
    import pandas as pd
    df = pd.DataFrame({
        "scene": [1, 1, 2], "x": [0.0, 1.0, -1.0], "y": [0.0, 1.0, 0.5],
        "classification": ["nochange", "added", "removed"],
    })
    csv = tmp_path / "labels.csv"
    df.to_csv(csv, index=False)
    ds = ChallengeDataset(str(csv), [str(y0), str(y1)], str(tmp_path / "out"),
                          n_samples=64, n_samples_context=96,
                          context_voxel_size=(3, 3, 4), final_voxel_size=(3, 3, 4))
    assert len(ds) == 3
    item, label = ds[0]
    assert label == 0
    assert len(item["voxels"]) >= 1
    ctx_for_1, voxel_1, ctx_0_0, ctx_for_0, voxel_0, ctx_1_1, zc = item["voxels"][0]
    assert voxel_1.shape[1] == 6 and ctx_for_1.shape[1] == 6


def test_prefetched_dataset_matches_direct():
    from flowcompare_tpu.data import SyntheticVoxelDataset
    ds = SyntheticVoxelDataset(n_items=8, batch_size=4, sample_size=32,
                               n_samples_context=48)
    direct = list(ds)
    fetched = list(PrefetchedDataset(ds, prefetch=2))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a[0], b[0])


def test_batch_iterator_reshuffles_each_epoch():
    """DataLoader(shuffle=True) parity: a fresh permutation every epoch
    (reference train.py:41). Epoch folds into the shuffle seed."""

    class _Idx:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return (np.asarray([i], np.int64),)

    ds = _Idx()

    def order(epoch):
        return [int(b[0][j, 0]) for b in
                batch_iterator(ds, 4, shuffle=True, seed=0, epoch=epoch)
                for j in range(4)]

    e0, e1 = order(0), order(1)
    assert sorted(e0) == sorted(e1) == list(range(32))
    assert e0 != e1  # fresh permutation per epoch
    assert order(0) == e0  # still deterministic given (seed, epoch)
