"""Native (C++) runtime ops vs their numpy references, and the packed
dataset round trip."""

import numpy as np
import pytest

from flowcompare_tpu import native
from flowcompare_tpu.data import SyntheticVoxelDataset
from flowcompare_tpu.data.packed import PackedVoxelDataset, pack_dataset


def test_native_builds():
    assert native.available(), "g++ toolchain expected in this image"


def test_voxelize_grid_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (5000, 6)).astype(np.float32)
    start = pts[:, :3].min(0)
    size = np.array([2.0, 2.0, 4.0], np.float32)
    steps = np.floor((pts[:, :3].max(0) - start) / size).astype(np.int64) + 1
    ids = native.voxelize_grid(pts, start, size, steps)
    cell = np.clip(np.floor((pts[:, :3] - start) / size).astype(np.int64),
                   0, steps - 1)
    strides = np.concatenate([[1], np.cumprod(steps[:-1])])
    np.testing.assert_array_equal(ids, (cell * strides).sum(-1))


def test_native_fps_matches_python():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(800, 6)).astype(np.float32)
    idx = native.fps_indices(pts, 64)
    # python reference
    sel = np.zeros(64, np.int64)
    d = np.full(800, np.inf)
    far = 0
    for i in range(64):
        sel[i] = far
        dd = np.sum((pts[:, :3] - pts[far, :3]) ** 2, axis=1)
        d = np.minimum(d, dd)
        far = int(np.argmax(d))
    np.testing.assert_array_equal(idx, sel)


def test_gather_records():
    base = np.arange(40, dtype=np.float32)
    out = native.gather_records(base, np.array([3, 0, 2]), 10)
    np.testing.assert_array_equal(out[0], base[30:40])
    np.testing.assert_array_equal(out[1], base[:10])


def test_packed_dataset_roundtrip(tmp_path):
    ds = SyntheticVoxelDataset(n_items=6, batch_size=2, sample_size=32,
                               n_samples_context=48)
    path = str(tmp_path / "data.fcpack")
    info = pack_dataset(ds, path)
    assert info["n_items"] == 6
    packed = PackedVoxelDataset(path, batch_size=2)
    batches = list(packed)
    assert len(batches) == 3
    e0, e1, extra = batches[0]
    assert e0.shape == (2, 48, 6) and e1.shape == (2, 32, 6)
    assert extra.shape == (2, 1)
    # values match the live items
    ref0 = ds.get_item(0)
    np.testing.assert_allclose(e0[0], ref0[0], rtol=1e-6)
    np.testing.assert_allclose(extra[0], ref0[2], rtol=1e-6)
    # shuffled epochs differ in order but cover the same set
    packed_s = PackedVoxelDataset(path, batch_size=2, shuffle=True, seed=3)
    all_a = np.sort(np.concatenate([b[2].reshape(-1) for b in packed_s]))
    all_b = np.sort(np.concatenate([b[2].reshape(-1) for b in packed]))
    np.testing.assert_allclose(all_a, all_b, rtol=1e-6)


def test_packed_dataset_many_items(tmp_path):
    """Regression: the back-patched header must accommodate item counts with
    more digits than the streaming-time placeholder (>= 10 items)."""
    ds = SyntheticVoxelDataset(n_items=14, batch_size=2, sample_size=16,
                               n_samples_context=24)
    path = str(tmp_path / "many.fcpack")
    info = pack_dataset(ds, path)
    assert info["n_items"] == 14
    packed = PackedVoxelDataset(path, batch_size=7)
    assert packed.n_items == 14
    assert len(list(packed)) == 2
