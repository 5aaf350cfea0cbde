"""Point-cloud normalizations and voxel cropping (jit-able, numpy/jax dual).

Counterparts of the reference `utils.py` helpers used on the online data
path: unit_sphere / co_unit_sphere (utils.py:259-282), get_voxel
(utils.py:135-144), random_subsample (utils.py:146-152), oversample_cloud
(utils.py:362-371), rotate_xy (utils.py:410-414).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def unit_sphere(points: jnp.ndarray, return_inverse: bool = False):
    """Zero-mean, unit-ball normalize xyz (first 3 channels); rgb untouched."""
    mean = points[:, :3].mean(axis=0)
    xyz = points[:, :3] - mean
    furthest = jnp.max(jnp.linalg.norm(xyz, axis=-1))
    out = jnp.concatenate([xyz / furthest, points[:, 3:]], axis=-1)
    if return_inverse:
        return out, {"furthest_distance": furthest, "mean": mean}
    return out


def co_unit_sphere(points_0: jnp.ndarray, points_1: jnp.ndarray,
                   return_inverse: bool = False):
    """Joint zero-mean unit-ball normalization of a pair (utils.py:271-282)."""
    l0 = points_0.shape[0]
    joint, inverse = unit_sphere(
        jnp.concatenate((points_0, points_1)), return_inverse=True)
    if return_inverse:
        return joint[:l0], joint[l0:], inverse
    return joint[:l0], joint[l0:]


def get_voxel_mask(cloud_xyz: np.ndarray, center: np.ndarray,
                   size) -> np.ndarray:
    """Boolean mask of points inside the axis-aligned box center +- size/2."""
    size = np.asarray(size)
    lo = np.asarray(center) - size / 2
    hi = np.asarray(center) + size / 2
    return np.all((cloud_xyz >= lo) & (cloud_xyz < hi), axis=-1)


def get_voxel(cloud: np.ndarray, center, size) -> np.ndarray:
    """Crop the points of `cloud` inside the voxel box (utils.py:135-144)."""
    mask = get_voxel_mask(cloud[:, :3], center, size)
    return cloud[mask]


def oversample_cloud(cloud: np.ndarray, n_points: int,
                     rng: np.random.Generator | None = None) -> np.ndarray:
    """Repeat random points until the cloud reaches n_points (utils.py:362)."""
    n0 = cloud.shape[0]
    if n0 >= n_points:
        return cloud
    rng = rng or np.random.default_rng(0)
    extra = rng.integers(0, n0, n_points - n0)
    return np.concatenate((cloud, cloud[extra]))


def random_subsample(cloud: np.ndarray, n_points: int,
                     rng: np.random.Generator | None = None) -> np.ndarray:
    n0 = cloud.shape[0]
    if n0 <= n_points:
        return cloud
    rng = rng or np.random.default_rng(0)
    idx = rng.choice(n0, n_points, replace=False)
    return cloud[idx]


def rotate_xy(rad: float) -> np.ndarray:
    c, s = np.cos(rad), np.sin(rad)
    return np.array([[c, -s], [s, c]], dtype=np.float32)


def min_max_norm(t):
    return (t - t.min()) / (t.max() - t.min())


def fps_numpy(points: np.ndarray, m: int,
              rng: np.random.Generator | None = None) -> np.ndarray:
    """Deterministic farthest-point sampling (start index 0 —
    random_start=False as in the reference loaders, ams_voxel_loader.py:298),
    oversampling when the cloud is smaller than m. Host-side counterpart of
    ops/fps.py for the offline data path."""
    n = points.shape[0]
    if n <= m:
        return oversample_cloud(points, m, rng)
    from .. import native
    sel = native.fps_indices(np.ascontiguousarray(points, np.float32), m)
    return points[sel]


def np_co_unit_sphere(p0: np.ndarray, p1: np.ndarray):
    """Joint zero-mean unit-ball normalization, numpy (utils.py:271-282)."""
    l0 = p0.shape[0]
    joint = np.concatenate((p0, p1)).astype(np.float32).copy()
    mean = joint[:, :3].mean(axis=0)
    joint[:, :3] -= mean
    furthest = np.max(np.linalg.norm(joint[:, :3], axis=-1))
    joint[:, :3] /= furthest
    inverse = {"furthest_distance": furthest, "mean": mean}
    return joint[:l0], joint[l0:], inverse


def extract_area(cloud: np.ndarray, center, clearance: float,
                 shape: str = "square") -> np.ndarray:
    """Boolean mask of points within a square/circle around (x, y)
    (utils.py:117-133)."""
    xy = cloud[:, :2] - np.asarray(center)[:2]
    if shape == "square":
        return np.all(np.abs(xy) < clearance, axis=-1)
    if shape == "circle":
        return np.linalg.norm(xy, axis=-1) < clearance
    raise ValueError(f"invalid shape {shape}")
