"""Point-cloud file IO.

Counterpart of reference `utils.load_las` (utils.py:20-45): reads a las/laz
file into an (N, 6) float array of xyz + rgb-scaled-to-[0,1]. laspy isn't
baked into this image, so `.npy`/`.npz` clouds are first-class too (the
synthetic scene tool writes those), and laspy is imported lazily.
"""

from __future__ import annotations

import os

import numpy as np


def load_cloud(path: str) -> np.ndarray:
    """Load a cloud from .las/.laz (via laspy) or .npy/.npz -> (N, >=6) f64.

    las path matches the reference: xyz + (red, green, blue) / 65536.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".las", ".laz"):
        import laspy  # optional dependency, gated
        with laspy.open(path) as f:
            las = f.read()
        xyz = np.stack([np.asarray(las.x), np.asarray(las.y),
                        np.asarray(las.z)], axis=-1)
        try:
            rgb = np.stack([np.asarray(las.red), np.asarray(las.green),
                            np.asarray(las.blue)], axis=-1) / 65536.0
        except AttributeError:
            rgb = np.zeros_like(xyz)
        return np.concatenate([xyz, rgb], axis=-1).astype(np.float64)
    if ext == ".npy":
        return np.load(path).astype(np.float64)
    if ext == ".npz":
        with np.load(path) as z:
            key = "points" if "points" in z else list(z.keys())[0]
            return z[key].astype(np.float64)
    raise ValueError(f"Unsupported cloud format: {path}")


# reference name kept for API familiarity
load_las = load_cloud
