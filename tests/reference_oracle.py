"""Import the actual reference implementation as a test oracle.

The reference package at /root/reference can't be imported wholesale on this
machine (its utils.py needs laspy, its models/__init__ pulls the CUDA-only
PAConv extension). This helper assembles an importable CPU subset in a temp
dir: symlinks to the untouched reference module files plus two tiny stubs
(a utils with just the tensor helpers, and a models/__init__ importing the
CPU-safe subset). Nothing is copied — the oracle runs the reference's own
code.
"""

from __future__ import annotations

import importlib
import os
import sys

REFERENCE = "/root/reference"

_MODEL_FILES = [
    "nets.py", "transform.py", "affine_coupling.py", "exponential_coupling.py",
    "spline_coupling.py", "act_norm.py", "permuters.py", "distributions.py",
    "augmenter.py", "slice.py", "cif_block.py", "perceiver.py", "pytorch_gcn.py",
]

_SHIM_IMPORTS = {
    "nets": ["MLP"],
    "transform": ["Transform", "Flow", "PreConditionApplier", "IdentityTransform"],
    "permuters": ["ExponentialCombiner", "Permuter", "FullCombiner", "Reverse",
                  "LinearLU"],
    "perceiver": ["get_cross_attn"],
    "pytorch_gcn": ["DGCNNembedder", "DGCNNembedderGlobal"],
    "augmenter": ["Augment", "AugmentAttentionPreconditioner"],
    "distributions": ["Distribution", "StandardUniform", "StandardNormal",
                      "ConditionalDistribution", "ConditionalMeanStdNormal",
                      "Normal", "ConditionalNormal"],
    "exponential_coupling": ["ExponentialCoupling"],
    "slice": ["Slice"],
    "act_norm": ["ActNormBijectionCloud"],
    "cif_block": ["CIFblock", "cif_helper"],
    "affine_coupling": ["AffineCoupling"],
    "spline_coupling": ["RationalQuadraticSplineCoupling"],
}

_UTILS_STUB = '''\
"""CPU-safe stand-in for the reference utils module: only the pure tensor
helpers the model stack needs (no laspy/plotly/dash imports)."""
import torch

def sum_except_batch(x, num_dims=1):
    return x.reshape(*x.shape[:num_dims], -1).sum(-1)

def mean_except_batch(x, num_dims=1):
    return x.reshape(*x.shape[:num_dims], -1).mean(-1)

def expm(x, eps, algo="torch"):
    return torch.matrix_exp(x)
'''

# Pure-torch stand-in for the CUDA pointops module, matching the kernel
# contracts (self-first kNN ordering, zero-padding when k > n, SQUARED
# 3-NN distances) so the reference PAConv stack runs on CPU as an oracle.
_POINTOPS_STUB = '''\
import torch
import torch.nn as nn


def _sqdist(a, b):
    aa = (a * a).sum(-1, keepdim=True)
    bb = (b * b).sum(-1).unsqueeze(-2)
    return aa - 2 * torch.matmul(a, b.transpose(-1, -2)) + bb


def furthestsampling(xyz, m):
    b, n, _ = xyz.shape
    idx = torch.zeros(b, m, dtype=torch.long)
    d = torch.full((b, n), float("inf"))
    far = torch.zeros(b, dtype=torch.long)
    for i in range(m):
        idx[:, i] = far
        centroid = xyz[torch.arange(b), far][:, None, :]
        d = torch.minimum(d, ((xyz - centroid) ** 2).sum(-1))
        far = d.argmax(-1)
    return idx.int()


def gathering(features, idx):
    b, c, _ = features.shape
    return torch.gather(
        features, 2, idx.long().unsqueeze(1).expand(b, c, idx.shape[1]))


def knnquery_heap(nsample, xyz, new_xyz):
    d = _sqdist(new_xyz, xyz)
    k = min(nsample, xyz.shape[1])
    idx = d.topk(k, dim=-1, largest=False).indices
    if k < nsample:  # CUDA heap pads untouched slots with index 0
        pad = torch.zeros(idx.shape[0], idx.shape[1], nsample - k,
                          dtype=idx.dtype)
        idx = torch.cat([idx, pad], dim=-1)
    return idx.int()


knnquery = knnquery_heap
knnquery_naive = knnquery_heap


def grouping(features, idx):
    b, c, _ = features.shape
    m, k = idx.shape[1:]
    flat = idx.long().reshape(b, 1, m * k).expand(b, c, m * k)
    return torch.gather(features, 2, flat).reshape(b, c, m, k)


def nearestneighbor(unknown, known):
    d = _sqdist(unknown, known)
    k = min(3, known.shape[1])
    v, i = d.topk(k, -1, largest=False)
    if k < 3:  # CUDA kernel pads best-3 slots with 1e40 / idx 0
        pad_v = torch.full((v.shape[0], v.shape[1], 3 - k), 1e20)
        pad_i = torch.zeros(i.shape[0], i.shape[1], 3 - k, dtype=i.dtype)
        v = torch.cat([v, pad_v], -1)
        i = torch.cat([i, pad_i], -1)
    return v, i.int()


def interpolation(feats, idx, weight):
    g = grouping(feats, idx)
    return (g * weight.unsqueeze(1)).sum(-1)


def ballquery(radius, nsample, xyz, new_xyz):
    raise NotImplementedError("oracle stub: kNN path only")


class QueryAndGroup(nn.Module):
    """pointops.py:545-594 semantics, kNN path."""

    def __init__(self, radius=None, nsample=32, use_xyz=True,
                 return_idx=False):
        super().__init__()
        self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz
        self.return_idx = return_idx

    def forward(self, xyz, new_xyz=None, features=None, idx=None):
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            assert self.radius is None, "oracle stub: kNN path only"
            idx = knnquery_heap(self.nsample, xyz, new_xyz)
        xyz_trans = xyz.transpose(1, 2).contiguous()
        grouped_xyz = grouping(xyz_trans, idx)
        grouped_xyz_diff = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
        if features is not None:
            grouped_features = grouping(features, idx)
            if self.use_xyz:
                new_features = torch.cat([grouped_xyz_diff, grouped_features],
                                         dim=1)
            else:
                new_features = grouped_features
        else:
            new_features = grouped_xyz_diff
        if self.return_idx:
            return new_features, grouped_xyz, idx.long()
        return new_features, grouped_xyz
'''

_PACONV_FUNCTIONAL_STUB = '''\
def assign_score_withk(*args, **kwargs):
    raise NotImplementedError("CUDA-only path; the oracle uses PAConv (non-CUDA)")
'''

_PACONV_FILES = {
    "model/pointnet2/pointnet2_paconv_seg.py": None,
    "model/pointnet2/pointnet2_paconv_modules.py": None,
    "model/pointnet2/paconv.py": None,
    "util/block.py": None,
    "util/paconv_util.py": None,
}


def build_reference_oracle(root: str, with_paconv: bool = False):
    """Create the shim under `root` and import the reference modules.

    Returns the imported `model_initialization` module. with_paconv adds the
    scene_seg_PAConv subtree with the pure-torch pointops stub so the PAConv
    encoder runs on CPU.
    """
    root = str(root)
    models_dir = os.path.join(root, "models")
    os.makedirs(models_dir, exist_ok=True)
    with open(os.path.join(root, "utils.py"), "w") as f:
        f.write(_UTILS_STUB)
    init_lines = [
        f"from .{mod} import {', '.join(names)}"
        for mod, names in _SHIM_IMPORTS.items()
    ]
    if with_paconv:
        init_lines.append(
            "from .scene_seg_PAConv.model.pointnet2.pointnet2_paconv_seg "
            "import PointNet2SSGSeg")
    with open(os.path.join(models_dir, "__init__.py"), "w") as f:
        f.write("\n".join(init_lines) + "\n")
    for fname in _MODEL_FILES:
        dst = os.path.join(models_dir, fname)
        if not os.path.exists(dst):
            os.symlink(os.path.join(REFERENCE, "models", fname), dst)
    if with_paconv:
        base = os.path.join(models_dir, "scene_seg_PAConv")
        for pkg in ("", "model", "model/pointnet2", "util", "lib",
                    "lib/pointops", "lib/pointops/functions", "lib/paconv_lib"):
            d = os.path.join(base, pkg)
            os.makedirs(d, exist_ok=True)
            initp = os.path.join(d, "__init__.py")
            if not os.path.exists(initp):
                open(initp, "w").close()
        for rel in _PACONV_FILES:
            dst = os.path.join(base, rel)
            if not os.path.exists(dst):
                os.symlink(
                    os.path.join(REFERENCE, "models/scene_seg_PAConv", rel),
                    dst)
        with open(os.path.join(base, "lib/pointops/functions/pointops.py"),
                  "w") as f:
            f.write(_POINTOPS_STUB)
        with open(os.path.join(base, "lib/paconv_lib/functional.py"),
                  "w") as f:
            f.write(_PACONV_FUNCTIONAL_STUB)
    mi_dst = os.path.join(root, "model_initialization.py")
    if not os.path.exists(mi_dst):
        os.symlink(os.path.join(REFERENCE, "model_initialization.py"), mi_dst)

    for name in list(sys.modules):
        if name == "models" or name.startswith("models.") or name in (
                "utils", "model_initialization"):
            del sys.modules[name]
    sys.path.insert(0, root)
    try:
        mi = importlib.import_module("model_initialization")
    finally:
        pass
    return mi


def teardown_reference_oracle(root: str):
    root = str(root)
    if root in sys.path:
        sys.path.remove(root)
    for name in list(sys.modules):
        if name == "models" or name.startswith("models.") or name in (
                "utils", "model_initialization"):
            del sys.modules[name]
