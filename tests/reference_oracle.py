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


def build_reference_oracle(root: str):
    """Create the shim under `root` and import the reference modules.

    Returns the imported `model_initialization` module.
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
    with open(os.path.join(models_dir, "__init__.py"), "w") as f:
        f.write("\n".join(init_lines) + "\n")
    for fname in _MODEL_FILES:
        dst = os.path.join(models_dir, fname)
        if not os.path.exists(dst):
            os.symlink(os.path.join(REFERENCE, "models", fname), dst)
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
