"""flowcompare_tpu — a TPU-native conditional normalizing-flow framework for
unsupervised point-cloud change detection.

Built from scratch against the behavioural spec of SamGalanakis/FlowCompare
(see SURVEY.md): same capabilities — conditional flows over multi-temporal
LiDAR voxels, DGCNN/PAConv conditioning encoders, per-point likelihood
change scoring — redesigned for JAX/XLA/Pallas on TPU device meshes.
"""

from .configs import PRESETS, get_config
from .model import FlowCompareModel, inner_loop, make_sample

__version__ = "0.1.0"

__all__ = ["PRESETS", "get_config", "FlowCompareModel", "inner_loop", "make_sample"]
