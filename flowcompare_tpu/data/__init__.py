from .synthetic import SyntheticVoxelDataset
from .transforms import (
    co_unit_sphere,
    get_voxel,
    oversample_cloud,
    random_subsample,
    unit_sphere,
)

__all__ = [
    "SyntheticVoxelDataset",
    "co_unit_sphere", "get_voxel", "oversample_cloud",
    "random_subsample", "unit_sphere",
]
