from .ams_voxel_loader import AmsVoxelLoader, Scan, batch_iterator, filter_scans
from .challenge_loader import ChallengeDataset
from .las_io import load_cloud, load_las, save_las
from .laz import read_laz, write_laz
from .packed import PackedVoxelDataset, pack_dataset, write_packed
from .prefetch import PrefetchedDataset
from .synthetic import SyntheticVoxelDataset
from .transforms import (
    co_unit_sphere,
    extract_area,
    fps_numpy,
    get_voxel,
    np_co_unit_sphere,
    oversample_cloud,
    random_subsample,
    unit_sphere,
)

__all__ = [
    "AmsVoxelLoader", "Scan", "batch_iterator", "filter_scans",
    "ChallengeDataset", "load_cloud", "load_las", "save_las",
    "read_laz", "write_laz", "PrefetchedDataset",
    "PackedVoxelDataset", "pack_dataset", "write_packed",
    "SyntheticVoxelDataset",
    "co_unit_sphere", "extract_area", "fps_numpy", "get_voxel",
    "np_co_unit_sphere", "oversample_cloud", "random_subsample", "unit_sphere",
]
