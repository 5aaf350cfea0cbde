from .fps import fps_subsample, furthest_point_sampling
from .knn import (
    ball_query,
    gather_neighbors,
    knn_indices,
    knn_self,
    nearest_neighbor_gather,
    pairwise_sqdist,
    three_nn_interpolate,
)
from .paconv_ops import paconv_assign_score

__all__ = [
    "fps_subsample", "furthest_point_sampling",
    "ball_query", "gather_neighbors", "knn_indices", "knn_self",
    "nearest_neighbor_gather", "pairwise_sqdist", "three_nn_interpolate",
    "paconv_assign_score",
]
