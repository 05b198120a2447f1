"""Pallas TPU kernels for the hot point-set operators.

Each kernel has identical semantics to its XLA counterpart in
``pointnet2_tpu.ops.core`` (which is itself validated against the NumPy
oracles in ``pointnet2_tpu.ops.reference``).
"""

from pointnet2_tpu.ops.pallas.fps import (
    farthest_point_sample_pallas,
    fps_centroids_pallas,
    fps_centroids_pallas_diff,
)
from pointnet2_tpu.ops.pallas.ballquery import (
    ball_query_pallas,
    ball_query_sliced,
    ball_query_windowed,
)
from pointnet2_tpu.ops.pallas.interpolate import three_interpolate_pallas
from pointnet2_tpu.ops.pallas.wingather import project_group_sliced
from pointnet2_tpu.ops.pallas.knn import (
    knn_pallas,
    knn_sliced,
    three_nn_pallas,
    three_nn_sliced,
)

__all__ = [
    "farthest_point_sample_pallas",
    "fps_centroids_pallas",
    "fps_centroids_pallas_diff",
    "ball_query_pallas",
    "ball_query_sliced",
    "ball_query_windowed",
    "project_group_sliced",
    "knn_pallas",
    "knn_sliced",
    "three_nn_pallas",
    "three_nn_sliced",
    "three_interpolate_pallas",
]
