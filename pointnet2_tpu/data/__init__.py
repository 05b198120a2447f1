from pointnet2_tpu.data.io import (
    PointCloud,
    load_labels,
    read_pcd,
    read_pts,
    read_semantic3d_txt,
    write_labels,
    write_pcd,
)
from pointnet2_tpu.data.voxel import voxel_downsample_with_trace

__all__ = [
    "PointCloud",
    "read_pcd",
    "write_pcd",
    "read_pts",
    "read_semantic3d_txt",
    "load_labels",
    "write_labels",
    "voxel_downsample_with_trace",
]
