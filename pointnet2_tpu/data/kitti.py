"""KITTI Velodyne dataset for streaming inference.

Parity with dataset/kitti_dataset.py: each frame is cropped to a box around
the origin (z in [-2, 5], x/y in +-box/2, kitti_dataset.py:15-26), x-sorted,
and served as a single fixed-size z-box batch
(get_batch_of_one_z_box_from_origin, :40-54).

Frames load either through pykitti (if installed, like the reference) or
directly from the raw `velodyne_points/data/*.bin` files (float32 x,y,z,
reflectance), so the pipeline has no hard pykitti dependency.
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, Optional

import numpy as np

from pointnet2_tpu.data.semantic3d import LABEL_NAMES, NUM_CLASSES, SemanticFileData


def crop_box(points: np.ndarray, min_bound, max_bound) -> np.ndarray:
    """Axis-aligned crop (open3d.crop_point_cloud equivalent)."""
    mask = np.all((points >= min_bound) & (points <= max_bound), axis=1)
    return points[mask]


def load_velodyne_bin(path: str) -> np.ndarray:
    """One KITTI .bin scan -> (N, 4) float32 [x y z reflectance]."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def iter_velodyne_frames(base_dir: str, date: str, drive: str) -> Iterable[np.ndarray]:
    """Yield (N, 4) scans for a drive; pykitti layout on disk."""
    pattern = os.path.join(
        base_dir,
        date,
        f"{date}_drive_{drive}_sync",
        "velodyne_points",
        "data",
        "*.bin",
    )
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no velodyne scans under {pattern}")
    for f in files:
        yield load_velodyne_bin(f)


class KittiFileData(SemanticFileData):
    """One Velodyne frame, cropped near the origin. No labels/colors."""

    def __init__(self, points: np.ndarray, box_size_x: float, box_size_y: float,
                 rng: Optional[np.random.RandomState] = None):
        self.box_size_x = box_size_x
        self.box_size_y = box_size_y
        self.rng = rng or np.random.RandomState()

        min_bound = [-box_size_x / 2.0, -box_size_y / 2.0, -2.0]
        max_bound = [box_size_x / 2.0, box_size_y / 2.0, 5.0]
        self.points = crop_box(np.asarray(points[:, :3], np.float64), min_bound, max_bound)
        self.labels = np.zeros(len(self.points), dtype=np.int32)
        self.colors = np.zeros_like(self.points)

        sort_idx = np.argsort(self.points[:, 0])
        self.points = self.points[sort_idx]
        self.labels = self.labels[sort_idx]
        self.colors = self.colors[sort_idx]

    def get_batch_of_one_z_box_from_origin(self, num_points_per_sample: int):
        mask = self._get_fix_sized_sample_mask(self.points, num_points_per_sample)
        points = self.points[mask]
        centered = self._center_box(points)
        return centered[None, ...], points[None, ...]


class KittiDataset:
    """All frames of the requested drives, loaded eagerly like the reference."""

    def __init__(
        self,
        num_points_per_sample: int,
        base_dir: str,
        dates,
        drives,
        box_size_x: float,
        box_size_y: float,
    ):
        self.num_points_per_sample = num_points_per_sample
        self.num_classes = NUM_CLASSES
        self.labels_names = list(LABEL_NAMES)
        self.box_size_x = box_size_x
        self.box_size_y = box_size_y

        self.list_file_data: list[KittiFileData] = []
        for date in dates:
            for drive in drives:
                print(f"Loading date: {date}, drive: {drive}")
                for frame_idx, scan in enumerate(
                    iter_velodyne_frames(base_dir, date, drive)
                ):
                    fd = KittiFileData(
                        points=scan[:, :3],
                        box_size_x=box_size_x,
                        box_size_y=box_size_y,
                    )
                    fd.file_path_without_ext = os.path.join(
                        date, drive, f"{frame_idx:04d}"
                    )
                    self.list_file_data.append(fd)
