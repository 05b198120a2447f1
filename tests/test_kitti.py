"""KITTI dataset tests on synthetic velodyne .bin scans."""

import os

import numpy as np
import pytest

from pointnet2_tpu.data.kitti import (
    KittiDataset,
    KittiFileData,
    crop_box,
    load_velodyne_bin,
)


def _write_drive(tmp_path, rng, date="2011_09_26", drive="0095", frames=3, n=5000):
    d = tmp_path / date / f"{date}_drive_{drive}_sync" / "velodyne_points" / "data"
    d.mkdir(parents=True)
    for i in range(frames):
        scan = np.zeros((n, 4), np.float32)
        scan[:, :3] = rng.randn(n, 3) * [20, 10, 2]
        scan[:, 3] = rng.rand(n)
        scan.tofile(d / f"{i:010d}.bin")
    return tmp_path


class TestKitti:
    def test_load_bin(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=1)
        path = (
            root / "2011_09_26" / "2011_09_26_drive_0095_sync"
            / "velodyne_points" / "data" / "0000000000.bin"
        )
        scan = load_velodyne_bin(str(path))
        assert scan.shape == (5000, 4)

    def test_crop_box(self, rng):
        pts = rng.randn(1000, 3) * 10
        out = crop_box(pts, [-5, -5, -2], [5, 5, 5])
        assert (np.abs(out[:, :2]) <= 5).all()
        assert (out[:, 2] >= -2).all() and (out[:, 2] <= 5).all()

    def test_file_data_crop_and_sort(self, rng):
        pts = rng.randn(20000, 3) * [30, 10, 3]
        fd = KittiFileData(pts, box_size_x=60, box_size_y=20,
                           rng=np.random.RandomState(0))
        # z in [-2, 5], x in +-30, y in +-10 (kitti_dataset.py:15-26)
        assert (fd.points[:, 2] >= -2).all() and (fd.points[:, 2] <= 5).all()
        assert (np.abs(fd.points[:, 0]) <= 30).all()
        assert (np.diff(fd.points[:, 0]) >= 0).all()  # x-sorted

    def test_one_z_box_batch(self, rng):
        pts = rng.randn(20000, 3) * [10, 5, 2]
        fd = KittiFileData(pts, box_size_x=60, box_size_y=20,
                           rng=np.random.RandomState(0))
        centered, raw = fd.get_batch_of_one_z_box_from_origin(1024)
        assert centered.shape == (1, 1024, 3)
        assert raw.shape == (1, 1024, 3)
        assert centered[0, :, 2].min() == pytest.approx(0.0, abs=1e-9)

    def test_dataset_loads_all_frames(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=3)
        ds = KittiDataset(
            num_points_per_sample=512,
            base_dir=str(root),
            dates=["2011_09_26"],
            drives=["0095"],
            box_size_x=60,
            box_size_y=20,
        )
        assert len(ds.list_file_data) == 3
        assert ds.list_file_data[0].file_path_without_ext.endswith("0000")

    def test_missing_drive_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            KittiDataset(512, str(tmp_path), ["2011_09_26"], ["0001"], 60, 20)
