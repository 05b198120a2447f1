"""KITTI dataset tests on synthetic velodyne .bin scans."""

import os

import numpy as np
import pytest

from pointnet2_tpu.data.kitti import (
    KittiDataset,
    KittiFileData,
    KittiRawDrive,
    crop_box,
    load_calib,
    load_timestamps,
    load_velodyne_bin,
    oxts_to_pose,
)


def _write_drive(tmp_path, rng, date="2011_09_26", drive="0095", frames=3, n=5000):
    base = tmp_path / date / f"{date}_drive_{drive}_sync"
    d = base / "velodyne_points" / "data"
    d.mkdir(parents=True)
    for i in range(frames):
        scan = np.zeros((n, 4), np.float32)
        scan[:, :3] = rng.randn(n, 3) * [20, 10, 2]
        scan[:, 3] = rng.rand(n)
        scan.tofile(d / f"{i:010d}.bin")
    with open(base / "velodyne_points" / "timestamps.txt", "w") as f:
        for i in range(frames):
            f.write(f"2011-09-26 13:02:{25 + i:02d}.5943603{i}5\n")
    ox = base / "oxts" / "data"
    ox.mkdir(parents=True)
    for i in range(frames):
        vals = np.zeros(30)
        vals[0] = 49.011 + i * 1e-5  # lat
        vals[1] = 8.417 + i * 1e-5  # lon
        vals[2] = 112.8  # alt
        vals[5] = 0.1 * i  # yaw
        np.savetxt(ox / f"{i:010d}.txt", vals[None], fmt="%.9f")
    with open(tmp_path / date / "calib_imu_to_velo.txt", "w") as f:
        f.write("calib_time: 25-May-2012 16:47:16\n")
        f.write("R: 1 0 0 0 1 0 0 0 1\n")
        f.write("T: 0.1 0.2 0.3\n")
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


class TestKittiRaw:
    """pykitti.raw-equivalent metadata loaders (kitti_dataset.py:88-106)."""

    def test_drive_scans_and_timestamps(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=3)
        drive = KittiRawDrive(str(root), "2011_09_26", "0095")
        assert len(drive) == 3
        assert drive.get_velo(1).shape == (5000, 4)
        ts = drive.velo_timestamps
        assert ts.shape == (3,)
        # nanosecond fractions preserved, strictly increasing (1s apart)
        assert np.all(np.diff(ts) > 0.99)
        frac = ts[0] - np.floor(ts[0])
        assert abs(frac - 0.59436030499999) < 1e-6

    def test_oxts_packets_and_poses(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=3)
        drive = KittiRawDrive(str(root), "2011_09_26", "0095")
        packets, poses = drive.oxts
        assert packets.shape == (3, 30)
        assert poses.shape == (3, 4, 4)
        # pykitti/devkit convention: first frame at the origin
        np.testing.assert_allclose(poses[0, :3, 3], 0.0, atol=1e-9)
        # rotation blocks are orthonormal
        for p in poses:
            r = p[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
            assert p[3, 3] == 1.0
        # Mercator: +1e-5 deg lon at lat 49 is ~0.73 m east
        dx = poses[1, 0, 3] - poses[0, 0, 3]
        assert 0.5 < dx < 1.0
        # yaw differences show up in the rotation
        assert not np.allclose(poses[0, :3, :3], poses[2, :3, :3])

    def test_calib(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=1)
        drive = KittiRawDrive(str(root), "2011_09_26", "0095")
        calib = drive.calib
        np.testing.assert_array_equal(
            calib["imu_to_velo/R"], np.eye(3).ravel()
        )
        np.testing.assert_allclose(calib["imu_to_velo/T"], [0.1, 0.2, 0.3])
        assert isinstance(calib["imu_to_velo/calib_time"], str)

    def test_timestamp_and_calib_loaders_direct(self, rng, tmp_path):
        root = _write_drive(tmp_path, rng, frames=2)
        base = root / "2011_09_26" / "2011_09_26_drive_0095_sync"
        ts = load_timestamps(str(base / "velodyne_points" / "timestamps.txt"))
        assert len(ts) == 2
        calib = load_calib(str(root / "2011_09_26" / "calib_imu_to_velo.txt"))
        assert set(calib) == {"calib_time", "R", "T"}

    def test_pose_identity_at_zero_rpy(self):
        packets = np.zeros((2, 30))
        packets[:, 0] = 49.0
        packets[:, 1] = 8.4
        poses = oxts_to_pose(packets)
        np.testing.assert_allclose(poses[0, :3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(poses[0, :3, 3], poses[1, :3, 3])


def test_kitti_visualize_cli(rng, tmp_path, monkeypatch):
    import sys

    root = _write_drive(tmp_path, rng, frames=3, n=2000)
    out_dir = tmp_path / "frames"
    monkeypatch.setattr(
        sys, "argv",
        ["kitti_visualize.py", "--kitti_root", str(root),
         "--out_dir", str(out_dir), "--max_frames", "2"],
    )
    import kitti_visualize

    kitti_visualize.main()
    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) == 2
    assert pngs[0].stat().st_size > 5_000
