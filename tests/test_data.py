"""Data layer tests: pcd/pts/labels IO round-trips, voxel downsample with
trace + majority labels, z-box sampling, augmentation, dataset mechanics."""

import numpy as np
import pytest

from pointnet2_tpu.data import augment
from pointnet2_tpu.data.io import (
    load_labels,
    read_pcd,
    read_pts,
    read_semantic3d_txt,
    write_labels,
    write_pcd,
)
from pointnet2_tpu.data.io import write_pts
from pointnet2_tpu.data.semantic3d import SemanticDataset, SemanticFileData
from pointnet2_tpu.data.voxel import majority_vote_labels, voxel_downsample_with_trace


class TestIO:
    def test_pcd_binary_roundtrip(self, rng, tmp_path):
        pts = rng.rand(100, 3) * 10
        colors = rng.rand(100, 3)
        p = tmp_path / "a.pcd"
        write_pcd(p, pts, colors)
        cloud = read_pcd(p)
        np.testing.assert_allclose(cloud.points, pts, atol=1e-4)
        np.testing.assert_allclose(cloud.colors, colors, atol=1 / 255.0)

    def test_pcd_ascii_roundtrip(self, rng, tmp_path):
        pts = rng.rand(50, 3)
        p = tmp_path / "b.pcd"
        write_pcd(p, pts, binary=False)
        cloud = read_pcd(p)
        assert cloud.colors is None
        np.testing.assert_allclose(cloud.points, pts, atol=1e-5)

    def test_labels_roundtrip(self, rng, tmp_path):
        labels = rng.randint(0, 9, 200)
        p = tmp_path / "a.labels"
        write_labels(p, labels)
        np.testing.assert_array_equal(load_labels(p), labels)

    def test_semantic3d_txt_and_pts(self, rng, tmp_path):
        txt = tmp_path / "scene.txt"
        rows = ["1.0 2.0 3.0 100 255 0 128", "4.0 5.0 6.0 -50 0 255 64"]
        txt.write_text("\n".join(rows) + "\n")
        cloud = read_semantic3d_txt(txt)
        np.testing.assert_allclose(cloud.points, [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(cloud.colors[0], [1.0, 0.0, 128 / 255])
        pts_file = tmp_path / "scene.pts"
        write_pts(pts_file, cloud)
        again = read_pts(pts_file)
        np.testing.assert_allclose(again.points, cloud.points)
        np.testing.assert_allclose(again.intensity, cloud.intensity)


class TestVoxel:
    def test_known_grid(self):
        pts = np.array(
            [[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]], dtype=np.float64
        )
        ds, _, inverse, counts = voxel_downsample_with_trace(pts, 0.1)
        assert len(ds) == 2
        assert counts.sum() == 3
        # two near points share a voxel -> mean position
        two = ds[counts == 2][0]
        np.testing.assert_allclose(two, [0.005, 0, 0], atol=1e-9)

    def test_majority_labels_and_tie_to_smallest(self):
        # voxel 0: labels [2, 2, 5] -> 2; voxel 1: [3, 7] tie -> 3 (bincount)
        inverse = np.array([0, 0, 0, 1, 1])
        labels = np.array([2, 5, 2, 7, 3])
        out = majority_vote_labels(inverse, labels, 2)
        np.testing.assert_array_equal(out, [2, 3])

    def test_trace_indices_valid(self, rng):
        pts = rng.rand(500, 3)
        colors = rng.rand(500, 3)
        ds, dsc, inverse, counts = voxel_downsample_with_trace(pts, 0.25, colors)
        assert inverse.shape == (500,)
        assert counts.sum() == 500
        assert (inverse < len(ds)).all()
        # per-voxel mean of traced points == output point
        v = int(np.argmax(counts))
        np.testing.assert_allclose(ds[v], pts[inverse == v].mean(0), atol=1e-12)
        np.testing.assert_allclose(dsc[v], colors[inverse == v].mean(0), atol=1e-12)

    def test_matches_reference_downsample_flow(self, rng):
        # downsample.py:29-64: drop label 0, voxelize at 0.05, majority label.
        pts = rng.rand(300, 3)
        labels = rng.randint(0, 9, 300)
        keep = labels != 0
        ds, _, inverse, counts = voxel_downsample_with_trace(pts[keep], 0.05)
        maj = majority_vote_labels(inverse, labels[keep], len(ds))
        assert (maj != 0).all()
        assert len(maj) == len(ds)


def _make_scene(tmp_path, rng, name, n=2000):
    pts = rng.rand(n, 3) * [20, 20, 5]
    colors = rng.rand(n, 3)
    labels = rng.randint(0, 9, n)
    write_pcd(tmp_path / f"{name}.pcd", pts, colors)
    write_labels(tmp_path / f"{name}.labels", labels)
    return pts, colors, labels


class TestSemanticFileData:
    def test_sample_shapes_and_center(self, rng, tmp_path):
        _make_scene(tmp_path, rng, "scene")
        fd = SemanticFileData(
            str(tmp_path / "scene"),
            has_label=True,
            use_color=True,
            box_size_x=10,
            box_size_y=10,
            rng=np.random.RandomState(0),
        )
        centered, raw, labels, colors = fd.sample(512)
        assert centered.shape == (512, 3) and raw.shape == (512, 3)
        assert labels.shape == (512,) and colors.shape == (512, 3)
        # center_box: min z == 0, x/y centered on box (semantic_dataset.py:109-121)
        assert centered[:, 2].min() == pytest.approx(0.0, abs=1e-9)
        assert abs(centered[:, 0].min() + 5.0) < 1e-9

    def test_x_sorted_storage(self, rng, tmp_path):
        _make_scene(tmp_path, rng, "scene2")
        fd = SemanticFileData(
            str(tmp_path / "scene2"), True, True, 10, 10,
            rng=np.random.RandomState(0),
        )
        assert (np.diff(fd.points[:, 0]) >= 0).all()

    def test_upsample_when_too_few_points(self, rng, tmp_path):
        pts = rng.rand(50, 3)
        write_pcd(tmp_path / "tiny.pcd", pts, rng.rand(50, 3))
        write_labels(tmp_path / "tiny.labels", rng.randint(0, 9, 50))
        fd = SemanticFileData(
            str(tmp_path / "tiny"), True, True, 100, 100,
            rng=np.random.RandomState(0),
        )
        centered, raw, labels, colors = fd.sample(256)
        assert raw.shape == (256, 3)


class TestSemanticDataset:
    @pytest.fixture
    def dataset(self, rng, tmp_path, monkeypatch):
        import pointnet2_tpu.data.semantic3d as s3d

        names = ["sceneA", "sceneB"]
        for name in names:
            _make_scene(tmp_path, rng, name, n=3000)
        monkeypatch.setitem(s3d.map_name_to_file_prefixes, "train", names)
        return SemanticDataset(
            num_points_per_sample=256,
            split="train",
            use_color=True,
            box_size_x=10,
            box_size_y=10,
            path=str(tmp_path),
            seed=0,
        )

    def test_label_weights_formula(self, dataset):
        # weights = 1 / log(1.2 + freq) (semantic_dataset.py:271-285)
        assert dataset.label_weights.shape == (9,)
        assert (dataset.label_weights > 0).all()
        # rarer labels get larger weights
        hist = np.zeros(9)
        for fd in dataset.list_file_data:
            hist += np.histogram(fd.labels, range(10))[0]
        freq = hist / hist.sum()
        want = 1 / np.log(1.2 + freq)
        np.testing.assert_allclose(dataset.label_weights, want, rtol=1e-5)

    def test_batch_shapes(self, dataset):
        data, labels, weights = dataset.sample_batch_in_all_files(4, augment=True)
        assert data.shape == (4, 256, 6)
        assert labels.shape == (4, 256)
        assert weights.shape == (4, 256)
        assert data.dtype == np.float32

    def test_scene_probas_weighted_by_points(self, dataset):
        np.testing.assert_allclose(dataset.scene_probas.sum(), 1.0)
        assert len(dataset.scene_probas) == 2

    def test_num_batches(self, dataset):
        want = int(dataset.get_total_num_points() / (4 * 256))
        assert dataset.get_num_batches(4) == want


class TestAugment:
    def test_rotation_preserves_norm_and_z(self, rng):
        batch = rng.rand(2, 100, 3).astype(np.float32)
        rot = augment.rotate_point_cloud(batch, rng=np.random.RandomState(1))
        np.testing.assert_allclose(
            np.linalg.norm(rot[..., :2], axis=-1),
            np.linalg.norm(batch[..., :2], axis=-1),
            rtol=1e-4,
        )
        np.testing.assert_allclose(rot[..., 2], batch[..., 2], rtol=1e-5)

    def test_feature_rotation_keeps_colors(self, rng):
        batch = rng.rand(2, 50, 6).astype(np.float32)
        rot = augment.rotate_feature_point_cloud(
            batch, 3, rng=np.random.RandomState(1)
        )
        np.testing.assert_array_equal(rot[..., 3:6], batch[..., 3:6])
        assert np.abs(rot[..., :3] - batch[..., :3]).max() > 0

    def test_rejects_bad_shapes(self):
        try:
            augment.rotate_point_cloud(np.zeros((2, 10, 4)))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestForeignPcd:
    """Foreign ascii .pcd flavors: denormal packed-rgb bits, split r/g/b."""

    def test_ascii_packed_rgb_denormal_bits_exact(self, tmp_path):
        from pointnet2_tpu.data.io import read_pcd, write_pcd

        # any color with r=0 packs to a float32 DENORMAL bit pattern; the old
        # float64-text round trip could corrupt these
        pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]])
        colors = np.array([[0, 12, 34], [0, 0, 1], [255, 254, 253]]) / 255.0
        path = tmp_path / "denorm.pcd"
        write_pcd(path, pts, colors, binary=False)
        cloud = read_pcd(path)
        got = np.round(cloud.colors * 255).astype(int)
        np.testing.assert_array_equal(got, np.round(colors * 255).astype(int))

    def test_ascii_split_rgb_uint8_fields(self, tmp_path):
        from pointnet2_tpu.data.io import read_pcd

        path = tmp_path / "split.pcd"
        body = "\n".join(
            f"{i * 1.5} {i * 2.5} {i * 3.5} {10 + i} {20 + i} {30 + i}"
            for i in range(4)
        )
        path.write_text(
            "VERSION 0.7\nFIELDS x y z r g b\nSIZE 4 4 4 1 1 1\n"
            "TYPE F F F U U U\nCOUNT 1 1 1 1 1 1\nWIDTH 4\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 4\nDATA ascii\n" + body + "\n"
        )
        cloud = read_pcd(path)
        assert cloud.points.shape == (4, 3)
        np.testing.assert_allclose(cloud.points[1], [1.5, 2.5, 3.5])
        got = np.round(cloud.colors * 255).astype(int)
        np.testing.assert_array_equal(got[0], [10, 20, 30])
        np.testing.assert_array_equal(got[3], [13, 23, 33])

    def test_ascii_uint32_packed_rgb(self, tmp_path):
        from pointnet2_tpu.data.io import read_pcd

        packed = (7 << 16) | (8 << 8) | 9
        path = tmp_path / "u32.pcd"
        path.write_text(
            "VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
            "TYPE F F F U\nCOUNT 1 1 1 1\nWIDTH 1\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 1\nDATA ascii\n"
            f"1 2 3 {packed}\n"
        )
        cloud = read_pcd(path)
        got = np.round(cloud.colors * 255).astype(int)
        np.testing.assert_array_equal(got[0], [7, 8, 9])
