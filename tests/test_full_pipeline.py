"""THE reference deliverable, end-to-end through the real CLIs:

    raw .txt -> preprocess.py -> downsample.py -> train.py -> predict.py
             -> interpolate.py -> renamer.py

(/root/reference/README.md:83-151 documents exactly this chain.) Every
stage runs as its actual CLI entry point on synthetic raw scenes, so the
inter-stage file/dir contracts (result/sparse -> interpolate --sparse_dir,
downsampled train data vs raw gt paths, submission renaming) are exercised
as a single pipeline, ending in submission-named dense label files and a
dense validation accuracy above chance.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import pointnet2_tpu.data.semantic3d as s3d
from pointnet2_tpu.config import Config

TRAIN_SCENES = ["pipeA", "pipeB"]
VAL_SCENES = ["pipeV"]
# a REAL test prefix so renamer.py's submission mapping applies
TEST_SCENES = ["marketplacefeldkirch_station4_intensity_rgb"]
ALL_SCENES = TRAIN_SCENES + VAL_SCENES + TEST_SCENES


def _write_raw_txt(path, rng, n=6000, with_labels=True):
    """Synthetic Semantic3D raw scene: 'x y z intensity r g b' rows plus a
    .labels file. Labels follow height (1 below z=2, 5 above) and colors
    correlate strongly with the class (red-ish above, blue-ish below), so
    the few training steps this test affords converge well above chance.
    A sprinkle of label-0 (unlabeled) rows exercises the downsample drop."""
    pts = rng.rand(n, 3) * [20.0, 20.0, 4.0]
    intensity = rng.randint(-100, 100, n)
    hi = pts[:, 2] >= 2.0
    rgb = np.empty((n, 3), np.int64)
    rgb[:, 0] = np.where(hi, 220, 30) + rng.randint(-20, 20, n)
    rgb[:, 1] = rng.randint(0, 60, n)
    rgb[:, 2] = np.where(hi, 30, 220) + rng.randint(-20, 20, n)
    rgb = np.clip(rgb, 0, 255)
    rows = [
        f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {i} {c[0]} {c[1]} {c[2]}"
        for p, i, c in zip(pts, intensity, rgb)
    ]
    with open(path + ".txt", "w") as f:
        f.write("\n".join(rows) + "\n")
    if with_labels:
        labels = np.where(hi, 5, 1).astype(np.int64)
        labels[rng.rand(n) < 0.02] = 0  # unlabeled points, dropped downstream
        np.savetxt(path + ".labels", labels, fmt="%d")
    return pts


def _run_cli(module_name, argv):
    old = sys.argv
    sys.argv = [module_name + ".py"] + argv
    try:
        mod = __import__(module_name)
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    rng = np.random.RandomState(7)
    base = tmp_path_factory.mktemp("pipeline")
    raw = base / "raw"
    down = base / "downsampled"
    raw.mkdir()

    # monkeypatch the split tables for the whole chain (module-scope: every
    # CLI resolves prefixes through pointnet2_tpu.data.semantic3d)
    saved = {
        k: list(v) for k, v in s3d.map_name_to_file_prefixes.items()
    }
    saved_all = list(s3d.all_file_prefixes)
    s3d.map_name_to_file_prefixes["train"] = TRAIN_SCENES
    s3d.map_name_to_file_prefixes["validation"] = VAL_SCENES
    s3d.map_name_to_file_prefixes["test"] = TEST_SCENES
    s3d.map_name_to_file_prefixes["train_full"] = TRAIN_SCENES + VAL_SCENES
    s3d.map_name_to_file_prefixes["all"] = ALL_SCENES
    s3d.all_file_prefixes[:] = ALL_SCENES

    try:
        for name in ALL_SCENES:
            _write_raw_txt(
                str(raw / name), rng,
                with_labels=name not in TEST_SCENES,
            )

        # [1] preprocess: txt -> pcd
        _run_cli("preprocess", ["--raw_dir", str(raw)])
        # [2] downsample: voxel grid + majority labels (label-0 dropped)
        _run_cli(
            "downsample",
            ["--raw_dir", str(raw), "--downsampled_dir", str(down),
             "--voxel_size", "0.4"],
        )

        cfg = Config(
            num_point=128,
            batch_size=8,  # must divide the 8-device test mesh
            max_epoch=3,
            data_path=str(down),
            logdir=str(base / "log"),
            box_size_x=10,
            box_size_y=10,
            l1_npoint=32,
            l2_npoint=16,
            l3_npoint=8,
            l4_npoint=4,
            l1_radius=0.5,
            l2_radius=1.0,
            l3_radius=2.0,
            l4_radius=4.0,
            l1_nsample=8,
            l2_nsample=8,
            l3_nsample=4,
            l4_nsample=4,
        )
        cfg_path = base / "pipeline.json"
        cfg.to_json(cfg_path)

        # [3] train (real CLI: prefetch producers, eval, checkpoints)
        _run_cli("train", ["--config_file", str(cfg_path), "--seed", "0"])
        ckpt = base / "log" / "model_autosave"
        assert ckpt.exists()

        # [4] sparse prediction for validation (mIoU) and test (submission)
        sparse = base / "sparse"
        for split in ("validation", "test"):
            _run_cli(
                "predict",
                ["--ckpt", str(ckpt), "--set", split,
                 "--config_file", str(cfg_path), "--num_samples", "4",
                 "--batch_size", "4", "--output_dir", str(sparse)],
            )

        # [5] densify back onto the RAW clouds
        dense = base / "dense"
        for split in ("validation", "test"):
            _run_cli(
                "interpolate",
                ["--set", split, "--sparse_dir", str(sparse),
                 "--dense_dir", str(dense), "--gt_dir", str(raw),
                 "--engine", "scipy"],
            )

        # [6] submission renaming
        _run_cli("renamer", ["--dense_dir", str(dense)])
        yield {"base": base, "raw": raw, "dense": dense, "cfg": cfg}
    finally:
        for k, v in saved.items():
            s3d.map_name_to_file_prefixes[k] = v
        s3d.all_file_prefixes[:] = saved_all


def test_submission_named_dense_labels(pipeline):
    dense = pipeline["dense"]
    # the test scene's dense labels carry the SUBMISSION name after renaming
    assert (dense / "marketsquarefeldkirch4.labels").exists()
    assert not (dense / (TEST_SCENES[0] + ".labels")).exists()
    labels = np.loadtxt(dense / "marketsquarefeldkirch4.labels", dtype=np.int64)
    raw_pts = np.loadtxt(
        pipeline["raw"] / (TEST_SCENES[0] + ".txt"), usecols=(0, 1, 2)
    )
    assert len(labels) == len(raw_pts)  # one label per RAW dense point


def test_dense_validation_accuracy_above_chance(pipeline):
    from pointnet2_tpu.data.io import load_labels

    dense = pipeline["dense"]
    raw = pipeline["raw"]
    got = load_labels(dense / (VAL_SCENES[0] + ".labels"))
    want = load_labels(raw / (VAL_SCENES[0] + ".labels"))
    assert len(got) == len(want)
    mask = want != 0
    acc = float((got[mask] == want[mask]).mean())
    # two balanced classes: chance = 0.5; the 21-step training must beat it
    assert acc > 0.6, f"dense validation accuracy {acc:.3f} not above chance"


def test_train_artifacts_from_real_cli(pipeline):
    log = pipeline["base"] / "log"
    text = (log / "log_train.txt").read_text()
    assert "EPOCH 002" in text
    assert "eval accuracy" in text
