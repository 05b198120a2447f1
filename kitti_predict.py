#!/usr/bin/env python3
"""KITTI streaming inference: fused predict + densify per Velodyne frame.

CLI parity with the reference's kitti_predict.py: loads a drive, crops each
frame near the origin, runs the no-color model on one fixed-size sample, then
densifies labels to the full cropped frame — and reports a per-stage timer
with FPS (kitti_predict.py:107-227). --render writes a colorized PNG per
frame (headless playback sequence; the reference shows a live Open3D window,
kitti_predict.py:151-204).

The reference fuses model + argmax + InterpolateLabelWithColor into one TF
graph (one sess.run, :30-104). Here both stages are jitted on TPU: the
predict step and the device brute-force KNN densifier run back-to-back
without leaving HBM (frames are ~10^5 points, well within brute-force range);
--save writes dense .pcd/.labels like the reference. Headless: rendering is
delegated to visualize.py on the saved outputs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    np.random.seed(0)
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="", required=True, help="Checkpoint dir")
    parser.add_argument("--save", action="store_true", default=False)
    parser.add_argument(
        "--render",
        action="store_true",
        default=False,
        help="write a colorized PNG per frame to result/frames/ (the headless "
        "equivalent of the reference's live visualizer, kitti_predict.py:151-204)",
    )
    parser.add_argument(
        "--arch",
        default="ssg",
        choices=["ssg", "msg"],
        help="model architecture — must match the checkpoint's "
        "(train.py --arch)",
    )
    parser.add_argument("--kitti_root", default="", required=True)
    parser.add_argument("--config_file", default="semantic_no_color.json")
    parser.add_argument("--dates", nargs="+", default=["2011_09_26"])
    parser.add_argument("--drives", nargs="+", default=["0095"])

    from pointnet2_tpu.ops.calibrate import parse_window_arg as window_arg

    parser.add_argument(
        "--bq_window",
        type=window_arg,
        default=None,
        help="calibrated ball-query x-window: an int from "
        "tools/bq_window_calibrate.py, or 'auto' to self-calibrate from "
        "frame samples at startup; the exactness certificate is verified "
        "on every frame and the run aborts if the window is too small",
    )
    parser.add_argument(
        "--fp_window",
        type=window_arg,
        default=None,
        help="calibrated 3-NN x-window for the FP decoder levels (int or "
        "'auto'); verified like --bq_window",
    )
    flags = parser.parse_args()

    import jax

    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.io import write_labels, write_pcd
    from pointnet2_tpu.data.kitti import KittiDataset
    from pointnet2_tpu.ops.densify import densify_labels_device
    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint
    from pointnet2_tpu.utils.render import render_cloud_png

    cfg = Config.from_json(flags.config_file)

    sparse_dir = os.path.join("result", "sparse")
    dense_dir = os.path.join("result", "dense")
    frames_dir = os.path.join("result", "frames")
    os.makedirs(sparse_dir, exist_ok=True)
    os.makedirs(dense_dir, exist_ok=True)
    if flags.render:
        os.makedirs(frames_dir, exist_ok=True)

    dataset = KittiDataset(
        num_points_per_sample=cfg.num_point,
        base_dir=flags.kitti_root,
        dates=flags.dates,
        drives=flags.drives,
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
    )

    if flags.bq_window == "auto" or flags.fp_window == "auto":
        from pointnet2_tpu.ops.calibrate import calibrate_model_windows

        crng = np.random.RandomState(0)
        frames = dataset.list_file_data

        def sample_xyz() -> np.ndarray:
            fd = frames[crng.randint(len(frames))]
            centered, _ = fd.get_batch_of_one_z_box_from_origin(
                num_points_per_sample=cfg.num_point
            )
            return centered.astype(np.float32)

        auto_bq, auto_fp = calibrate_model_windows(
            sa_specs=[(s.npoint, s.radius) for s in cfg.sa_layers],
            num_point=cfg.num_point,
            sample_xyz=sample_xyz,
            num_batches=min(8, len(frames)),
        )
        if flags.bq_window == "auto":
            flags.bq_window = auto_bq
        if flags.fp_window == "auto":
            flags.fp_window = auto_fp
        print(
            f"auto window calibration: bq_window={flags.bq_window}, "
            f"fp_window={flags.fp_window} (None = windowing would not "
            "engage; full exact kernels run)"
        )

    trainer = Trainer(
        cfg=cfg,
        num_classes=dataset.num_classes,
        arch=flags.arch,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_checkpoint(os.path.abspath(flags.ckpt), state)
    print("Model restored")

    windows_off = flags.bq_window is None and flags.fp_window is None
    for kitti_file_data in dataset.list_file_data:
        timer = {
            "load_data": 0.0,
            "predict_interpolate": 0.0,
            "visualize": 0.0,
            "write_data": 0.0,
            "total": 0.0,
        }
        global_start = time.time()

        start = time.time()
        centered, raw = kitti_file_data.get_batch_of_one_z_box_from_origin(
            num_points_per_sample=cfg.num_point
        )
        timer["load_data"] += time.time() - start

        start = time.time()
        dense_points = kitti_file_data.points
        # Fused on-device path: model logits -> argmax -> KNN densify without
        # leaving HBM (the reference fused these in one sess.run graph,
        # kitti_predict.py:30-104). Only the final labels/colors transfer.
        if windows_off:
            sparse_labels_dev = trainer.predict_step(
                state, centered.astype(np.float32)
            ).reshape(-1)
        else:
            # Per-frame exactness certificate (free — the windowed kernels
            # compute it regardless): a too-small window silently drops
            # neighbors, so abort on the exact frame that violated it.
            sparse_labels_dev, ok = trainer.predict_step_checked(
                state, centered.astype(np.float32)
            )
            if not bool(ok):
                raise ValueError(
                    f"--bq_window={flags.bq_window} / "
                    f"--fp_window={flags.fp_window} is too small for this "
                    "drive (exactness certificate failed on frame "
                    f"{kitti_file_data.file_path_without_ext}); use 'auto' "
                    "or recalibrate with tools/bq_window_calibrate.py"
                )
            sparse_labels_dev = sparse_labels_dev.reshape(-1)
        dense_labels_dev, dense_colors_dev = densify_labels_device(
            raw.reshape(-1, 3).astype(np.float32),
            sparse_labels_dev,
            dense_points.astype(np.float32),
            knn=3,
        )
        dense_labels = np.asarray(dense_labels_dev)
        dense_colors = np.asarray(dense_colors_dev)
        timer["predict_interpolate"] += time.time() - start

        prefix = os.path.basename(kitti_file_data.file_path_without_ext)
        frame_name = kitti_file_data.file_path_without_ext.replace(os.sep, "_")
        if flags.render:
            start = time.time()
            png = os.path.join(frames_dir, frame_name + ".png")
            render_cloud_png(
                dense_points,
                np.asarray(dense_colors) / 255.0,
                png,
                title=frame_name,
            )
            timer["visualize"] += time.time() - start

        if flags.save:
            start = time.time()
            pcd_path = os.path.join(dense_dir, prefix + ".pcd")
            write_pcd(pcd_path, dense_points, np.asarray(dense_colors) / 255.0)
            print(f"Exported dense_pcd to {pcd_path}")
            labels_path = os.path.join(dense_dir, prefix + ".labels")
            write_labels(labels_path, dense_labels)
            print(f"Exported dense_labels to {labels_path}")
            timer["write_data"] += time.time() - start

        timer["total"] += time.time() - global_start
        fmt = "[{:5.2f} FPS] " + ": {:.04f}, ".join(timer.keys()) + ": {:.04f}"
        print(fmt.format(1.0 / max(timer["total"], 1e-9), *timer.values()))


if __name__ == "__main__":
    main()
