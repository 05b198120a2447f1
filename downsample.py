#!/usr/bin/env python3
"""Voxel-downsample raw Semantic3D scenes with majority-vote labels.

CLI parity with the reference's downsample.py: drops label-0 points, voxel
grid at 0.05 m with per-voxel source traces, majority label per voxel
(bincount argmax), writes dataset/semantic_downsampled/ (downsample.py:8-98).
Open3D's voxel_down_sample_and_trace is replaced by the vectorized hash grid
in pointnet2_tpu/data/voxel.py.
"""

from __future__ import annotations

import argparse
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def down_sample(
    dense_pcd_path: str,
    dense_label_path: str,
    sparse_pcd_path: str,
    sparse_label_path: str,
    voxel_size: float,
) -> None:
    from pointnet2_tpu.data.io import load_labels, read_pcd, write_labels, write_pcd
    from pointnet2_tpu.data.voxel import (
        majority_vote_labels,
        voxel_downsample_with_trace,
    )

    # Skip-if-done (downsample.py:12-18)
    if os.path.isfile(sparse_pcd_path) and (
        not os.path.isfile(dense_label_path) or os.path.isfile(sparse_label_path)
    ):
        print("Skipped:", dense_pcd_path)
        return
    print("Processing:", dense_pcd_path)

    cloud = read_pcd(dense_pcd_path)
    try:
        dense_labels = load_labels(dense_label_path)
    except OSError:
        dense_labels = None

    points = cloud.points
    colors = cloud.colors
    print("Num points:", len(points))
    if dense_labels is not None:
        keep = dense_labels != 0
        points = points[keep]
        if colors is not None:
            colors = colors[keep]
        dense_labels = dense_labels[keep]
        print("Num points after 0-skip:", len(points))

    ds_points, ds_colors, inverse, counts = voxel_downsample_with_trace(
        points, voxel_size, colors
    )
    print("Num points after down sampling:", len(ds_points))
    write_pcd(sparse_pcd_path, ds_points, ds_colors)
    print("Point cloud written to:", sparse_pcd_path)

    if dense_labels is not None:
        sparse_labels = majority_vote_labels(inverse, dense_labels, len(ds_points))
        write_labels(sparse_label_path, sparse_labels)
        print("Labels written to:", sparse_label_path)


def main() -> None:
    parser = argparse.ArgumentParser()
    current_dir = os.path.dirname(os.path.realpath(__file__))
    parser.add_argument("--voxel_size", type=float, default=0.05)
    parser.add_argument(
        "--raw_dir", default=os.path.join(current_dir, "dataset", "semantic_raw")
    )
    parser.add_argument(
        "--downsampled_dir",
        default=os.path.join(current_dir, "dataset", "semantic_downsampled"),
    )
    flags = parser.parse_args()

    from pointnet2_tpu.data.semantic3d import all_file_prefixes

    os.makedirs(flags.downsampled_dir, exist_ok=True)
    for file_prefix in all_file_prefixes:
        down_sample(
            os.path.join(flags.raw_dir, file_prefix + ".pcd"),
            os.path.join(flags.raw_dir, file_prefix + ".labels"),
            os.path.join(flags.downsampled_dir, file_prefix + ".pcd"),
            os.path.join(flags.downsampled_dir, file_prefix + ".labels"),
            flags.voxel_size,
        )


if __name__ == "__main__":
    main()
