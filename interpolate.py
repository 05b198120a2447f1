#!/usr/bin/env python3
"""Dense label propagation: sparse predictions -> full raw clouds.

CLI parity with the reference's interpolate.py: for each scene of --set,
loads result/sparse/<scene>.{pcd,labels} plus the raw dense cloud, runs KNN
majority-vote densification (k=3), writes result/dense/<scene>.labels and a
colorized pcd, and prints per-scene + global confusion matrices
(interpolate.py:47-131). The densification engine is the native C++ grid-KNN
(native/densify.cpp) with scipy fallback, replacing Open3D KDTreeFlann.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pprint import pprint


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--set", default="validation", help="train, validation, test")
    parser.add_argument("--sparse_dir", default="result/sparse")
    parser.add_argument("--dense_dir", default="result/dense")
    parser.add_argument("--gt_dir", default="dataset/semantic_raw")
    parser.add_argument("--knn", type=int, default=3)
    parser.add_argument(
        "--engine",
        default="auto",
        choices=["auto", "native", "scipy", "device", "sharded"],
        help="sharded = dense cloud point-sharded over every visible device",
    )
    flags = parser.parse_args()

    from pointnet2_tpu.data.io import load_labels, read_pcd, write_labels, write_pcd
    from pointnet2_tpu.data.semantic3d import map_name_to_file_prefixes
    from pointnet2_tpu.ops.densify import densify_labels
    from pointnet2_tpu.utils.metrics import ConfusionMatrix

    os.makedirs(flags.dense_dir, exist_ok=True)
    cm_global = ConfusionMatrix(9)

    for prefix in map_name_to_file_prefixes[flags.set]:
        print("Interpolating:", prefix, flush=True)
        sparse_cloud = read_pcd(os.path.join(flags.sparse_dir, prefix + ".pcd"))
        sparse_labels = load_labels(os.path.join(flags.sparse_dir, prefix + ".labels"))
        dense_cloud = read_pcd(os.path.join(flags.gt_dir, prefix + ".pcd"))
        try:
            dense_gt = load_labels(os.path.join(flags.gt_dir, prefix + ".labels"))
        except OSError:
            print("dense_gt_labels not found, treat as test set")
            dense_gt = None

        start = time.time()
        dense_labels, dense_colors = densify_labels(
            sparse_cloud.points,
            sparse_labels,
            dense_cloud.points,
            knn=flags.knn,
            engine=flags.engine,
        )
        print(f"KNN interpolation time: {time.time() - start} seconds", flush=True)

        labels_path = os.path.join(flags.dense_dir, prefix + ".labels")
        write_labels(labels_path, dense_labels)
        print("Dense labels written to:", labels_path, flush=True)

        colored_path = os.path.join(flags.dense_dir, prefix + "_colored.pcd")
        write_pcd(colored_path, dense_cloud.points, dense_colors / 255.0)
        print("Dense pcd with color written to:", colored_path, flush=True)

        if dense_gt is not None:
            cm = ConfusionMatrix(9)
            cm.increment_from_list(dense_gt, dense_labels)
            cm.print_metrics()
            cm_global.increment_from_list(dense_gt, dense_labels)

    pprint("Global results")
    cm_global.print_metrics()


if __name__ == "__main__":
    main()
