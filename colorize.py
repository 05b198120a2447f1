#!/usr/bin/env python3
"""Batch-colorize predicted point clouds by label.

CLI parity with the reference's colorize.py:8-49: pairs <prefix>.pcd with
<prefix>.labels in a results directory and writes <prefix>_colored.pcd using
the 9-color label palette.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", default="result/sparse")
    parser.add_argument("--output_dir", default=None, help="default: input_dir")
    flags = parser.parse_args()
    out_dir = flags.output_dir or flags.input_dir
    os.makedirs(out_dir, exist_ok=True)

    from pointnet2_tpu.data.io import load_labels, read_pcd, write_pcd
    from pointnet2_tpu.utils.colors import colorize_point_cloud

    for pcd_path in sorted(glob.glob(os.path.join(flags.input_dir, "*.pcd"))):
        prefix = os.path.splitext(os.path.basename(pcd_path))[0]
        if prefix.endswith("_colored"):
            continue
        labels_path = os.path.join(flags.input_dir, prefix + ".labels")
        if not os.path.isfile(labels_path):
            print("no labels for", pcd_path)
            continue
        cloud = read_pcd(pcd_path)
        labels = load_labels(labels_path)
        colors = colorize_point_cloud(cloud.points, labels)
        out_path = os.path.join(out_dir, prefix + "_colored.pcd")
        write_pcd(out_path, cloud.points, colors)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
