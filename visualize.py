#!/usr/bin/env python3
"""Inspect a point cloud (+ optional labels): headless-friendly viewer.

Parity goal: the reference's visualize.py opens an interactive Open3D window
(visualize.py:9-42). This environment is headless, so the default mode
renders an orthographic top/front scatter to a PNG with matplotlib (labels
colorized with the same palette); `--stats` prints cloud statistics only.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pcd", required=True, help="path to .pcd")
    parser.add_argument("--labels", default=None, help="optional .labels path")
    parser.add_argument("--out", default=None, help="output PNG (default: <pcd>.png)")
    parser.add_argument("--max_points", type=int, default=200_000)
    parser.add_argument("--stats", action="store_true", help="print stats only")
    parser.add_argument(
        "--html",
        default=None,
        help="also write a standalone INTERACTIVE viewer (drag to orbit, "
        "wheel to zoom) to this HTML path — the headless counterpart of the "
        "reference's Open3D window (visualize.py:9-42)",
    )
    flags = parser.parse_args()

    from pointnet2_tpu.data.io import load_labels, read_pcd
    from pointnet2_tpu.utils.colors import colorize_point_cloud

    cloud = read_pcd(flags.pcd)
    pts = cloud.points
    print(f"{flags.pcd}: {len(pts)} points")
    print("min:", pts.min(0), "max:", pts.max(0))

    colors = cloud.colors
    if flags.labels:
        labels = load_labels(flags.labels)
        colors = colorize_point_cloud(pts, labels)
        counts = np.bincount(labels, minlength=9)
        for c, n in enumerate(counts):
            print(f"label {c}: {n}")
    if flags.stats:
        return

    from pointnet2_tpu.utils.render import render_cloud_png

    out = flags.out or flags.pcd + ".png"
    render_cloud_png(pts, colors, out, max_points=flags.max_points)
    print("wrote", out)

    if flags.html:
        from pointnet2_tpu.utils.html_viewer import write_html_viewer

        write_html_viewer(
            pts, colors, flags.html, title=os.path.basename(flags.pcd)
        )
        print("wrote", flags.html)


if __name__ == "__main__":
    main()
