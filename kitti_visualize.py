#!/usr/bin/env python3
"""Render KITTI Velodyne frames (headless PNG playback).

Parity with the reference's kitti_visualize.py:6-41 (interactive Open3D
playback) adapted for a headless environment: renders each frame of a drive
to a PNG sequence.
"""

from __future__ import annotations

import argparse
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--kitti_root", required=True)
    parser.add_argument("--dates", nargs="+", default=["2011_09_26"])
    parser.add_argument("--drives", nargs="+", default=["0095"])
    parser.add_argument("--out_dir", default="result/kitti_frames")
    parser.add_argument("--max_frames", type=int, default=10)
    flags = parser.parse_args()

    from pointnet2_tpu.data.kitti import iter_velodyne_frames

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(flags.out_dir, exist_ok=True)
    for date in flags.dates:
        for drive in flags.drives:
            for i, scan in enumerate(iter_velodyne_frames(flags.kitti_root, date, drive)):
                if i >= flags.max_frames:
                    break
                pts = scan[:, :3]
                fig, ax = plt.subplots(figsize=(10, 10))
                ax.scatter(pts[:, 0], pts[:, 1], s=0.05, c=pts[:, 2], cmap="viridis")
                ax.set_aspect("equal")
                ax.set_title(f"{date}/{drive} frame {i} ({len(pts)} pts)")
                out = os.path.join(flags.out_dir, f"{date}_{drive}_{i:04d}.png")
                fig.savefig(out, dpi=100, bbox_inches="tight")
                plt.close(fig)
                print("wrote", out)


if __name__ == "__main__":
    main()
