#!/usr/bin/env python3
"""Convert raw Semantic3D .txt clouds to .pcd.

CLI parity with the reference's preprocess.py:23-66 (txt -> pts with integer
intensity + count header -> pcd via Open3D). Here the conversion goes
straight txt -> binary pcd with our own IO — no intermediate .pts file and no
`wc` subprocess — with the same skip-if-done idempotency.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def point_cloud_txt_to_pcd(raw_dir: str, file_prefix: str) -> None:
    from pointnet2_tpu.data.io import read_semantic3d_txt, write_pcd

    txt_file = os.path.join(raw_dir, file_prefix + ".txt")
    pcd_file = os.path.join(raw_dir, file_prefix + ".pcd")
    if os.path.isfile(pcd_file):
        print(f"pcd {pcd_file} exists, skipped")
        return
    if not os.path.isfile(txt_file):
        print(f"txt {txt_file} missing, skipped")
        return
    print(f"[txt->pcd] {txt_file} -> {pcd_file}")
    cloud = read_semantic3d_txt(txt_file)
    write_pcd(pcd_file, cloud.points, cloud.colors)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--raw_dir",
        default=os.path.join(
            os.path.dirname(os.path.realpath(__file__)), "dataset", "semantic_raw"
        ),
    )
    flags = parser.parse_args()

    from pointnet2_tpu.data.semantic3d import all_file_prefixes

    for file_prefix in all_file_prefixes:
        point_cloud_txt_to_pcd(flags.raw_dir, file_prefix)


if __name__ == "__main__":
    main()
