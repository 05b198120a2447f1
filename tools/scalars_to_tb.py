#!/usr/bin/env python3
"""Convert a run's scalars.jsonl into TensorBoard event files.

Usage: python tools/scalars_to_tb.py --logdir log/semantic [--out log/semantic/tb]
Then:  tensorboard --logdir log/semantic/tb

One run directory per tag (train/validation), matching the reference's
per-split FileWriters (/root/reference/train.py:400-407).
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

from pointnet2_tpu.utils.logging import export_tensorboard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True, help="dir containing scalars.jsonl")
    ap.add_argument("--out", default=None, help="output dir (default <logdir>/tb)")
    args = ap.parse_args()
    runs = export_tensorboard(args.logdir, args.out)
    for r in runs:
        print("wrote", r)


if __name__ == "__main__":
    main()
