#!/usr/bin/env python3
"""Multi-epoch training soak through the REAL train.py CLI on synthetic
Semantic3D-shaped scenes.

Fabricates scenes under the real split prefixes (3 train + 2 validation),
runs `train.py --config_file <small-flagship cfg> --max_epoch N` on the TPU
(full pipeline: BatchProducer + device_prefetch + jitted train step + eval
every 5 epochs + best/rolling orbax checkpoints + scalars.jsonl), then
exports TensorBoard event files and prints the final metrics.

Usage: python tools/train_soak.py [--epochs 12] [--out log/soak]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")


def make_scene(prefix, out_dir, rng, n=120_000):
    """Geometry-separable scene containing ALL 8 foreground classes."""
    from pointnet2_tpu.data.io import write_labels, write_pcd

    pts = rng.rand(n, 3) * [30.0, 30.0, 4.0]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    # strata give classes 1/4/6; radial features carve out the rest
    labels = np.where(z < 1.3, 1, np.where(z < 2.6, 4, 6)).astype(np.int32)
    r = np.hypot(x - 15, y - 15)
    labels[r < 5] = 2
    labels[(r >= 5) & (r < 8) & (z > 2)] = 8
    labels[(x < 6) & (z < 1.0)] = 3
    labels[(y < 6) & (z >= 3.2)] = 5
    labels[(x > 24) & (y > 24)] = 7
    # colors correlated with labels + noise so the color path carries signal
    base = np.stack([labels / 8.0, 1.0 - labels / 8.0, 0.5 * np.ones_like(x)], 1)
    colors = np.clip(base + rng.randn(n, 3) * 0.1, 0, 1)
    write_pcd(os.path.join(out_dir, prefix + ".pcd"), pts, colors)
    write_labels(os.path.join(out_dir, prefix + ".labels"), labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default="log/soak")
    ap.add_argument("--points_per_scene", type=int, default=80_000)
    ap.add_argument("--accum_steps", type=int, default=1)
    ap.add_argument("--bq_window", default=None,
                    help="int or 'auto' — forwarded to train.py")
    ap.add_argument("--fp_window", default=None,
                    help="int or 'auto' — forwarded to train.py")
    ap.add_argument("--train_dtype", default=None,
                    help="float32/bfloat16 — forwarded to train.py")
    ap.add_argument("--bf16_min_width", default=None,
                    help="selective bf16 threshold — forwarded to train.py")
    ap.add_argument("--hoist_geometry", default=None,
                    help="0/1 — forwarded to train.py")
    ap.add_argument("--arch", default=None,
                    help="ssg/msg — forwarded to train.py")
    args = ap.parse_args()

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.semantic3d import (
        train_file_prefixes,
        validation_file_prefixes,
    )

    data_dir = tempfile.mkdtemp(prefix="soak_data_")
    rng = np.random.RandomState(0)
    # the dataset loads EVERY prefix of a split (like the reference), so
    # fabricate all of them
    for prefix in train_file_prefixes + validation_file_prefixes:
        make_scene(prefix, data_dir, rng, n=args.points_per_scene)
    print(
        f"fabricated {len(train_file_prefixes)}+{len(validation_file_prefixes)} "
        f"scenes in {data_dir}"
    )

    cfg = Config(
        num_point=2048,
        batch_size=16,
        max_epoch=args.epochs,
        logdir=args.out,
        data_path=data_dir,
        l1_npoint=512,
        l2_npoint=128,
        l3_npoint=32,
        l4_npoint=8,
        decay_step=20000,
    )
    cfg_path = os.path.join(data_dir, "soak.json")
    cfg.to_json(cfg_path)

    sys.argv = ["train.py", "--config_file", cfg_path, "--seed", "0",
                "--accum_steps", str(args.accum_steps)]
    if args.bq_window is not None:
        sys.argv += ["--bq_window", str(args.bq_window)]
    if args.fp_window is not None:
        sys.argv += ["--fp_window", str(args.fp_window)]
    if args.train_dtype is not None:
        sys.argv += ["--train_dtype", str(args.train_dtype)]
    if args.bf16_min_width is not None:
        sys.argv += ["--bf16_min_width", str(args.bf16_min_width)]
    if args.hoist_geometry is not None:
        sys.argv += ["--hoist_geometry", str(args.hoist_geometry)]
    if args.arch is not None:
        sys.argv += ["--arch", str(args.arch)]
    import train

    train.main()

    # export TensorBoard events + summarize
    from pointnet2_tpu.utils.logging import export_tensorboard

    runs = export_tensorboard(args.out)
    print("tensorboard runs:", [str(r) for r in runs])
    records = [
        json.loads(line)
        for line in open(os.path.join(args.out, "scalars.jsonl"))
        if line.strip()
    ]
    train_recs = [r for r in records if r["tag"] == "train"]
    val_recs = [r for r in records if r["tag"] == "validation"]
    print(f"epochs logged: {len(train_recs)}  evals: {len(val_recs)}")
    print(f"first epoch: loss={train_recs[0]['loss']:.3f} "
          f"acc={train_recs[0]['accuracy']:.3f}")
    print(f"last epoch:  loss={train_recs[-1]['loss']:.3f} "
          f"acc={train_recs[-1]['accuracy']:.3f}")
    if val_recs:
        best = max(v["accuracy"] for v in val_recs)
        print(f"best val acc: {best:.3f}  last val mIoU: {val_recs[-1]['miou']:.3f}")
    ckpts = [d for d in os.listdir(args.out) if d.startswith(("best_model", "model"))]
    print("checkpoints:", sorted(ckpts))


if __name__ == "__main__":
    main()
