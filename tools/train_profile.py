#!/usr/bin/env python3
"""Per-op profile of the TRAIN step (fwd+bwd+Adam) on real hardware.

Where does the backward's time go? The forward is profiled by benchmark.py
(tpu-profile.txt); this tool traces `Trainer.train_step` at the flagship
train shape and writes the same per-op table, so backward-pass hotspots
(gather transposes / scatter-adds, BN backward) are visible.

Usage: python tools/train_profile.py [--batch 16] [--accum 1]
       [--bq_window W] [--fp_window W] [--train_dtype bfloat16]

Points are drawn in the Semantic3D box regime (8 x 8 x 4.9 m uniform) so
the calibrated-window paths are representative; their exactness
certificate is asserted before tracing (window args require it).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils import xplane
from pointnet2_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--trace_dir", default="result/jax-trace-train")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--bq_window", type=int, default=None)
    ap.add_argument("--fp_window", type=int, default=None)
    ap.add_argument("--train_dtype", default="float32")
    ap.add_argument("--bf16_min_width", type=int, default=None)
    ap.add_argument("--hoist", type=int, choices=[0, 1], default=1)
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    cfg = Config(batch_size=args.batch)
    trainer = Trainer(
        cfg=cfg, accum_steps=args.accum, bq_window=args.bq_window,
        fp_window=args.fp_window, train_dtype=args.train_dtype,
        bf16_min_width=args.bf16_min_width,
        hoist_geometry=bool(args.hoist),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = args.batch

    def batch(i):
        r = np.random.RandomState(i)
        x = np.zeros((B, cfg.num_point, cfg.point_dim), np.float32)
        x[..., :3] = r.rand(B, cfg.num_point, 3) * [8.0, 8.0, 4.9]
        x[..., 3:] = r.rand(B, cfg.num_point, cfg.point_dim - 3)
        return {
            "points": jnp.asarray(x),
            "labels": jnp.asarray(
                rng.randint(1, 9, (B, cfg.num_point)), jnp.int32
            ),
            "weights": jnp.ones((B, cfg.num_point), jnp.float32),
        }

    drng = jax.random.PRNGKey(0)
    if args.bq_window is not None or args.fp_window is not None:
        assert trainer.check_bq_window(state, batch(0)["points"]), (
            "window does not fit this data regime"
        )
    # warm up (compile) outside the trace
    state, m = trainer.train_step(state, batch(0), drng)
    float(m["loss"])

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(1, 1 + args.steps):
            state, m = trainer.train_step(state, batch(i), drng)
        float(m["loss"])

    report_path = os.path.join(args.trace_dir, "train-profile.txt")
    rows = xplane.write_op_report(args.trace_dir, report_path)
    print(f"Per-op profile ({len(rows)} ops) written to {report_path}")
    sys.stdout.write(xplane.format_report(rows, top=30, title="train top ops"))


if __name__ == "__main__":
    main()
