#!/usr/bin/env python3
"""Headline TRAIN-step benchmark: one JSON line, mechanically auditable.

The forward headline lives in bench.py / BENCH_r*.json; this is its
train-step sibling (round-4 verdict item 7): the FULL production train
step (forward + weighted CE + backward + Adam update + BN stats + device
confusion matrix — Trainer._train_step) at the reference's training batch
(16 x 8192, semantic.json:8), timed with the canonical K-slope method and
divided by the MEASURED same-chip train baseline
(BASELINE_MEASURED.json["train_step_points_per_sec"], the reference's
exact math/data-flow chain fwd+bwd+Adam — tools/baseline_measure.py).

The timed configuration is the shipped production default
(train.py --accum_steps 4 --bq_window 3072 [--train_dtype ...]): before
timing, the calibrated-window exactness certificate is PROVEN on the
benchmarked data (check_bq_window) — the headline never times an
unverified fast path. Config fields are embedded in the JSON so the
artifact is self-describing.

Usage: python tools/train_bench.py [--train_dtype float32|bfloat16]
       [--bf16_min_width W] [--accum 4] [--bq_window 3072] [--hoist 1]
       [--out TRAINBENCH_r5.json]
Defaults are the measured-best quality-neutral configuration
(PERFORMANCE.md "Round 5: geometry hoisting").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FALLBACK_TRAIN_BASELINE_PPS = 640_960.1  # BASELINE_MEASURED.json round-2 value


def _train_baseline_pps() -> float:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    try:
        with open(path) as f:
            return float(json.load(f)["train_step_points_per_sec"])
    except (OSError, KeyError, ValueError):
        return FALLBACK_TRAIN_BASELINE_PPS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ssg", choices=["ssg", "msg"],
                    help="model architecture (Trainer.arch)")
    ap.add_argument("--train_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--bf16_min_width", type=int, default=None)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--bq_window", type=int, default=3072)
    ap.add_argument("--hoist", type=int, choices=[0, 1], default=1)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None,
                    help="also write the JSON line to this file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.bench import slope_time
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    cfg = Config()
    B = args.batch
    trainer = Trainer(
        cfg=cfg,
        arch=args.arch,
        accum_steps=args.accum,
        bq_window=args.bq_window,
        train_dtype=args.train_dtype,
        bf16_min_width=args.bf16_min_width,
        hoist_geometry=bool(args.hoist),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    # Semantic3D box-regime data (see bench.py): the calibrated window's
    # exactness certificate requires representative geometry.
    rng = np.random.RandomState(0)
    x = np.zeros((B, cfg.num_point, cfg.point_dim), np.float32)
    x[..., :3] = rng.rand(B, cfg.num_point, 3) * [8.0, 8.0, 4.9]
    x[..., 3:] = rng.rand(B, cfg.num_point, cfg.point_dim - 3)
    x = jnp.asarray(x)
    labels = jnp.asarray(rng.randint(1, 9, (B, cfg.num_point)), jnp.int32)
    weights = jnp.ones((B, cfg.num_point), jnp.float32)

    certified = True
    if args.bq_window is not None:
        certified = bool(trainer.check_bq_window(state, x))
        assert certified, (
            f"bq_window={args.bq_window} certificate failed on the "
            "benchmark data — refusing to time an unverified fast path"
        )

    drng = jax.random.PRNGKey(0)

    def step(c):
        batch = {"points": c, "labels": labels, "weights": weights}
        new_state, metrics = trainer._train_step(state, batch, drng)
        psum = sum(jnp.sum(l) for l in jax.tree.leaves(new_state.params))
        return psum + metrics["loss"]

    step_time = slope_time(step, x, K0=2, K1=6)
    pps = B * cfg.num_point / step_time
    line = json.dumps(
        {
            "metric": f"pointnet2_{args.arch}_train_step_points_per_sec",
            "value": round(pps, 1),
            "unit": "points/sec/chip",
            "vs_baseline": round(pps / _train_baseline_pps(), 3),
            "ms_per_step": round(step_time * 1e3, 2),
            "config": {
                "arch": args.arch,
                "batch": B,
                "num_point": cfg.num_point,
                "accum_steps": args.accum,
                "bq_window": args.bq_window,
                "fp_window": None,
                "train_dtype": args.train_dtype,
                "bf16_min_width": args.bf16_min_width,
                # Trainer forces this off for msg; record the effective value.
                "hoist_geometry": trainer.hoist_geometry,
                "window_certified": certified,
            },
        }
    )
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
