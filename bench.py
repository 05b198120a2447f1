#!/usr/bin/env python3
"""Headline benchmark: flagship PointNet++ SSG forward throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers in-tree (BASELINE.md); its benchmark.py
measures batch-64 inference wall-clock at runtime. We use the same workload
(batch 64 x 8192 points x 6 features, full semantic.json model) and report
points/sec. ``vs_baseline`` is measured against an estimated reference
throughput of 0.52M points/s (batch-64 inference in ~1.0 s on the original
single-GPU TF1 pipeline, whose FP stages bounce through CPU Open3D kernels —
see SURVEY.md §3.4); the north-star target is >=10x (BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_POINTS_PER_SEC = 524_288.0  # estimated reference: 64*8192 pts / ~1.0 s


def main() -> None:
    import jax

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    cfg = Config()  # semantic.json defaults: 8192 pts, SSG 1024/256/64/16
    batch_size = 64
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x = rng.randn(batch_size, cfg.num_point, cfg.point_dim).astype(np.float32)

    # compile + warm up
    trainer.predict_step(state, x).block_until_ready()
    times = []
    for _ in range(10):
        s = time.time()
        trainer.predict_step(state, x).block_until_ready()
        times.append(time.time() - s)
    batch_time = float(np.median(times))
    points_per_sec = batch_size * cfg.num_point / batch_time

    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_fwd_points_per_sec",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / REFERENCE_POINTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
