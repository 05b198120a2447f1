#!/usr/bin/env python3
"""Headline benchmark: flagship PointNet++ SSG forward throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: batch 64 x 8192 points x 6 features, full semantic.json model —
the reference benchmark.py's batch-64 inference measurement.

``vs_baseline`` divides by a MEASURED same-chip denominator:
BASELINE_MEASURED.json, produced by tools/baseline_measure.py — the same
forward built the way the reference builds it (plain SA layout, XLA-compiled
dense-distance ops identical in math to the reference's CUDA kernels, f32
matmuls). The CUDA/GPU original cannot run here; PERFORMANCE.md carries the
roofline analysis and MFU. If the file is missing, the estimate used in
round 1 (0.52M pts/s) is the documented fallback.

Timing: K-slope method (see PERFORMANCE.md) — chained forwards in one jit
with an epsilon dependency, scalar float() readbacks, distinct input per rep.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

FALLBACK_REFERENCE_POINTS_PER_SEC = 524_288.0  # round-1 estimate, documented


def _baseline_pps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["value"])
    except (OSError, KeyError, ValueError):
        return FALLBACK_REFERENCE_POINTS_PER_SEC


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    cfg = Config()  # semantic.json defaults: 8192 pts, SSG 1024/256/64/16
    batch_size = 64
    trainer = Trainer(cfg=cfg)  # infer_chunk=8: batch-chunked forward
    state = trainer.init_state(jax.random.PRNGKey(0))

    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(batch_size, cfg.num_point, cfg.point_dim), jnp.float32
    )
    batch_time = slope_time(
        lambda c: trainer._infer_logits(state, c), x, K0=2, K1=12
    )
    points_per_sec = batch_size * cfg.num_point / batch_time

    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_fwd_points_per_sec",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / _baseline_pps(), 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
