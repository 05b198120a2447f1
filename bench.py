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

try:
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jnp = None

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
    x = jnp.asarray(
        rng.randn(batch_size, cfg.num_point, cfg.point_dim), jnp.float32
    )

    # Honest device timing: K data-dependent forward passes chained through
    # lax.optimization_barrier inside one jit, so per-dispatch overhead and
    # any service-side memoization of identical dispatches can't flatter the
    # number.
    K = 5
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def chained(x):
        def body(c, _):
            logits = trainer.model.apply(variables, c, train=False, bn_momentum=0.9)
            # Epsilon-scaled dependency: forces each forward to execute
            # without changing the input by even 1 ulp.
            c = c + logits.sum().astype(jnp.float32) * jnp.float32(1e-38)
            return c, ()

        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    chained(x).block_until_ready()  # compile + warm up
    times = []
    for _ in range(5):
        s = time.time()
        chained(x).block_until_ready()
        times.append(time.time() - s)
    batch_time = float(np.median(times)) / K
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
