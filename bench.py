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

    # Honest device timing. Hazards on a tunneled TPU, all defeated here:
    # per-dispatch sync ~26ms -> chain K forwards in one jit via an
    # epsilon-scaled dependency; block_until_ready can return early on this
    # backend -> force completion with a scalar float() readback; identical
    # dispatches can be served from a cache -> distinct input per rep. The
    # per-forward cost is the K-slope, which cancels the constant readback
    # and dispatch overhead.
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def chained(k):
        @jax.jit
        def fn(x):
            def body(c, _):
                logits = trainer.model.apply(
                    variables, c, train=False, bn_momentum=0.9
                )
                c = c + logits.sum().astype(jnp.float32) * jnp.float32(1e-38)
                return c, ()

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c.sum()

        return fn

    K0, K1 = 2, 12
    loop0, loop1 = chained(K0), chained(K1)
    float(loop0(x))
    float(loop1(x))  # compile + warm
    t0s, t1s = [], []
    for i in range(3):
        xi = x + jnp.float32(i + 1) * 1e-7
        s = time.time()
        float(loop0(xi))
        t0s.append(time.time() - s)
        s = time.time()
        float(loop1(xi))
        t1s.append(time.time() - s)
    batch_time = (float(np.median(t1s)) - float(np.median(t0s))) / (K1 - K0)
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
