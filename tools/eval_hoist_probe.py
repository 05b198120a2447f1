#!/usr/bin/env python3
"""Probe: hoist eval geometry OUT of the chunked forward — does it pay?

The train step's geometry hoist (PERFORMANCE.md "Round 5: geometry
hoisting") won ~1.2 ms by replacing G quarter-width FPS launches with one
full-width one. The eval forward chunk loop (Trainer.infer_chunk=8,
lax.map over 8 chunks of batch 8) is the analogous structure, with two
differences that make the outcome non-obvious:

1. Chunks are already 8 samples wide = full FPS sublane occupancy, so the
   hoist buys only dispatch/DMA pipelining across the 8 per-level
   launches, not occupancy.
2. The production eval path fuses the SA1 grouping gather into the
   calibrated ball query (ops/pallas/wingather.py, 1.9x the XLA gather).
   A precomputed-geometry forward takes the plain-gather path instead —
   the hoist must first pay back the fused gather's saving.

Measures, at the bench.py flagship workload (batch 64 x 8192, box
regime, f32, bq_window=3072):
  A) production chunked forward (fused windowed SA1 grouping)
  B) hoisted: precompute_geometry at batch 64, lax.map the geometry-fed
     forward over 8 chunks
  C) same as B but windows off in precompute (exact full kernels)

Measured (TPU v5e, round 5): NEGATIVE —
  A production chunked+fused : 49.10 ms  10.68 M pts/s
  B hoisted geometry, window : 57.89 ms   9.06 M pts/s
  C hoisted geometry, exact  : 57.69 ms   9.09 M pts/s
The hoist LOSES ~8.7 ms: chunk-8 FPS is already at full sublane occupancy
(the train-side win came from quarter-width microbatches), so there is
nothing to recover, while the geometry-fed forward both gives up the
fused SA1 wingather AND materializes full-batch grouped-index/geometry
tensors in HBM across the chunk loop (the very working-set growth
infer_chunk exists to avoid). B ~= C confirms the loss is structural, not
the window. The eval path stays chunked + fused. ROADMAP "Performance" 1d.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.models import precompute_geometry
    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.bench import slope_time
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    cfg = Config()
    B, CHUNK = 64, 8
    W = 3072

    rng = np.random.RandomState(0)
    x = np.zeros((B, cfg.num_point, cfg.point_dim), np.float32)
    x[..., :3] = rng.rand(B, cfg.num_point, 3) * [8.0, 8.0, 4.9]
    x[..., 3:] = rng.rand(B, cfg.num_point, cfg.point_dim - 3)
    x = jnp.asarray(x)

    trainer = Trainer(cfg=cfg, bq_window=W)
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert bool(trainer.check_bq_window(state, x)), "window certificate"

    def fwd_production(pts):
        logits = trainer._infer_logits(state, pts)
        return jnp.sum(logits[..., :1])

    def make_hoisted(bq_window):
        model = trainer.model
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def fwd(pts):
            geom, _ = precompute_geometry(
                pts, config=cfg, bq_window=bq_window
            )

            def to_chunks(a):
                return a.reshape(CHUNK, B // CHUNK, *a.shape[1:])

            xs = (to_chunks(pts), jax.tree.map(to_chunks, geom))

            def one(args):
                p, g = args
                return model.apply(
                    variables, p, train=False, bn_momentum=0.9, geometry=g
                )

            logits = jax.lax.map(one, xs)
            return jnp.sum(logits[..., :1])

        return fwd

    t_a = slope_time(fwd_production, x)
    t_b = slope_time(make_hoisted(W), x)
    t_c = slope_time(make_hoisted(None), x)
    pps = lambda t: B * cfg.num_point / t
    print(f"A production chunked+fused : {t_a * 1e3:7.2f} ms  {pps(t_a) / 1e6:.2f} M pts/s")
    print(f"B hoisted geometry, window : {t_b * 1e3:7.2f} ms  {pps(t_b) / 1e6:.2f} M pts/s")
    print(f"C hoisted geometry, exact  : {t_c * 1e3:7.2f} ms  {pps(t_c) / 1e6:.2f} M pts/s")


if __name__ == "__main__":
    main()
