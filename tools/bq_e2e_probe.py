#!/usr/bin/env python3
"""End-to-end flagship forward: calibrated ball-query window vs default.

Measures Trainer._infer_logits (batch-64 chunk-8, the bench.py workload) on
the real chip with bq_window unset vs set, on two data regimes:

- gaussian (bench.py's randn clouds): needs a wide window (~4096 of 8192 —
  central columns are dense), so the win bounds from below;
- uniform box (8 x 8 x 4.9 m, the Semantic3D sample regime): calibrated
  window ~3072 (tools/bq_window_calibrate.py).

Asserts the exactness certificate AND logit bit-equality against the
default path before timing — a window that doesn't fit would invalidate
the comparison (and the run).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time
from pointnet2_tpu.utils.runtime import setup_compilation_cache


def run(name, x, window):
    cfg = Config()
    base = Trainer(cfg=cfg)
    wind = Trainer(cfg=cfg, bq_window=window)
    state = base.init_state(jax.random.PRNGKey(0))
    ok = wind.check_bq_window(state, x)
    print(f"[{name}] window={window} certificate ok: {ok}")
    la = np.asarray(base._infer_logits(state, x))
    lb = np.asarray(wind._infer_logits(state, x))
    exact = (la == lb).all()
    print(f"[{name}] logits bit-identical: {exact}")
    if not (ok and exact):
        print(f"[{name}] SKIPPING timing (window does not fit)")
        return
    for rep in range(3):
        tb = slope_time(lambda c: base._infer_logits(state, c), x, K0=2, K1=8)
        tw = slope_time(lambda c: wind._infer_logits(state, c), x, K0=2, K1=8)
        pps_b = x.shape[0] * x.shape[1] / tb
        pps_w = x.shape[0] * x.shape[1] / tw
        print(
            f"[{name}] rep {rep}: default {tb*1e3:7.2f} ms ({pps_b/1e6:.2f} M) "
            f"windowed {tw*1e3:7.2f} ms ({pps_w/1e6:.2f} M)  "
            f"speedup {tb/tw:.3f}x"
        )


def main():
    setup_compilation_cache()
    cfg = Config()
    rng = np.random.RandomState(0)
    b = 64
    xg = jnp.asarray(rng.randn(b, cfg.num_point, cfg.point_dim), jnp.float32)
    xu = np.zeros((b, cfg.num_point, cfg.point_dim), np.float32)
    xu[..., :3] = rng.rand(b, cfg.num_point, 3) * [8.0, 8.0, 4.9]
    xu[..., 3:] = rng.rand(b, cfg.num_point, cfg.point_dim - 3)
    xu = jnp.asarray(xu)
    run("gaussian", xg, 4096)
    run("uniform-box", xu, 3072)


if __name__ == "__main__":
    main()
