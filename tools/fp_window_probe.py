#!/usr/bin/env python3
"""Calibrated 3-NN window (fp_window): standalone + end-to-end measurement.

Part 1 — standalone op at the FP1 chunk regime (B=8, 8192 dense queries,
1024 FPS centroids, Semantic3D box data): three_nn_pallas vs
three_nn_sliced at the calibrated window (384 required on this regime,
tools/bq_window_calibrate.required_fp_window; 512 = required x ~1.33
margin). Sliced results are asserted bit-identical (certificate + value
comparison) before timing.

Part 2 — end-to-end flagship forward (batch-64 chunk-8, the bench.py
workload): default vs bq_window-only vs bq+fp windows, certificate and
logit bit-equality asserted per configuration.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu import ops
from pointnet2_tpu.config import Config
from pointnet2_tpu.ops.pallas import three_nn_pallas, three_nn_sliced
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time
from pointnet2_tpu.utils.runtime import setup_compilation_cache


def box_cloud(rng, b, n, dim=3):
    x = np.zeros((b, n, dim), np.float32)
    x[..., :3] = rng.rand(b, n, 3) * [8.0, 8.0, 4.9]
    if dim > 3:
        x[..., 3:] = rng.rand(b, n, dim - 3)
    return x


def standalone():
    rng = np.random.RandomState(0)
    b, nq, m = 8, 8192, 1024
    x = jnp.asarray(box_cloud(rng, b, nq))
    _, cent = ops.fps_centroids(x, m)
    cent = jax.block_until_ready(cent)

    wd, wi = jax.tree.map(np.asarray, three_nn_pallas(x, cent))
    for w in (384, 512, 640):
        gd, gi, ok = jax.tree.map(np.asarray, three_nn_sliced(x, cent, w))
        exact = bool(ok) and (gd == wd).all() and (gi == wi).all()
        print(f"w={w}: certificate {bool(ok)}, bit-identical {exact}")
        if not exact:
            continue
        tf_ = slope_time(lambda c: three_nn_pallas(c, cent)[0], x, K0=2, K1=12)
        ts = slope_time(
            lambda c: three_nn_sliced(c, cent, w)[0], x, K0=2, K1=12
        )
        print(
            f"  three_nn full {tf_*1e3:6.3f} ms  sliced {ts*1e3:6.3f} ms  "
            f"speedup {tf_/ts:.3f}x"
        )


def e2e():
    cfg = Config()
    rng = np.random.RandomState(1)
    b = 64
    x = jnp.asarray(box_cloud(rng, b, cfg.num_point, cfg.point_dim))
    base = Trainer(cfg=cfg)
    state = base.init_state(jax.random.PRNGKey(0))
    la = np.asarray(base._infer_logits(state, x))

    configs = [
        ("bq3072", dict(bq_window=3072)),
        ("bq3072+fp512", dict(bq_window=3072, fp_window=512)),
    ]
    tb = slope_time(lambda c: base._infer_logits(state, c), x, K0=2, K1=8)
    print(f"default: {tb*1e3:7.2f} ms ({b*cfg.num_point/tb/1e6:.2f} M pts/s)")
    for name, kw in configs:
        tr = Trainer(cfg=cfg, **kw)
        ok = tr.check_bq_window(state, x)
        exact = (np.asarray(tr._infer_logits(state, x)) == la).all()
        print(f"[{name}] certificate {ok}, logits bit-identical {exact}")
        if not (ok and exact):
            print(f"[{name}] SKIPPING timing")
            continue
        tw = slope_time(lambda c: tr._infer_logits(state, c), x, K0=2, K1=8)
        print(
            f"[{name}] {tw*1e3:7.2f} ms ({b*cfg.num_point/tw/1e6:.2f} M "
            f"pts/s)  vs default {tb/tw:.3f}x"
        )


def main():
    setup_compilation_cache()
    print("== standalone three_nn, FP1 chunk regime ==")
    standalone()
    print("\n== end-to-end flagship forward, batch 64 ==")
    e2e()


if __name__ == "__main__":
    main()
