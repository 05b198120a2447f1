#!/usr/bin/env python3
"""Probe: per-level calibrated windows + fused gather at the SA2-4 shapes.

Round-4 verdict item 4: the fused windowed grouping (project_group_sliced,
ops/pallas/wingather.py) shipped for SA1 only — with one shared bq_window
(3072) the coarse levels' clouds (1024/256/64) statically disengage and run
the exact full ball query + XLA take_along_axis gather. Per-level windows
(round 5: PointNet2SemSeg.bq_window as a 4-tuple) let each level engage a
width sized to ITS cloud. This probe answers, per level and on hardware:

1. what window the box-regime data actually requires (ops/calibrate.py's
   required_bq_window on real FPS centroids — NOT a guess);
2. whether the fused project+query+gather beats the exact
   ball_query_pallas + XLA gather chain at that width (slope-timed);
3. whether the end-to-end eval forward (batch 64, chunk 8) improves with
   the per-level tuple vs the shipped scalar 3072.

Level shape refresher (Config defaults, semantic.json parity):
  SA1: 8192 -> 1024, r=0.5, k=32, f0=32   (the shipped wingather win)
  SA2: 1024 ->  256, r=1.0, k=32, f0=64
  SA3:  256 ->   64, r=2.0, k=32, f0=128
  SA4:   64 ->   16, r=4.0, k=32, f0=256

Geometry intuition for why SA2+ may NOT pay: each level's query tile holds
128 sorted queries — at SA2 that is HALF of all 256 queries, so the tile's
x-span covers ~half the cloud before adding 2*radius; the sweep-reduction
lever shrinks as levels coarsen while the sort/slice preamble stays. The
gather-fusion lever (block DMA vs per-row lookups) is independent of that,
but the grouped tensor shrinks 8x per level too.

MEASURED VERDICT (round 5, hardware, box-regime data): NEGATIVE for the
flagship shapes. SA3/SA4 cannot engage (required window == cloud size);
SA2 engages at w=768/1024 and wins standalone (exact 0.372 ms vs fused
0.329 ms, 1.13x at the B=8 chunk regime) but loses end-to-end (batch-64
eval forward 49.2 -> 49.6 ms with bq_window=(3072,768,None,None)): the
pooled-output un-permute + qperm gathers cost more than the fused gather
saves at a 1024-point cloud. The per-level plumbing ships anyway (other
data regimes have wider coarse clouds); rerun this probe there.

Usage: python tools/sa_window_probe.py [--b 8] [--e2e]
Reference: tf_ops/tf_grouping.cu:45-90 (group_point kernel).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu import ops
from pointnet2_tpu.config import Config
from pointnet2_tpu.ops.calibrate import required_bq_window
from pointnet2_tpu.ops.pallas import ball_query_pallas
from pointnet2_tpu.ops.pallas.wingather import project_group_sliced
from pointnet2_tpu.utils.bench import slope_time
from pointnet2_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()

_LANES = 128

F0 = {1: 32, 2: 64, 3: 128, 4: 256}  # SA level -> first MLP width


def box_cloud(rng, b, n):
    x = np.zeros((b, n, 3), np.float32)
    x[..., :] = rng.rand(b, n, 3) * [8.0, 8.0, 4.9]
    return x


def probe_level(level, cloud, spec, b, rng):
    """Measure exact vs fused-windowed grouping at one SA level's shape."""
    n = cloud.shape[1]
    m, radius, k = spec.npoint, spec.radius, spec.nsample
    f0 = F0[level]
    # inputs = concat(xyz, previous level's features): SA1 raw 6ch,
    # SA2 3+64, SA3 3+128, SA4 3+256 (SA_MLPS last entries)
    cin = 6 if level == 1 else 3 + {2: 64, 3: 128, 4: 256}[level]

    fps = jax.jit(ops.fps_centroids, static_argnums=1)
    _, centroids = fps(jnp.asarray(cloud), m)
    centroids = np.asarray(centroids)

    need = required_bq_window(cloud, centroids, radius)
    need_aligned = int(np.ceil(need / _LANES) * _LANES)
    print(f"SA{level}: cloud {n} -> {m} queries, r={radius}, k={k}, "
          f"f0={f0}; required window {need} (aligned {need_aligned} of {n})")
    if need_aligned >= n:
        print(f"  -> NO width below the cloud certifies; windowing cannot "
              f"engage at SA{level} on this data. Skipping.")
        return None

    inputs = jnp.asarray(rng.rand(b, n, cin), jnp.float32)
    w0 = jnp.asarray(rng.randn(cin, f0) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(f0) * 0.1, jnp.float32)
    xyz = jnp.asarray(cloud)
    new_xyz = jnp.asarray(centroids)

    @jax.jit
    def exact_chain(inp):
        idx, _ = ball_query_pallas(xyz, new_xyz, radius, k)
        zp = inp @ w0 + b0
        flat = idx.reshape(b, m * k)
        g = jnp.take_along_axis(zp, flat[..., None], axis=1)
        return g.reshape(b, m, k, f0).sum()

    t_exact = slope_time(exact_chain, inputs, K0=8, K1=72, reps=5)
    print(f"  exact bq + XLA gather:        {t_exact * 1e3:8.3f} ms")

    results = {"exact": t_exact}
    w = need_aligned
    while w < n:
        fused = jax.jit(
            lambda inp, w=w: project_group_sliced(
                inp, w0, b0, xyz, new_xyz, radius, k, w
            )[0].sum()
        )
        # correctness first: certificate + bit-equality vs the exact chain
        g_s, idx_s, cnt_s, qperm, inv_q, okc = jax.jit(
            project_group_sliced, static_argnums=(5, 6, 7)
        )(inputs, w0, b0, xyz, new_xyz, radius, k, w)
        assert bool(okc), f"window {w} failed its own certificate"
        idx_ref, _ = ball_query_pallas(xyz, new_xyz, radius, k)
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_ref))
        if inv_q is not None:
            g_unperm = jnp.take_along_axis(
                g_s, inv_q[..., None, None], axis=1
            )
        else:
            g_unperm = g_s
        zp = inputs @ w0 + b0
        want = jnp.take_along_axis(
            zp, idx_ref.reshape(b, m * k)[..., None], axis=1
        ).reshape(b, m, k, f0)
        np.testing.assert_array_equal(np.asarray(g_unperm), np.asarray(want))

        t = slope_time(fused, inputs, K0=8, K1=72, reps=5)
        print(f"  fused windowed (w={w:5d}):     {t * 1e3:8.3f} ms  "
              f"({t_exact / t:4.2f}x)")
        results[w] = t
        w += _LANES * max(1, (n // _LANES) // 4)
    return results


def e2e(b_total, rng, windows):
    from pointnet2_tpu.train.trainer import Trainer

    cfg = Config()
    for name, bq in windows:
        tr = Trainer(cfg=cfg, bq_window=bq)
        state = tr.init_state(jax.random.PRNGKey(0))
        pts = np.zeros((b_total, cfg.num_point, 6), np.float32)
        pts[..., :3] = rng.rand(b_total, cfg.num_point, 3) * [8.0, 8.0, 4.9]
        pts[..., 3:] = rng.rand(b_total, cfg.num_point, 3)
        pts = jnp.asarray(pts)
        assert tr.check_bq_window(state, pts), f"{name}: certificate failed"

        def fwd(c):
            return tr.infer_model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                c, train=False, bn_momentum=0.9,
            ).sum()

        # chunked like the production predict path
        def chunked(c):
            from jax import lax
            chunks = c.reshape(-1, tr.infer_chunk, *c.shape[1:])
            return lax.map(fwd, chunks).sum()

        t = slope_time(chunked, pts, K0=2, K1=6)
        rate = b_total * cfg.num_point / t / 1e6
        print(f"e2e eval fwd B={b_total} [{name}]: {t * 1e3:7.1f} ms  "
              f"({rate:5.2f} M pts/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--levels", default="2,3")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    cfg = Config()
    b = args.b

    if not args.e2e:
        cloud = box_cloud(rng, b, cfg.num_point)
        clouds = [cloud]
        fps = jax.jit(ops.fps_centroids, static_argnums=1)
        for spec in cfg.sa_layers:
            _, c = fps(jnp.asarray(clouds[-1]), spec.npoint)
            clouds.append(np.asarray(c))
        for lv in [int(s) for s in args.levels.split(",")]:
            probe_level(lv, clouds[lv - 1], cfg.sa_layers[lv - 1], b, rng)
    else:
        e2e(64, rng, [
            ("scalar 3072", 3072),
            ("per-level", (3072, 768, None, None)),
        ])


if __name__ == "__main__":
    main()
