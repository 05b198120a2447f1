#!/usr/bin/env python3
"""Probe: fused FPS centroid emission vs the separate gather (round 3).

Compares, at every SA level shape of the flagship model:
  v1         — index-only kernel (ops/pallas/fps.py _fps_kernel)
  fused      — v1-style selection + in-loop centroid emission, incl. the
               (B,3,M)->(B,M,3) transpose on the XLA side
  v1+gather  — what the model paid before round 3 for (idx, new_xyz)

Historical record (measured 2026-08-17, this chip): a "v2" variant that
merged all per-step reductions into one blockwise (value, col, x, y, z)
tuple sweep — hypothesized to beat the five full-width cross-lane
reductions — measured 22.85 ms vs v1's 7.87 ms at the flagship shape
(n=8192, m=1024, B=64): the 63-block compare-select chain is SERIAL, while
Mosaic lowers full-width reductions as trees. The two-stage block_min trick
pays on kNN/ball-query (one reduction per k-extraction, no serial carry)
but not here. v2 was removed; this probe keeps the comparison v1 vs fused.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp


def main():
    from pointnet2_tpu.ops.core import gather_points
    from pointnet2_tpu.ops.pallas.fps import (
        farthest_point_sample_pallas,
        fps_centroids_pallas,
    )
    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    B = 64
    for n, m in [(8192, 1024), (1024, 256), (256, 64), (64, 16)]:
        xyz = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)

        t1 = slope_time(
            lambda c: farthest_point_sample_pallas(c, m).sum().astype(jnp.float32),
            xyz,
        )

        def fused_step(c):
            idx, nx = fps_centroids_pallas(c, m)
            return idx.sum().astype(jnp.float32) + nx.sum()

        t3 = slope_time(fused_step, xyz)

        def v1_gather_step(c):
            idx = farthest_point_sample_pallas(c, m)
            nx = gather_points(c, idx)
            return idx.sum().astype(jnp.float32) + nx.sum()

        t4 = slope_time(v1_gather_step, xyz)
        print(
            f"n={n:5d} m={m:5d}: v1 {t1*1e3:7.3f}  "
            f"fused {t3*1e3:7.3f}  v1+gather {t4*1e3:7.3f}  (ms)"
        )


if __name__ == "__main__":
    main()
