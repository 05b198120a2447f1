#!/usr/bin/env python3
"""Op-level TPU microbenchmarks: Pallas vs XLA vs approx variants at the
flagship model's real shapes.

Timing methodology: K data-dependent iterations inside ONE jitted scan, so
the measurement is pure device time — per-call dispatch/sync through the
tunneled TPU costs ~26ms and would swamp sub-ms kernels.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

K = 20


def device_time(make_step, x, reps=3):
    """Per-step device time via the canonical K-slope helper.

    (An earlier version amortized a single K=20 loop and synced with
    block_until_ready — which RETURNS EARLY for some programs on this
    backend, silently reporting ~1µs for multi-ms kernels. slope_time uses
    scalar float() readbacks and the K-slope, which also cancels dispatch
    overhead.)
    """
    from pointnet2_tpu.utils.bench import slope_time

    return slope_time(make_step, x, K0=2, K1=2 + K, reps=reps)


def main():
    from pointnet2_tpu.ops.core import (
        ball_query_xla,
        farthest_point_sample_xla,
        knn_xla,
    )
    from pointnet2_tpu.ops.pallas import (
        ball_query_pallas,
        farthest_point_sample_pallas,
    )

    rng = np.random.RandomState(0)
    B = 64

    print("== FPS (B=64) ==")
    for n, m in [(8192, 1024), (1024, 256), (256, 64), (64, 16)]:
        xyz = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)
        tp = device_time(
            lambda c: farthest_point_sample_pallas(c, m).sum().astype(jnp.float32), xyz
        )
        tx = device_time(
            lambda c: farthest_point_sample_xla(c, m).sum().astype(jnp.float32), xyz
        )
        print(f"n={n:5d} m={m:5d}: pallas {tp*1e3:8.3f}ms  xla {tx*1e3:8.3f}ms")

    print("== ball query (B=64, nsample=32) ==")
    for n, m, r in [(8192, 1024, 0.5), (1024, 256, 1.0), (256, 64, 2.0), (64, 16, 4.0)]:
        xyz1 = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)

        def bq_p(c, m=m, r=r):
            idx, cnt = ball_query_pallas(c, c[:, :m], r, 32)
            return (idx.sum() + cnt.sum()).astype(jnp.float32)

        def bq_x(c, m=m, r=r):
            idx, cnt = ball_query_xla(c, c[:, :m], r, 32)
            return (idx.sum() + cnt.sum()).astype(jnp.float32)

        tp = device_time(bq_p, xyz1)
        tx = device_time(bq_x, xyz1)
        print(f"n={n:5d} m={m:5d}: pallas {tp*1e3:8.3f}ms  xla {tx*1e3:8.3f}ms")

    print("== three_nn: top_k vs approx_min_k vs pallas (B=64, queries=n, refs=m) ==")
    from pointnet2_tpu.ops.pallas import knn_pallas

    for n, m in [(8192, 1024), (1024, 256), (256, 64), (64, 16)]:
        xyz_d = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)
        xyz_s = jnp.asarray(rng.rand(B, m, 3) * 10, jnp.float32)

        def via_topk(c, s=xyz_s):
            d, i = knn_xla(s, c, 3)
            return (d.sum() + i.sum().astype(jnp.float32))

        def via_approx(c, s=xyz_s):
            diff = c[:, :, None, :] - s[:, None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)
            nd, idx = lax.approx_min_k(d2, 3, recall_target=0.999)
            return (nd.sum() + idx.sum().astype(jnp.float32))

        def via_pallas(c, s=xyz_s):
            d, i = knn_pallas(s, c, 3)
            return (d.sum() + i.sum().astype(jnp.float32))

        tk = device_time(via_topk, xyz_d)
        ta = device_time(via_approx, xyz_d)
        tp = device_time(via_pallas, xyz_d)
        dk, ik = knn_xla(xyz_s, xyz_d, 3)
        dp, ip = knn_pallas(xyz_s, xyz_d, 3)
        agree = float(jnp.mean((ik == ip).all(-1)))
        print(
            f"n={n:5d} m={m:5d}: top_k {tk*1e3:8.3f}ms  approx {ta*1e3:8.3f}ms  "
            f"pallas {tp*1e3:8.3f}ms  pallas-idx-agree {agree:.4f}"
        )


if __name__ == "__main__":
    main()
