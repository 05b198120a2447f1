#!/usr/bin/env python3
"""Probe: kernel tile-size sweep for ball_query (tm) and knn (tq), round 3.

Both kernels fixed their tile heights in round 1 (ball query tm=128,
knn tq=512 via the ~2MB heuristic). Larger tiles amortize per-program
launch overhead against VMEM pressure; this sweeps the flagship shapes.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp


def main():
    from pointnet2_tpu.ops.pallas.ballquery import ball_query_pallas
    from pointnet2_tpu.ops.pallas.knn import knn_pallas
    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    B = 64

    # SA1 ball query: dataset 8192, queries 1024, k=32, r=0.5
    xyz = jnp.asarray(rng.rand(B, 8192, 3) * 10, jnp.float32)
    q = jnp.asarray(rng.rand(B, 1024, 3) * 10, jnp.float32)
    # Tile ceilings: the kernel's live VMEM (ball query: d2 AND keys, both
    # (tm, Npad)) must fit the 16MB scoped-VMEM stack — tm=256 x 8192
    # already allocates 17.16M (measured OOM on v5e). tm=128 is the max.
    print("== ball_query (8192 data, 1024 queries, k=32) tm sweep ==")
    for tm in [128]:
        t = slope_time(
            lambda c, tm=tm: ball_query_pallas(c, q, 0.5, 32, tm)[0]
            .sum()
            .astype(jnp.float32),
            xyz,
        )
        print(f"tm={tm:5d}: {t*1e3:8.3f} ms")

    # FP4 three_nn: 8192 queries, 1024 refs, k=3
    print("== knn/three_nn (8192 queries, 1024 refs, k=3) tq sweep ==")
    for tq in [128, 256, 384, 512]:
        t = slope_time(
            lambda c, tq=tq: knn_pallas(q, c, 3, tq)[1].sum().astype(jnp.float32),
            xyz,
        )
        print(f"tq={tq:5d}: {t*1e3:8.3f} ms")

    # SA1 ball query at the CHUNK regime (B=8) — what the model actually runs
    xyz8 = xyz[:8]
    q8 = q[:8]
    print("== ball_query B=8 (chunk regime) tm sweep ==")
    for tm in [128]:
        t = slope_time(
            lambda c, tm=tm: ball_query_pallas(c, q8, 0.5, 32, tm)[0]
            .sum()
            .astype(jnp.float32),
            xyz8,
        )
        print(f"tm={tm:5d}: {t*1e3:8.3f} ms")
    print("== knn B=8 (chunk regime) tq sweep ==")
    for tq in [128, 256, 512]:
        t = slope_time(
            lambda c, tq=tq: knn_pallas(q8, c, 3, tq)[1].sum().astype(jnp.float32),
            xyz8,
        )
        print(f"tq={tq:5d}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
