#!/usr/bin/env python3
"""Composite SA/FP stage timing at flagship shapes (slope method)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.train_bench import slope_time


def main():
    from pointnet2_tpu import ops

    rng = np.random.RandomState(0)
    B = 64
    impl = None  # auto -> pallas on TPU

    SA = [
        (8192, 1024, 0.5, 32, 6),
        (1024, 256, 1.0, 32, 64),
        (256, 64, 2.0, 32, 128),
        (64, 16, 4.0, 32, 256),
    ]
    print(f"== SA sample_and_group composite (B={B}) ==")
    for n, m, r, ns, cin in SA:
        x = jnp.asarray(rng.rand(B, n, 3 + cin), jnp.float32)

        def sg(c, n=n, m=m, r=r, ns=ns):
            xyz = c[..., :3]
            feats = c[..., 3:]
            fps_idx = ops.farthest_point_sample(xyz, m, impl=impl)
            new_xyz = ops.gather_points(xyz, fps_idx)
            idx, _ = ops.ball_query(xyz, new_xyz, r, ns, impl=impl)
            g_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
            g_feat = ops.group_points(feats, idx)
            return g_xyz.sum() + g_feat.sum()

        t = slope_time(sg, x)
        print(f"SA n={n:5d}->m={m:4d} cin={cin:3d}: sample+group {t*1e3:7.2f} ms")

    print(f"== gather-only (B={B}) ==")
    for n, m, ns, cin in [(8192, 1024, 32, 64), (1024, 256, 32, 128)]:
        x = jnp.asarray(rng.rand(B, n, cin), jnp.float32)
        idx = jnp.asarray(rng.randint(0, n, (B, m, ns)), jnp.int32)

        def gather(c, idx=idx):
            return ops.group_points(c, idx).sum()

        t = slope_time(gather, x)
        print(f"group n={n:5d}->({m}x{ns}) c={cin:3d}: {t*1e3:7.2f} ms")

    print(f"== FP interpolate composite (B={B}) ==")
    for n, m, cs in [(8192, 1024, 128), (1024, 256, 256), (256, 64, 256), (64, 16, 512)]:
        x = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
        xyz_s = jnp.asarray(rng.rand(B, m, 3), jnp.float32)
        feats = jnp.asarray(rng.rand(B, m, cs), jnp.float32)

        def fp(c, s=xyz_s, f=feats):
            d, i = ops.three_nn(c, s, impl=impl)
            w = ops.interpolation_weights(d)
            return ops.three_interpolate(f, i, w).sum()

        t = slope_time(fp, x)
        print(f"FP {m:4d}->{n:5d} c={cs:3d}: interp {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
