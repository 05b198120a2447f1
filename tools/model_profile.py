#!/usr/bin/env python3
"""Stage-by-stage device timing of the flagship forward pass.

Times each SA/FP building block at its real shape with the epsilon-chained
scan method (see tools/op_bench.py) to find the actual bottlenecks.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

K = 10


def device_time(make_step, x, reps=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            out = make_step(c)
            c = c + out.astype(jnp.float32) * jnp.float32(1e-38)
            return c, ()

        c, _ = lax.scan(body, x, None, length=K)
        return c

    loop(x).block_until_ready()
    times = []
    for _ in range(reps):
        t = time.time()
        loop(x).block_until_ready()
        times.append(time.time() - t)
    return float(np.median(times)) / K


def main():
    from pointnet2_tpu import ops

    rng = np.random.RandomState(0)
    B = 64
    impl = sys.argv[1] if len(sys.argv) > 1 else None

    # SA level shapes: (n_in, m_out, radius, nsample, c_in, c_out_mlp)
    SA = [
        (8192, 1024, 0.5, 32, 3, (32, 32, 64)),
        (1024, 256, 1.0, 32, 64, (64, 64, 128)),
        (256, 64, 2.0, 32, 128, (128, 128, 256)),
        (64, 16, 4.0, 32, 256, (256, 256, 512)),
    ]
    print(f"== SA stages (B={B}, impl={impl or 'auto'}) ==")
    total = 0.0
    for n, m, r, ns, cin, mlp in SA:
        xyz = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)
        feats = jnp.asarray(rng.rand(B, n, cin), jnp.float32)

        def fps_step(c, m=m):
            return ops.farthest_point_sample(c, m, impl=impl).sum()

        def bq_step(c, m=m, r=r, ns=ns):
            idx, cnt = ops.ball_query(c, c[:, :m], r, ns, impl=impl)
            return idx.sum() + cnt.sum()

        def group_step(c, f=feats, m=m, ns=ns):
            idx = jnp.broadcast_to(
                jnp.arange(ns, dtype=jnp.int32)[None, None, :], (B, m, ns)
            )
            g = ops.group_points(f, idx)
            return g.sum()

        t_fps = device_time(fps_step, xyz)
        t_bq = device_time(bq_step, xyz)
        t_gr = device_time(group_step, xyz)

        # shared MLP cost at (B, m, ns, cin+3) through mlp channels
        w = [
            jnp.asarray(rng.randn(cin + 3 if i == 0 else mlp[i - 1], co) * 0.1, jnp.float32)
            for i, co in enumerate(mlp)
        ]

        def mlp_step(c, m=m, ns=ns, cin=cin):
            h = jnp.broadcast_to(c[:, :m, None, :], (B, m, ns, 3))
            h = jnp.concatenate(
                [h, jnp.zeros((B, m, ns, cin), jnp.float32)], axis=-1
            )
            for wi in w:
                h = jax.nn.relu(h @ wi)
            return jnp.max(h, axis=2).sum()

        t_mlp = device_time(mlp_step, xyz)
        total += t_fps + t_bq + t_gr + t_mlp
        print(
            f"SA n={n:5d}->m={m:4d}: fps {t_fps*1e3:7.2f}  bq {t_bq*1e3:7.2f}  "
            f"group {t_gr*1e3:7.2f}  mlp {t_mlp*1e3:7.2f}  (ms)"
        )

    # FP stages: (n_dense, m_sparse, c_sparse, mlp)
    FP = [
        (64, 16, 512, (256, 256)),
        (256, 64, 256, (256, 256)),
        (1024, 256, 256, (256, 128)),
        (8192, 1024, 128, (128, 128, 128)),
    ]
    print(f"== FP stages (B={B}) ==")
    for n, m, cs, mlp in FP:
        xyz_d = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)
        xyz_s = jnp.asarray(rng.rand(B, m, 3) * 10, jnp.float32)
        feats = jnp.asarray(rng.rand(B, m, cs), jnp.float32)

        def nn_step(c, s=xyz_s):
            d, i = ops.three_nn(c, s, impl=impl)
            return d.sum() + i.sum().astype(jnp.float32)

        def interp_step(c, s=xyz_s, f=feats):
            d, i = ops.three_nn(c, s, impl=impl)
            w = ops.interpolation_weights(lax.stop_gradient(d))
            out = ops.three_interpolate(f, i, w)
            return out.sum()

        t_nn = device_time(nn_step, xyz_d)
        t_it = device_time(interp_step, xyz_d)
        total += t_it
        print(
            f"FP {m:4d}->{n:5d}: three_nn {t_nn*1e3:7.2f}  full-interp {t_it*1e3:7.2f} (ms)"
        )
    print(f"approx total (SA+FP interp): {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
