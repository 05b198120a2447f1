#!/usr/bin/env python3
"""Probe: can the wingather output copy (copy.315, 1.73 ms, 64MB/call at
the batch-64 flagship profile) be eliminated by emitting (B, M, K, C)
blocks directly from the gather kernel?

The shipped kernel writes (B, T, TM*K, C) and reshapes to (B, M, K, C) —
logically a bitcast (identical linear order), but the profile shows XLA
materializing a 64MB copy after the custom call
(artifacts/tpu-profile-prod-r5-before.txt copy.272 / -after copy.315).
Hypothesis: the copy is the reshape-across-custom-call-boundary; writing
the final logical shape as the pallas out_shape removes the reshape node
and maybe the copy.

A/B on hardware at the production SA1 chunk shape (B=8, 8192 -> 1024,
k=32, C=32, w=3072): shipped project_group_sliced vs the 4D-out variant,
bit-equality asserted, then slope-timed standalone.

Measured (TPU v5e, round 5): NEGATIVE — bit-equal, but
  shipped (T,TRK,C) + reshape : 2.199 ms
  4D (M,K,C) direct out       : 3.892 ms
The per-row store becomes a two-dynamic-dim (1, q, kk, C) slab write plus
an in-kernel reshape, which Mosaic lowers ~1.8x slower than the flat
(TRK, C) row store — more than the 1.73 ms XLA-side copy the change was
after (and that copy covers the WHOLE grouped tensor, so only part of it
is attributable to the reshape anyway). The shipped flat-row layout
stands; copy.315 is accepted as the price of the custom-call boundary.
ROADMAP "Performance" 1e.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pointnet2_tpu.ops.pallas import wingather as wg
    from pointnet2_tpu.utils.bench import slope_time
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    _LANES = 128

    def _window_gather_kernel_4d(
        kblk_ref, rel_ref, win0_ref, win1_ref, out_ref, scratch,
        *, tm: int, k: int, wblk: int, unroll: int
    ):
        scratch[pl.ds(0, wblk), :] = win0_ref[0]
        scratch[pl.ds(wblk, wblk), :] = win1_ref[0]

        def body(u, _):
            for s in range(unroll):
                r = u * unroll + s
                i = rel_ref[0, 0, 0, r]
                out_ref[0, pl.ds(r // k, 1), pl.ds(r % k, 1), :] = (
                    scratch[pl.ds(i, 1), :].reshape(1, 1, -1)
                )
            return 0

        lax.fori_loop(0, (tm * k) // unroll, body, 0)

    @functools.partial(jax.jit, static_argnums=(5, 6, 7))
    def project_group_sliced_4d(
        inputs, w0, b0, xyz, new_xyz, radius, nsample, window
    ):
        b, n, _ = xyz.shape
        m = new_xyz.shape[1]
        k = nsample
        tm = min(_LANES, m)
        w = wg._round_up(window, _LANES)
        wblk = wg._pick_wblk(n, w)
        assert not (w >= n or m % tm != 0 or wblk is None)
        t = m // tm
        trk = tm * k

        x1 = xyz.astype(jnp.float32)
        x2 = new_xyz.astype(jnp.float32)
        perm = jnp.argsort(x1[..., 0], axis=1)
        cat_s = jnp.take_along_axis(
            jnp.concatenate([x1, inputs.astype(jnp.float32)], axis=-1),
            perm[..., None],
            axis=1,
        )
        xs = cat_s[..., :3]
        sorted_inputs = cat_s[..., 3:]
        qperm = jnp.argsort(x2[..., 0], axis=1)
        qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)

        q_tiles = qs.reshape(b, t, tm, 3)
        xsx = xs[..., 0]
        tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)
        tile_hi = q_tiles[..., 0].max(axis=-1) + jnp.float32(radius)
        lo = jax.vmap(jnp.searchsorted)(xsx, tile_lo).astype(jnp.int32)
        hi = jax.vmap(jnp.searchsorted)(xsx, tile_hi).astype(jnp.int32)
        lo_aligned = (jnp.clip(lo, 0, max(n - w, 0)) // _LANES) * _LANES
        ok = jnp.max(hi - lo_aligned) <= w

        xs_t = jnp.transpose(xs, (0, 2, 1))
        perm_in = perm.astype(jnp.int32)[:, None, :]
        cut = jax.vmap(
            jax.vmap(
                lambda arr, s: lax.dynamic_slice(
                    arr, (0, s), (arr.shape[0], w)
                ),
                in_axes=(None, 0),
            ),
            in_axes=(0, 0),
        )
        win = cut(xs_t, lo_aligned)
        permw = cut(perm_in, lo_aligned)

        bq_kernel = functools.partial(
            wg._bq_sliced_pos_kernel, n=n, radius=float(radius),
            nsample=nsample,
        )
        idx_s, pos_s, cnt_s = pl.pallas_call(
            bq_kernel,
            grid=(b, t),
            in_specs=[
                pl.BlockSpec((1, 1, 3, w), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, w), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm, 3), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, tm, nsample), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm, nsample), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, tm), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
                jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
                jax.ShapeDtypeStruct((b, t, 1, tm), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((tm, wg._round_up(nsample, _LANES)), jnp.int32)
            ],
        )(win, permw, q_tiles)

        zp_s = sorted_inputs @ w0 + b0
        c = zp_s.shape[-1]

        kblk = (lo_aligned // wblk).astype(jnp.int32)
        off = (lo_aligned - kblk * wblk).astype(jnp.int32)
        rel = (pos_s.reshape(b, t, trk) + off[:, :, None])[:, :, None, :]
        nblk = n // wblk

        def map0(bb, tt, kblk_ref):
            return (bb, kblk_ref[bb, tt], 0)

        def map1(bb, tt, kblk_ref):
            return (bb, jnp.minimum(kblk_ref[bb, tt] + 1, nblk - 1), 0)

        gather_kernel = functools.partial(
            _window_gather_kernel_4d, tm=tm, k=k, wblk=wblk, unroll=4
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, t),
            in_specs=[
                pl.BlockSpec((1, 1, 1, trk),
                             lambda bb, tt, kr: (bb, tt, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, wblk, c), map0),
                pl.BlockSpec((1, wblk, c), map1),
            ],
            out_specs=pl.BlockSpec(
                (1, tm, k, c), lambda bb, tt, kr: (bb, tt, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((2 * wblk, c), zp_s.dtype)],
        )
        grouped_s = pl.pallas_call(
            gather_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, m, k, c), zp_s.dtype),
        )(kblk, rel, zp_s, zp_s)

        inv_q = jnp.argsort(qperm, axis=1)
        idx_out = jnp.take_along_axis(
            idx_s.reshape(b, m, k), inv_q[..., None], axis=1
        )
        cnt_out = jnp.take_along_axis(cnt_s.reshape(b, m), inv_q, axis=1)
        return grouped_s, idx_out, cnt_out, qperm, inv_q, ok

    B, N, M, K, C_IN, F0, W = 8, 8192, 1024, 32, 6, 32, 3072
    R = 0.5
    rng = np.random.RandomState(0)
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[:] = rng.rand(B, N, 3) * [8.0, 8.0, 4.9]
    inputs = np.concatenate(
        [xyz, rng.rand(B, N, C_IN - 3).astype(np.float32)], axis=-1
    )
    w0 = rng.randn(C_IN, F0).astype(np.float32) * 0.1
    b0 = rng.randn(F0).astype(np.float32) * 0.1
    xyz_j = jnp.asarray(xyz)
    in_j = jnp.asarray(inputs)
    w0_j, b0_j = jnp.asarray(w0), jnp.asarray(b0)
    fps = jax.jit(
        lambda x: __import__("pointnet2_tpu").ops.fps_centroids(x, M)[1]
    )
    new_xyz = fps(xyz_j)

    a = wg.project_group_sliced(in_j, w0_j, b0_j, xyz_j, new_xyz, R, K, W)
    bres = project_group_sliced_4d(in_j, w0_j, b0_j, xyz_j, new_xyz, R, K, W)
    assert bool(a[5]) and bool(bres[5]), "window certificate"
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(bres[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(bres[1]))
    print("bit-equal OK")

    def run_a(x):
        g, *_ = wg.project_group_sliced(x, w0_j, b0_j, xyz_j, new_xyz, R, K, W)
        return jnp.sum(g[..., :1])

    def run_b(x):
        g, *_ = project_group_sliced_4d(x, w0_j, b0_j, xyz_j, new_xyz, R, K, W)
        return jnp.sum(g[..., :1])

    ta = slope_time(run_a, in_j)
    tb = slope_time(run_b, in_j)
    print(f"shipped (T,TRK,C)+reshape : {ta * 1e3:7.3f} ms")
    print(f"4D (M,K,C) direct out     : {tb * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
