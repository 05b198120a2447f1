#!/usr/bin/env python3
"""Isolate lax.cond overhead in ball_query_sliced.

A: integrated ball_query_sliced (sorts + cut + kernel + inverse perm, with
   the exactness lax.cond fallback)
B: same pipeline with the cond removed (sliced branch called directly)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import pointnet2_tpu.ops.pallas.ballquery as bq
from pointnet2_tpu.utils.bench import slope_time


def make_nocond():
    """ball_query_sliced with lax.cond replaced by the sliced branch."""
    import functools
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _LANES = 128

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def nocond(xyz1, xyz2, radius, nsample, window):
        b, n, _ = xyz1.shape
        m = xyz2.shape[1]
        tm = min(_LANES, m)
        w = window
        t = m // tm
        x1 = xyz1.astype(jnp.float32)
        x2 = xyz2.astype(jnp.float32)
        perm = jnp.argsort(x1[..., 0], axis=1)
        xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
        qperm = jnp.argsort(x2[..., 0], axis=1)
        qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)
        q_tiles = qs.reshape(b, t, tm, 3)
        tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)
        lo = jax.vmap(jnp.searchsorted)(xs[..., 0], tile_lo).astype(jnp.int32)
        lo_aligned = (jnp.clip(lo, 0, max(n - w, 0)) // _LANES) * _LANES
        xs_t = jnp.transpose(xs, (0, 2, 1))
        perm_in = perm.astype(jnp.int32)[:, None, :]
        cut = jax.vmap(
            jax.vmap(
                lambda arr, s: lax.dynamic_slice(arr, (0, s), (arr.shape[0], w)),
                in_axes=(None, 0),
            ),
            in_axes=(0, 0),
        )
        win = cut(xs_t, lo_aligned)
        permw = cut(perm_in, lo_aligned)
        kernel = functools.partial(
            bq._ball_query_sliced_kernel, n=n, radius=float(radius), nsample=nsample
        )
        idx_s, cnt_s = pl.pallas_call(
            kernel,
            grid=(b, t),
            in_specs=[
                pl.BlockSpec((1, 1, 3, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, tm, nsample), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, tm), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
                jax.ShapeDtypeStruct((b, t, 1, tm), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((tm, _LANES), jnp.int32)],
        )(win, permw, q_tiles)
        idx_sorted = idx_s.reshape(b, m, nsample)
        cnt_sorted = cnt_s.reshape(b, m)
        inv = jnp.argsort(qperm, axis=1)
        idx_out = jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)
        cnt_out = jnp.take_along_axis(cnt_sorted, inv, axis=1)
        return idx_out, cnt_out

    return nocond


def make_dummycond():
    """Sliced pipeline inside a lax.cond whose other branch is trivial.

    If this matches no-cond, the 0.65 ms overhead of ball_query_sliced's cond
    is the heavy dual-branch structure (full kernel as fallback); if it
    matches with-cond, the overhead is intrinsic to TPU cond (predicate sync
    / pipeline break) and the windowed design is dead.
    """
    import functools
    from jax import lax

    nocond = make_nocond()

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def dummycond(xyz1, xyz2, radius, nsample, window):
        b, n, _ = xyz1.shape
        m = xyz2.shape[1]
        # same predicate computation as ball_query_sliced
        x1 = xyz1.astype(jnp.float32)
        x2 = xyz2.astype(jnp.float32)
        perm = jnp.argsort(x1[..., 0], axis=1)
        xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
        qperm = jnp.argsort(x2[..., 0], axis=1)
        qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)
        tm = 128
        t = m // tm
        q_tiles = qs.reshape(b, t, tm, 3)
        tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)
        tile_hi = q_tiles[..., 0].max(axis=-1) + jnp.float32(radius)
        lo = jax.vmap(jnp.searchsorted)(xs[..., 0], tile_lo).astype(jnp.int32)
        hi = jax.vmap(jnp.searchsorted)(xs[..., 0], tile_hi).astype(jnp.int32)
        lo_a = (jnp.clip(lo, 0, max(n - window, 0)) // 128) * 128
        fits = jnp.max(hi - lo_a) <= window

        def sliced(_):
            return nocond(xyz1, xyz2, radius, nsample, window)

        def dummy(_):
            return (
                jnp.zeros((b, m, nsample), jnp.int32),
                jnp.zeros((b, m), jnp.int32),
            )

        return lax.cond(fits, sliced, dummy, operand=None)

    return dummycond


def main():
    rng = np.random.RandomState(0)
    B, n, m, ns, r = 8, 8192, 1024, 32, 0.1
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    xyz2 = jnp.asarray(xyz1[:, :: n // m][:, :m], jnp.float32)
    nocond = make_nocond()
    dummycond = make_dummycond()
    ia, ca = jax.tree.map(np.asarray, bq.ball_query_pallas(xyz1, xyz2, r, ns))
    ib, cb = jax.tree.map(np.asarray, nocond(xyz1, xyz2, r, ns, 3072))
    assert (ia == ib).all() and (ca == cb).all()
    id_, cd = jax.tree.map(np.asarray, dummycond(xyz1, xyz2, r, ns, 3072))
    assert (ia == id_).all() and (ca == cd).all()
    print("bit-identical; timing:")
    for rep in range(3):
        ta = slope_time(lambda c: bq.ball_query_sliced(c, xyz2, r, ns, 3072)[0], xyz1)
        tb = slope_time(lambda c: nocond(c, xyz2, r, ns, 3072)[0], xyz1)
        td = slope_time(lambda c: dummycond(c, xyz2, r, ns, 3072)[0], xyz1)
        tf = slope_time(lambda c: bq.ball_query_pallas(c, xyz2, r, ns)[0], xyz1)
        print(
            f"rep {rep}: with-cond {ta*1e3:7.3f}  no-cond {tb*1e3:7.3f}"
            f"  dummy-cond {td*1e3:7.3f}  full {tf*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
