#!/usr/bin/env python3
"""Decompose ball_query_sliced time: kernel-only vs window-cut vs sorts.

tools/bq_sliced_probe.py found sliced (w=2048) SLOWER than the full kernel
despite 4x less sweep width and fully static kernel addressing. This probe
isolates: (k) the pallas kernel on precomputed windows, (c) the vmapped
dynamic_slice window cut, (s) the sorts+searchsorted, (f) the full kernel.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops.pallas import common
from pointnet2_tpu.ops.pallas.ballquery import (
    _ball_query_sliced_kernel,
    ball_query_pallas,
)
from pointnet2_tpu.utils.bench import slope_time

_LANES = 128


def main():
    rng = np.random.RandomState(0)
    B, n, m, ns, r, w = 8, 8192, 1024, 32, 0.1, 2048
    tm = 128
    t = m // tm
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    xyz2 = jnp.asarray(xyz1[:, :: n // m][:, :m], jnp.float32)

    x1 = xyz1
    perm = jnp.argsort(x1[..., 0], axis=1)
    xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
    qperm = jnp.argsort(xyz2[..., 0], axis=1)
    qs = jnp.take_along_axis(xyz2, qperm[..., None], axis=1)
    q_tiles = qs.reshape(B, t, tm, 3)
    tile_lo = q_tiles[..., 0].min(axis=-1) - r
    lo = jax.vmap(jnp.searchsorted)(xs[..., 0], tile_lo).astype(jnp.int32)
    lo_aligned = (jnp.clip(lo, 0, n - w) // _LANES) * _LANES
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
        _ball_query_sliced_kernel, n=n, radius=float(r), nsample=ns
    )

    @jax.jit
    def kernel_only(winv):
        idx_s, _ = pl.pallas_call(
            kernel,
            grid=(B, t),
            in_specs=[
                pl.BlockSpec((1, 1, 3, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, tm, ns), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, tm), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, t, tm, ns), jnp.int32),
                jax.ShapeDtypeStruct((B, t, 1, tm), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((tm, _LANES), jnp.int32)],
        )(winv, permw, q_tiles)
        return idx_s

    @jax.jit
    def cut_only(x):
        return cut(x, lo_aligned)

    @jax.jit
    def sorts_only(x):
        p = jnp.argsort(x[..., 0], axis=1)
        s = jnp.take_along_axis(x, p[..., None], axis=1)
        qp = jnp.argsort(xyz2[..., 0], axis=1)
        q = jnp.take_along_axis(xyz2, qp[..., None], axis=1)
        tl = q.reshape(B, t, tm, 3)[..., 0].min(axis=-1) - r
        return jax.vmap(jnp.searchsorted)(s[..., 0], tl).astype(jnp.int32)

    print("decomposition (chunk regime B=8, w=2048):")
    for rep in range(3):
        tk = slope_time(kernel_only, win)
        tc = slope_time(cut_only, xs_t)
        ts = slope_time(sorts_only, xyz1)
        tf = slope_time(lambda c: ball_query_pallas(c, xyz2, r, ns)[0], xyz1)
        print(
            f"rep {rep}: kernel {tk*1e3:7.3f}  cut {tc*1e3:7.3f}"
            f"  sorts {ts*1e3:7.3f}  fullkernel {tf*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
