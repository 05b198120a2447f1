#!/usr/bin/env python3
"""Probe: int16 vs int32 keys in the ball-query first-k extraction sweeps.

The kernel's cost is dominated by nsample sweeps over the (tm, Npad) key
array (blockwise min + cross-lane min + masked update). Keys are dataset
column indices in [0, n] with n <= 8192, so they fit int16 exactly; if
Mosaic keeps i16 vectors packed (2 elements/lane), every sweep touches half
the vregs. Results must stay bit-identical (integer arithmetic).

Interleaved A/B in one process to defeat tunnel drift.
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
from pointnet2_tpu.ops.pallas.common import block_min

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(xyz1_ref, xyz2_ref, idx_ref, cnt_ref, sel_ref, *, n, radius, nsample, dtype):
    npad = xyz1_ref.shape[-1]
    tm = xyz2_ref.shape[1]
    d2 = jnp.zeros((tm, npad), jnp.float32)
    for c in range(3):
        diff = xyz2_ref[0, :, c : c + 1] - xyz1_ref[0, c : c + 1, :]
        d2 = d2 + diff * diff

    col32 = lax.broadcasted_iota(jnp.int32, (tm, npad), 1)
    in_ball = (d2 < jnp.float32(radius) ** 2) & (col32 < n)
    # Build keys at 32 bit (the f32-compare mask has a 32-bit layout Mosaic
    # cannot apply to i16 selects), then cast once; every sweep op below is
    # then uniformly narrow.
    keys = jnp.where(in_ball, col32, n).astype(dtype)

    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1)
    cnt_ref[0, 0, :] = jnp.minimum(cnt, nsample)

    for s in range(nsample):
        # Mosaic has no cross-lane i16 reductions: stage-1 blockwise mins
        # stay i16 (the full-width cost), the one (tm, 128) cross-lane
        # reduce is done in i32.
        kmin = jnp.min(block_min(keys).astype(jnp.int32), axis=1, keepdims=True)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin.astype(dtype), jnp.asarray(n, dtype), keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0] = jnp.where(sel < n, sel, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def bq(xyz1, xyz2, radius, nsample, use_i16):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    npad = _round_up(n, _LANES)
    tm = min(_LANES, m)
    x1 = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, npad - n)), constant_values=1e30)
    x2 = xyz2.astype(jnp.float32)
    mpad = _round_up(m, tm)
    if mpad != m:
        x2 = jnp.pad(x2, ((0, 0), (0, mpad - m), (0, 0)), constant_values=1e30)
    kernel = functools.partial(
        _kernel,
        n=n,
        radius=float(radius),
        nsample=nsample,
        dtype=jnp.int16 if use_i16 else jnp.int32,
    )
    idx, cnt = pl.pallas_call(
        kernel,
        grid=(b, mpad // tm),
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, mpad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, mpad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)],
    )(x1, x2)
    return idx[:, :m], cnt[:, 0, :m]


def main():
    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    B, n, m, ns, r = 8, 8192, 1024, 32, 0.1
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    xyz2 = jnp.asarray(xyz1[:, :m] + 0.001, jnp.float32)
    i32 = jax.tree.map(np.asarray, bq(xyz1, xyz2, r, ns, False))
    i16 = jax.tree.map(np.asarray, bq(xyz1, xyz2, r, ns, True))
    assert (i32[0] == i16[0]).all() and (i32[1] == i16[1]).all(), "i16 disagrees"
    print("bit-identical; timing (SA1 chunk regime B=8):")
    for rep in range(3):
        t32 = slope_time(lambda c: bq(c, xyz2, r, ns, False)[0], xyz1)
        t16 = slope_time(lambda c: bq(c, xyz2, r, ns, True)[0], xyz1)
        print(f"rep {rep}: i32 {t32*1e3:7.3f} ms   i16 {t16*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
