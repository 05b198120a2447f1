#!/usr/bin/env python3
"""Probe: per-step pad-lane re-masking vs init-only masking in the FPS kernel.

The FPS kernels seed padded lanes' running min-distance at -1.0; since every
step's d >= 0, `minimum(mind, d)` preserves -1 without re-masking. This probe
interleaves the masked and unmasked step bodies in one process to defeat
tunnel drift (memory: this tunnel shows intermittent slowdowns; interleave
A/B, never compare across sessions).
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
from pointnet2_tpu.ops.pallas.fps import _LANES, _SUBLANES, _round_up


def _kernel(xyz_ref, idx_ref, mind_ref, *, n, npoint, remask):
    npad = xyz_ref.shape[-1]
    mpad = idx_ref.shape[-1]
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    col = lax.broadcasted_iota(jnp.int32, (_SUBLANES, npad), 1)
    valid = col < n
    mind_ref[:] = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    col_m = lax.broadcasted_iota(jnp.int32, (_SUBLANES, mpad), 1)

    def step(j, carry):
        old, row = carry
        sel = (col == old).astype(jnp.float32)
        x1 = jnp.sum(x * sel, axis=1, keepdims=True)
        y1 = jnp.sum(y * sel, axis=1, keepdims=True)
        z1 = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        if remask:
            d = jnp.where(valid, d, jnp.float32(-1.0))
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        rowmax = jnp.max(mind, axis=1, keepdims=True)
        new = jnp.min(
            jnp.where(mind == rowmax, col, npad), axis=1, keepdims=True
        ).astype(jnp.int32)
        row = jnp.where(col_m == j, new, row)
        return new, row

    _, row = lax.fori_loop(
        1,
        npoint,
        step,
        (
            jnp.zeros((_SUBLANES, 1), jnp.int32),
            jnp.zeros((_SUBLANES, mpad), jnp.int32),
        ),
    )
    idx_ref[:, :] = row


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps(xyz, npoint, remask):
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANES)
    mpad = _round_up(npoint, _LANES)
    bpad = _round_up(b, _SUBLANES)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    if npad != n or bpad != b:
        xyz_t = jnp.pad(xyz_t, ((0, bpad - b), (0, 0), (0, npad - n)))
    kernel = functools.partial(_kernel, n=n, npoint=npoint, remask=remask)
    idx = pl.pallas_call(
        kernel,
        grid=(bpad // _SUBLANES,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, 3, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_SUBLANES, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, mpad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, npad), jnp.float32)],
        cost_estimate=common.cost_estimate(
            flops=9 * bpad * npoint * npad,
            bytes_accessed=bpad * npad * 16,
            transcendentals=0,
        ),
    )(xyz_t)
    return idx[:b, :npoint]


def main():
    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    B, n, m = 64, 8192, 1024
    xyz = jnp.asarray(rng.rand(B, n, 3) * 10, jnp.float32)
    a = np.asarray(fps(xyz, m, True))
    b = np.asarray(fps(xyz, m, False))
    assert (a == b).all(), "masked vs unmasked disagree"
    for rep in range(3):
        tm = slope_time(lambda c: fps(c, m, True), xyz)
        tu = slope_time(lambda c: fps(c, m, False), xyz)
        print(f"rep {rep}: remask {tm*1e3:7.3f} ms   no-remask {tu*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
