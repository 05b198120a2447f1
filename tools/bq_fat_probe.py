#!/usr/bin/env python3
"""Probe: fat query tiles (tm=256) for ball query via chunk-built keys.

Finding from tools/bq_window_overhead_probe.py: the windowed kernel's 4x
sweep-width cut buys nothing — extraction is LATENCY-bound (32 serially
dependent cross-lane reduction chains per program), so total time scales
with (#programs x 32 chains), not sweep width. Fatter tiles cut program
count; per-op width grows but latency-bound ops don't care.

tm=256 was previously blocked by scoped VMEM: d2 AND keys both (tm, Npad)
= 16 MB. Fix: never materialize full-width d2 — build keys chunk-at-a-time
(one 128-lane column chunk of d2 at a time) into a keys scratch, so only
keys (8 MB at tm=256) is live.

Variants (interleaved, one process):
  A shipped kernel tm=128
  B chunk-built keys, tm=128  (isolate the chunking change)
  C chunk-built keys, tm=256
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# Raise the Mosaic scoped-VMEM stack ceiling (default 16 MiB; v5e has 128 MiB
# VMEM). Must be set before the TPU plugin initializes.
os.environ["LIBTPU_INIT_ARGS"] = (
    os.environ.get("LIBTPU_INIT_ARGS", "")
    + " --xla_tpu_scoped_vmem_limit_kib=65536"
).strip()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops.pallas.ballquery import ball_query_pallas
from pointnet2_tpu.ops.pallas.common import block_min
from pointnet2_tpu.utils.bench import slope_time

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(xyz1_ref, xyz2_ref, idx_ref, cnt_ref, keys_ref, sel_ref, *, n, radius, nsample):
    npad = xyz1_ref.shape[-1]
    tm = xyz2_ref.shape[1]
    r2 = jnp.float32(radius) ** 2

    qx = xyz2_ref[0, :, 0:1]
    qy = xyz2_ref[0, :, 1:2]
    qz = xyz2_ref[0, :, 2:3]

    cnt = jnp.zeros((tm, _LANES), jnp.int32)
    for b in range(npad // _LANES):
        sl = slice(b * _LANES, (b + 1) * _LANES)
        dx = qx - xyz1_ref[0, 0:1, sl]
        dy = qy - xyz1_ref[0, 1:2, sl]
        dz = qz - xyz1_ref[0, 2:3, sl]
        d2 = dx * dx + dy * dy + dz * dz
        col = lax.broadcasted_iota(jnp.int32, (tm, _LANES), 1) + b * _LANES
        in_ball = (d2 < r2) & (col < n)
        keys_ref[:, sl] = jnp.where(in_ball, col, n)
        cnt = cnt + in_ball.astype(jnp.int32)
    cnt_ref[0, 0, :] = jnp.minimum(jnp.sum(cnt, axis=1), nsample)

    # Stream every sweep through the keys scratch chunk-by-chunk: loading
    # the whole (tm, Npad) scratch as one value doubles scoped-VMEM
    # residency (scratch + value copy = 16.7 MB at tm=256, over the 16 MB
    # stack limit).
    nblk = npad // _LANES
    for s in range(nsample):
        vals = keys_ref[:, 0:_LANES]
        for b in range(1, nblk):
            vals = jnp.minimum(vals, keys_ref[:, b * _LANES : (b + 1) * _LANES])
        kmin = jnp.min(vals, axis=1, keepdims=True)
        sel_ref[:, s : s + 1] = kmin
        for b in range(nblk):
            sl = slice(b * _LANES, (b + 1) * _LANES)
            chunk = keys_ref[:, sl]
            keys_ref[:, sl] = jnp.where(chunk == kmin, n, chunk)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0] = jnp.where(sel < n, sel, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def bq_fat(xyz1, xyz2, radius, nsample, tm):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    npad = _round_up(n, _LANES)
    x1 = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, npad - n)), constant_values=1e30)
    x2 = xyz2.astype(jnp.float32)
    mpad = _round_up(m, tm)
    if mpad != m:
        x2 = jnp.pad(x2, ((0, 0), (0, mpad - m), (0, 0)), constant_values=1e30)
    kernel = functools.partial(_kernel, n=n, radius=float(radius), nsample=nsample)
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
        scratch_shapes=[
            pltpu.VMEM((tm, npad), jnp.int32),
            pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32),
        ],
    )(x1, x2)
    return idx[:, :m], cnt[:, 0, :m]


def main():
    rng = np.random.RandomState(0)
    B, n, m, ns, r = 8, 8192, 1024, 32, 0.1
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    xyz2 = jnp.asarray(xyz1[:, :m] + 0.001, jnp.float32)
    ia, ca = jax.tree.map(np.asarray, ball_query_pallas(xyz1, xyz2, r, ns))
    for tm in (128, 256):
        ib, cb = jax.tree.map(np.asarray, bq_fat(xyz1, xyz2, r, ns, tm))
        assert (ia == ib).all() and (ca == cb).all(), f"tm={tm} disagrees"
    print("bit-identical; timing (chunk regime B=8):")
    for rep in range(3):
        ta = slope_time(lambda c: ball_query_pallas(c, xyz2, r, ns)[0], xyz1)
        tb = slope_time(lambda c: bq_fat(c, xyz2, r, ns, 128)[0], xyz1)
        tc = slope_time(lambda c: bq_fat(c, xyz2, r, ns, 256)[0], xyz1)
        print(
            f"rep {rep}: shipped128 {ta*1e3:7.3f}  chunked128 {tb*1e3:7.3f}"
            f"  chunked256 {tc*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
