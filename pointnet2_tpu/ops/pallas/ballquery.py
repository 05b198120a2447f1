"""Pallas TPU kernel for radius ball query.

Reference semantics (tf_ops/tf_grouping.cu:3-43): for each query point,
return the FIRST `nsample` dataset points (in dataset index order) with
distance strictly < radius, padding unused slots with the first in-ball
index; the returned count is capped at `nsample`.

TPU design: one grid program per (batch, query-tile). The full dataset
coordinates live in VMEM; the (TM, N) squared-distance tile is produced by a
single MXU matmul (|q|^2 - 2 q.d + |d|^2 expansion) and immediately converted
into integer "keys" (the point's own index when in-ball, else N). The first
`nsample` in-ball indices are then exactly the `nsample` smallest keys, which
an unrolled min-extract loop pulls out in ascending (= dataset) order. The
(M, N) distance matrix is never materialized in HBM, unlike the XLA
formulation in ops/core.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ball_query_kernel(
    xyz1_ref, xyz2_ref, idx_ref, cnt_ref, sel_ref, *, n: int, radius: float, nsample: int
):
    npad = xyz1_ref.shape[-1]
    tm = xyz2_ref.shape[1]

    # Squared distance tile in float32 difference form (bit-faithful to
    # tf_grouping.cu:28-31; the MXU expansion form cancels catastrophically
    # at ball boundaries). (TM, 1) op (1, Npad) broadcasts on the VPU.
    # Queries arrive as (1, TM, 3) so per-coordinate columns are (TM, 1)
    # without any in-kernel transpose; the dataset arrives transposed
    # (1, 3, Npad) so per-coordinate rows are (1, Npad).
    d2 = jnp.zeros((tm, npad), jnp.float32)
    for c in range(3):
        diff = xyz2_ref[0, :, c : c + 1] - xyz1_ref[0, c : c + 1, :]
        d2 = d2 + diff * diff

    col = lax.broadcasted_iota(jnp.int32, (tm, npad), 1)
    in_ball = (d2 < jnp.float32(radius) ** 2) & (col < n)
    keys = jnp.where(in_ball, col, n)

    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1)  # (TM,)
    cnt_ref[0, 0, :] = jnp.minimum(cnt, nsample)

    # Unrolled first-k extraction: ascending mins of the key row.
    for s in range(nsample):
        kmin = jnp.min(keys, axis=1, keepdims=True)  # (TM, 1)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin, n, keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0] = jnp.where(sel < n, sel, first)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ball_query_pallas(
    xyz1: jax.Array, xyz2: jax.Array, radius: float, nsample: int
) -> tuple[jax.Array, jax.Array]:
    """xyz1: (B, N, 3) dataset, xyz2: (B, M, 3) queries.

    Returns idx (B, M, nsample) int32, cnt (B, M) int32. Matches
    ball_query_xla / ball_query_np bit-for-bit.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    npad = _round_up(n, _LANES)
    tm = min(_LANES, m)
    assert m % tm == 0, f"query count {m} not divisible by tile {tm}"

    x1 = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        # Pad with +inf so padded columns are never in-ball (also guarded by col<n).
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, npad - n)), constant_values=1e30)
    x2 = xyz2.astype(jnp.float32)

    kernel = functools.partial(
        _ball_query_kernel, n=n, radius=float(radius), nsample=nsample
    )
    grid = (b, m // tm)
    idx, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tm, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            # cnt as (B, 1, M) so the trailing block dims are Mosaic-aligned.
            pl.BlockSpec((1, 1, tm), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * npad * 3 + b * m * npad * (nsample + 6),
            bytes_accessed=b * npad * 12 + b * m * 12 + b * m * nsample * 4,
            transcendentals=0,
        ),
    )(x1, x2)
    return idx, cnt[:, 0, :]
