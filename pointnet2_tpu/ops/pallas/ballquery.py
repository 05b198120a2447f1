"""Pallas TPU kernel for radius ball query.

Reference semantics (tf_ops/tf_grouping.cu:3-43): for each query point,
return the FIRST `nsample` dataset points (in dataset index order) with
distance strictly < radius, padding unused slots with the first in-ball
index; the returned count is capped at `nsample`.

TPU design: one grid program per (batch, query-tile). The full dataset
coordinates live in VMEM; the (TM, N) squared-distance tile is computed on
the VPU in the f32 difference form sum((q-d)^2) — NOT the MXU expansion
|q|^2 - 2 q.d + |d|^2, which cancels catastrophically right at ball
boundaries and flips in-ball membership (the load-bearing bit-parity
choice; see the in-kernel comment). The tile is immediately converted
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

from pointnet2_tpu.ops.pallas import common

from pointnet2_tpu.ops.pallas.common import block_min

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

    # Unrolled first-k extraction: ascending mins of the key row. Two-stage
    # reduction (blockwise vreg mins, then one cross-lane reduce over 128
    # candidates) — same trick as the kNN kernel, exact semantics.
    for s in range(nsample):
        kmin = jnp.min(block_min(keys), axis=1, keepdims=True)  # (TM, 1)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin, n, keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0] = jnp.where(sel < n, sel, first)


def _ball_query_window_kernel(
    lo_ref,
    xs_ref,
    perm_ref,
    q_ref,
    idx_ref,
    cnt_ref,
    sel_ref,
    *,
    n: int,
    w: int,
    t: int,
    radius: float,
    nsample: int,
):
    """Windowed variant: the dataset lives x-sorted in VMEM (full (3, Npad)
    planes) and each program computes only the [lo, lo+W) column window of
    its query tile (lo is scalar-prefetched, 128-aligned). perm holds each
    sorted column's ORIGINAL dataset index; extracting the nsample smallest
    perm values yields the first-nsample-in-dataset-order semantics exactly —
    the window is a superset of every in-ball point (checked by the
    wrapper)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    lo = pl.multiple_of(lo_ref[i * t + j], _LANES)
    tm = q_ref.shape[2]

    d2 = jnp.zeros((tm, w), jnp.float32)
    for c in range(3):
        diff = q_ref[0, 0, :, c : c + 1] - xs_ref[0, c : c + 1, pl.ds(lo, w)]
        d2 = d2 + diff * diff

    keys_orig = perm_ref[0, 0:1, pl.ds(lo, w)]  # (1, W) original indices
    in_ball = (d2 < jnp.float32(radius) ** 2) & (keys_orig < n)
    keys = jnp.where(in_ball, keys_orig, n)

    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1)
    cnt_ref[0, 0, 0, :] = jnp.minimum(cnt, nsample)

    for s in range(nsample):
        kmin = jnp.min(block_min(keys), axis=1, keepdims=True)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin, n, keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0, 0] = jnp.where(sel < n, sel, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_windowed(
    xyz1: jax.Array,
    xyz2: jax.Array,
    radius: float,
    nsample: int,
    window: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact ball query exploiting spatial locality.

    Sorts the dataset and the queries by x, restricts each 128-query tile to
    a static-width window of sorted columns containing every point within
    ``radius`` in x (hence every in-ball point), and runs the first-k
    extraction over the window only — ~N/window times less VPU work than the
    full kernel. If any tile's true span exceeds the window (pathological
    density), a lax.cond falls back to the full kernel, so results are ALWAYS
    exact and identical to ball_query_pallas / the NumPy oracle.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tm = min(_LANES, m)
    # the window is a performance hint; the kernel's blockwise reduction
    # requires a 128-multiple width, so round any explicit value up
    w = _round_up(window or max(2 * nsample, n // 4), _LANES)
    if w >= n or m % tm != 0:
        return ball_query_pallas(xyz1, xyz2, radius, nsample)
    t = m // tm

    x1 = xyz1.astype(jnp.float32)
    x2 = xyz2.astype(jnp.float32)
    perm = jnp.argsort(x1[..., 0], axis=1)  # (B, N)
    xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
    qperm = jnp.argsort(x2[..., 0], axis=1)  # (B, M)
    qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)

    q_tiles = qs.reshape(b, t, tm, 3)
    xsx = xs[..., 0]
    tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)  # (B, T)
    tile_hi = q_tiles[..., 0].max(axis=-1) + jnp.float32(radius)
    lo = jax.vmap(jnp.searchsorted)(xsx, tile_lo).astype(jnp.int32)
    hi = jax.vmap(jnp.searchsorted)(xsx, tile_hi).astype(jnp.int32)
    # 128-align lo downward; the window must still cover [lo_orig, hi).
    lo_aligned = (jnp.clip(lo, 0, max(n - w, 0)) // _LANES) * _LANES
    fits = jnp.max(hi - lo_aligned) <= w

    npad = _round_up(n, _LANES)
    xs_t = jnp.transpose(xs, (0, 2, 1))  # (B, 3, N)
    perm_in = perm.astype(jnp.int32)[:, None, :]  # (B, 1, N)
    if npad != n:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, 0), (0, npad - n)), constant_values=1e30)
        perm_in = jnp.pad(
            perm_in, ((0, 0), (0, 0), (0, npad - n)), constant_values=n
        )

    def windowed(_):
        kernel = functools.partial(
            _ball_query_window_kernel,
            n=n,
            w=w,
            t=t,
            radius=float(radius),
            nsample=nsample,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, t),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, npad), lambda i, j, lo: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, npad), lambda i, j, lo: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, tm, 3),
                    lambda i, j, lo: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, 1, tm, nsample),
                    lambda i, j, lo: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1, tm),
                    lambda i, j, lo: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)
            ],
        )
        idx_s, cnt_s = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
                jax.ShapeDtypeStruct((b, t, 1, tm), jnp.int32),
            ),
        )(lo_aligned.reshape(-1), xs_t, perm_in, q_tiles)
        idx_sorted = idx_s.reshape(b, m, nsample)
        cnt_sorted = cnt_s.reshape(b, m)
        # scatter back to the original query order
        inv = jnp.argsort(qperm, axis=1)
        idx_out = jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)
        cnt_out = jnp.take_along_axis(cnt_sorted, inv, axis=1)
        return idx_out, cnt_out

    def full(_):
        return ball_query_pallas(xyz1, xyz2, radius, nsample)

    return jax.lax.cond(fits, windowed, full, operand=None)


def _ball_query_sliced_kernel(
    win_ref, perm_ref, q_ref, idx_ref, cnt_ref, sel_ref, *, n: int, radius: float, nsample: int
):
    """Pre-sliced windowed variant: every ref is a statically-addressed block.

    The wrapper materializes each query tile's (3, W) sorted-coordinate
    window and its (1, W) original-index window with XLA dynamic slices, so
    the kernel does NO dynamic-lane reads (pl.ds lane slicing from VMEM is a
    relayout copy on this Mosaic version — measured as expensive as the
    sweep work it saves in the in-kernel-sliced variant above). Extracting
    the nsample smallest original indices in the window preserves the exact
    first-in-dataset-order semantics (tf_ops/tf_grouping.cu:3-43).
    """
    w = win_ref.shape[-1]
    tm = q_ref.shape[2]

    d2 = jnp.zeros((tm, w), jnp.float32)
    for c in range(3):
        diff = q_ref[0, 0, :, c : c + 1] - win_ref[0, 0, c : c + 1, :]
        d2 = d2 + diff * diff

    keys_orig = perm_ref[0, 0, 0:1, :]  # (1, W) original dataset indices
    in_ball = (d2 < jnp.float32(radius) ** 2) & (keys_orig < n)
    keys = jnp.where(in_ball, keys_orig, n)

    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1)
    cnt_ref[0, 0, 0, :] = jnp.minimum(cnt, nsample)

    for s in range(nsample):
        kmin = jnp.min(block_min(keys), axis=1, keepdims=True)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin, n, keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < n, first, 0)
    idx_ref[0, 0] = jnp.where(sel < n, sel, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_sliced(
    xyz1: jax.Array,
    xyz2: jax.Array,
    radius: float,
    nsample: int,
    window: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Windowed ball query with XLA-side window materialization + ok cert.

    Same locality idea as ball_query_windowed (x-sort dataset + queries,
    bound each 128-query tile's candidate columns by searchsorted), but the
    windows are cut OUTSIDE the kernel with vmapped lax.dynamic_slice, so
    the kernel's sweeps run over statically-addressed (tm, W) blocks. The
    round-1 windowed kernel sliced in-kernel with pl.ds and measured SLOWER
    than the full kernel despite 4x less sweep width — dynamic-lane VMEM
    reads are relayout copies. Sorts themselves are cheap (~0.2 ms at the
    chunk regime, tools/bq_window_overhead_probe.py). Measured at the SA1
    chunk regime (B=8, 8192x1024, k=32, w=3072): 0.72-1.2 ms vs the full
    kernel's 1.5-2.0 ms (tools/bq_cond_probe.py).

    Returns ``(idx, cnt, ok)``. ``ok`` is a scalar bool **exactness
    certificate**: the window provably contains every in-ball candidate
    for every query tile (x-span bound via searchsorted), so when ``ok``
    is True the outputs are bit-identical to ball_query_pallas / the NumPy
    oracle (asserted on hardware in tools/tpu_parity.py). When the data is
    denser than the calibrated window (ok=False), far-from-centroid
    neighbors past the window edge may be dropped — callers must treat the
    results as invalid and re-run with a wider window / the full kernel.

    There is deliberately NO in-graph fallback: a lax.cond on ok costs
    0.7-1.4 ms on this backend even with a trivial branch — more than the
    entire kernel saving (tools/bq_cond_probe.py: with-cond 1.2-1.7,
    dummy-cond 2.1-2.3, no-cond 0.72-1.2, full 1.5-2.0 ms). Use
    ``tools/bq_window_calibrate.py`` to pick a window for a dataset and
    monitor ok (the model sows it, the trainer asserts it at eval points).

    Reference semantics preserved: first-nsample-in-ball in dataset order,
    pad-by-first, count capped at nsample (tf_ops/tf_grouping.cu:3-43) —
    extracting the nsample smallest original indices among in-window
    in-ball columns is exactly first-k-in-dataset-order.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tm = min(_LANES, m)
    w = _round_up(window, _LANES)
    if w >= n or m % tm != 0:
        idx, cnt = ball_query_pallas(xyz1, xyz2, radius, nsample)
        return idx, cnt, jnp.array(True)
    t = m // tm

    x1 = xyz1.astype(jnp.float32)
    x2 = xyz2.astype(jnp.float32)
    perm = jnp.argsort(x1[..., 0], axis=1)  # (B, N)
    xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
    qperm = jnp.argsort(x2[..., 0], axis=1)  # (B, M)
    qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)

    q_tiles = qs.reshape(b, t, tm, 3)
    xsx = xs[..., 0]
    tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)  # (B, T)
    tile_hi = q_tiles[..., 0].max(axis=-1) + jnp.float32(radius)
    lo = jax.vmap(jnp.searchsorted)(xsx, tile_lo).astype(jnp.int32)
    hi = jax.vmap(jnp.searchsorted)(xsx, tile_hi).astype(jnp.int32)
    lo_aligned = (jnp.clip(lo, 0, max(n - w, 0)) // _LANES) * _LANES
    ok = jnp.max(hi - lo_aligned) <= w

    xs_t = jnp.transpose(xs, (0, 2, 1))  # (B, 3, N)
    perm_in = perm.astype(jnp.int32)[:, None, :]  # (B, 1, N)

    cut = jax.vmap(  # over batch
        jax.vmap(  # over tiles
            lambda arr, s: lax.dynamic_slice(arr, (0, s), (arr.shape[0], w)),
            in_axes=(None, 0),
        ),
        in_axes=(0, 0),
    )
    win = cut(xs_t, lo_aligned)  # (B, T, 3, W)
    permw = cut(perm_in, lo_aligned)  # (B, T, 1, W)
    kernel = functools.partial(
        _ball_query_sliced_kernel, n=n, radius=float(radius), nsample=nsample
    )
    idx_s, cnt_s = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tm, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, tm, nsample),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, tm), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, t, 1, tm), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)
        ],
        cost_estimate=common.cost_estimate(
            flops=2 * b * m * w * 3 + b * m * w * (nsample + 6),
            bytes_accessed=b * t * w * 16 + b * m * 12 + b * m * nsample * 4,
            transcendentals=0,
        ),
    )(win, permw, q_tiles)
    idx_sorted = idx_s.reshape(b, m, nsample)
    cnt_sorted = cnt_s.reshape(b, m)
    inv = jnp.argsort(qperm, axis=1)
    idx_out = jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)
    cnt_out = jnp.take_along_axis(cnt_sorted, inv, axis=1)
    return idx_out, cnt_out, ok


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_pallas(
    xyz1: jax.Array,
    xyz2: jax.Array,
    radius: float,
    nsample: int,
    tm: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """xyz1: (B, N, 3) dataset, xyz2: (B, M, 3) queries.

    Returns idx (B, M, nsample) int32, cnt (B, M) int32. Matches
    ball_query_xla / ball_query_np bit-for-bit.

    tm: query rows per grid program (tile height). The (tm, Npad) distance
    tile lives in VMEM; larger tiles amortize per-program overhead.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    npad = _round_up(n, _LANES)
    tm = min(tm or _LANES, m)

    x1 = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        # Pad with +inf so padded columns are never in-ball (also guarded by col<n).
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, npad - n)), constant_values=1e30)
    x2 = xyz2.astype(jnp.float32)
    mpad = _round_up(m, tm)
    if mpad != m:
        # Pad queries far away (empty balls); rows sliced off below.
        x2 = jnp.pad(x2, ((0, 0), (0, mpad - m), (0, 0)), constant_values=1e30)

    kernel = functools.partial(
        _ball_query_kernel, n=n, radius=float(radius), nsample=nsample
    )
    grid = (b, mpad // tm)
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
            jax.ShapeDtypeStruct((b, mpad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, mpad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)],
        cost_estimate=common.cost_estimate(
            flops=2 * b * mpad * npad * 3 + b * mpad * npad * (nsample + 6),
            bytes_accessed=b * npad * 12 + b * mpad * 12 + b * mpad * nsample * 4,
            transcendentals=0,
        ),
    )(x1, x2)
    return idx[:, :m], cnt[:, 0, :m]
