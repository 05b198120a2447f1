"""Pallas TPU kernel for exact k-nearest-neighbors (k small, e.g. three_nn).

The XLA formulation (ops/core.knn_xla) materializes the (B, Nq, M) distance
matrix in HBM and runs lax.top_k, which lowers to a full sort per row —
measured ~170ms for the FP4 shape (B=64, Nq=8192, M=1024) on v5e. This
kernel instead:

- computes the distance tile in VMEM (float32 difference form, bit-faithful
  to the reference's Open3D KDTree results),
- extracts the k smallest by k argmin passes (k=3 for feature propagation),
  each a pure VPU sweep,
- never touches HBM with the distance matrix.

Ties resolve to the lowest reference index (argmin first-occurrence), same
as the stable-argsort NumPy oracle.
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


def _knn_kernel(ref_ref, q_ref, dist_ref, idx_ref, *, m: int, k: int):
    mpad = ref_ref.shape[-1]
    tq = q_ref.shape[1]

    d2 = jnp.zeros((tq, mpad), jnp.float32)
    for c in range(3):
        diff = q_ref[0, :, c : c + 1] - ref_ref[0, c : c + 1, :]
        d2 = d2 + diff * diff
    col = lax.broadcasted_iota(jnp.int32, (tq, mpad), 1)
    d2 = jnp.where(col < m, d2, jnp.float32(jnp.inf))

    dists = []
    idxs = []
    for _ in range(k):
        # Two-stage min: (1) elementwise across the Mpad/128 lane blocks
        # (pure vreg ops, no cross-lane shuffles), (2) one cross-lane reduce
        # over the 128 surviving candidates. Measured 1.2x over the
        # argmin+min formulation at the FP4 shape (tools/knn_variant_probe.py).
        dmin = jnp.min(block_min(d2), axis=1)  # (TQ,)
        # first ORIGINAL index of the min value (tie -> lowest index, same as
        # the stable-argsort oracle)
        imin = jnp.min(
            jnp.where(d2 == dmin[:, None], col, mpad), axis=1
        ).astype(jnp.int32)
        dists.append(dmin[:, None])
        idxs.append(imin[:, None])
        d2 = jnp.where(col == imin[:, None], jnp.float32(jnp.inf), d2)

    dist_ref[0] = jnp.concatenate(dists, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_pallas(
    xyz1: jax.Array, xyz2: jax.Array, k: int, tq: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """k exact NN of each query in xyz2 among dataset xyz1.

    xyz1: (B, M, 3) dataset, xyz2: (B, Nq, 3) queries.
    Returns (dist2 (B, Nq, k) ascending, idx (B, Nq, k)). Matches knn_xla.

    tq: query-tile rows per grid program. SMALL tiles win (measured,
    tools/tile_probe.py round 3): at the FP4 shape tq=128 runs 5.96 ms vs
    10.24 ms for the old ~2MB heuristic's tq=512 at B=64, and 0.47 vs
    0.82 ms at the model's chunk-8 regime — more grid steps give Mosaic a
    deeper input-DMA/compute pipeline, and per-program launch overhead is
    negligible against the (tq, Mpad) sweep. Smaller FP shapes measure at
    noise level either way.
    """
    b, m, _ = xyz1.shape
    nq = xyz2.shape[1]
    mpad = _round_up(m, _LANES)
    if tq is None:
        tq = _LANES
    tq = min(tq, _round_up(nq, _LANES))

    refs = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    if mpad != m:
        refs = jnp.pad(refs, ((0, 0), (0, 0), (0, mpad - m)), constant_values=1e30)
    queries = xyz2.astype(jnp.float32)
    nq_pad = _round_up(nq, tq)
    if nq_pad != nq:
        queries = jnp.pad(queries, ((0, 0), (0, nq_pad - nq), (0, 0)))

    kernel = functools.partial(_knn_kernel, m=m, k=k)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, nq_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, mpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b, nq_pad, k), jnp.int32),
        ),
        cost_estimate=common.cost_estimate(
            flops=b * nq_pad * mpad * (8 + 3 * k),
            bytes_accessed=b * (mpad * 12 + nq_pad * 12 + nq_pad * k * 8),
            transcendentals=0,
        ),
    )(refs, queries)
    return dist[:, :nq], idx[:, :nq]


def three_nn_pallas(xyz1: jax.Array, xyz2: jax.Array):
    """3-NN of each xyz1 point among xyz2; squared distances (three_nn parity)."""
    return knn_pallas(xyz2, xyz1, 3)


def _knn_sliced_kernel(win_ref, perm_ref, q_ref, dist_ref, idx_ref, *, m: int, k: int):
    """Windowed kNN over a pre-sliced x-sorted block (see knn_sliced).

    win_ref: (1, 1, 3, W) sorted dataset coordinate window (transposed),
    perm_ref: (1, 1, 1, W) each column's ORIGINAL dataset index (m = padded),
    q_ref: (1, 1, TQ, 3) query tile. Distances use the same per-coordinate
    difference-form accumulation as _knn_kernel, so values are bit-identical.
    Tie-break and the removal step key on the ORIGINAL index (perm values are
    unique), which reproduces the full kernel's tie-to-lowest-index semantics
    whenever the window contains every candidate at distance <= the k-th min
    (certified by the wrapper's ``ok`` output).
    """
    w = win_ref.shape[-1]
    tq = q_ref.shape[2]

    d2 = jnp.zeros((tq, w), jnp.float32)
    for c in range(3):
        diff = q_ref[0, 0, :, c : c + 1] - win_ref[0, 0, c : c + 1, :]
        d2 = d2 + diff * diff
    orig = perm_ref[0, 0, 0:1, :]  # (1, W) original indices; padded cols = m
    d2 = jnp.where(orig < m, d2, jnp.float32(jnp.inf))

    dists = []
    idxs = []
    for _ in range(k):
        dmin = jnp.min(block_min(d2), axis=1)  # (TQ,)
        # lowest ORIGINAL index among min-distance ties (the full kernel's
        # col == original-index tie rule, applied through the permutation)
        imin = jnp.min(
            jnp.where(d2 == dmin[:, None], orig, m), axis=1
        ).astype(jnp.int32)
        dists.append(dmin[:, None])
        idxs.append(imin[:, None])
        d2 = jnp.where(orig == imin[:, None], jnp.float32(jnp.inf), d2)

    dist_ref[0, 0] = jnp.concatenate(dists, axis=1)
    idx_ref[0, 0] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_sliced(
    xyz1: jax.Array, xyz2: jax.Array, k: int, window: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Windowed exact kNN with XLA-side window materialization + ok cert.

    Same locality design as ops.pallas.ballquery.ball_query_sliced: dataset
    and queries are x-sorted, each 128-query tile's (3, W) candidate window
    is cut with vmapped ``lax.dynamic_slice`` (windows are CENTERED on the
    tile's x-span — kNN has no radius to bound the span a priori), and a
    fully statically-addressed kernel extracts the k nearest per query.

    Returns ``(dist2, idx, ok)``. ``ok`` is a scalar bool **exactness
    certificate**: for every query, the k-th smallest in-window distance is
    strictly below the squared x-distance to the nearest EXCLUDED sorted
    column on either side — every excluded point is therefore strictly
    farther than all k picks, so the k-NN set, order, and tie resolution
    are identical to :func:`knn_pallas` / the NumPy oracle. When ``ok`` is
    False the results may miss true neighbors and must be discarded
    (recalibrate with a wider window). There is deliberately NO in-graph
    fallback — a TPU ``lax.cond`` costs more than the windowed saving
    (tools/bq_cond_probe.py).

    Reference semantics preserved: ascending distances, tie-to-lowest-index
    (tf_ops/tf_interpolate.cpp:213-243 exact 3-NN).
    """
    b, m, _ = xyz1.shape
    nq = xyz2.shape[1]
    tq = _LANES
    w = _round_up(window, _LANES)
    mpad = _round_up(m, _LANES)
    if w >= m or nq < tq:
        dist, idx = knn_pallas(xyz1, xyz2, k)
        return dist, idx, jnp.ones((), bool)

    x1 = xyz1.astype(jnp.float32)
    x2 = xyz2.astype(jnp.float32)
    perm = jnp.argsort(x1[..., 0], axis=1)  # (B, M)
    xs = jnp.take_along_axis(x1, perm[..., None], axis=1)
    xsx = xs[..., 0]  # (B, M) sorted x
    qperm = jnp.argsort(x2[..., 0], axis=1)  # (B, Nq)
    qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)

    nq_pad = _round_up(nq, tq)
    if nq_pad != nq:
        # Replicate the last (highest-x) sorted query: padded rows compute a
        # real query's result, so the certificate is unaffected.
        qs = jnp.concatenate(
            [qs, jnp.broadcast_to(qs[:, -1:], (b, nq_pad - nq, 3))], axis=1
        )
    t = nq_pad // tq
    q_tiles = qs.reshape(b, t, tq, 3)

    # Center each tile's window on its x-span (no radius exists to bound the
    # true span; the certificate below proves sufficiency per datum).
    lo_l = jax.vmap(jnp.searchsorted)(xsx, q_tiles[..., 0].min(axis=-1))
    lo_r = jax.vmap(jnp.searchsorted)(xsx, q_tiles[..., 0].max(axis=-1))
    mid = ((lo_l + lo_r) // 2).astype(jnp.int32)
    # 128-align lo to the NEAREST multiple (floor-alignment would bias the
    # window left by up to 127 columns, systematically shrinking the right
    # margin); clip against mpad - w, which is itself 128-aligned, so the
    # result stays aligned and the slice stays in bounds. Columns past the
    # real m (padding) are masked in-kernel and excluded from the
    # certificate's right-boundary check (lo + w < m).
    lo = ((mid - w // 2 + _LANES // 2) // _LANES) * _LANES
    lo = jnp.clip(lo, 0, max(mpad - w, 0))

    xs_t = jnp.transpose(xs, (0, 2, 1))  # (B, 3, M)
    perm_in = perm.astype(jnp.int32)[:, None, :]  # (B, 1, M)
    if mpad != m:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, 0), (0, mpad - m)), constant_values=1e30)
        perm_in = jnp.pad(
            perm_in, ((0, 0), (0, 0), (0, mpad - m)), constant_values=m
        )

    cut = jax.vmap(  # over batch
        jax.vmap(  # over tiles
            lambda arr, s: lax.dynamic_slice(arr, (0, s), (arr.shape[0], w)),
            in_axes=(None, 0),
        ),
        in_axes=(0, 0),
    )
    win = cut(xs_t, lo)  # (B, T, 3, W)
    permw = cut(perm_in, lo)  # (B, T, 1, W)

    kernel = functools.partial(_knn_sliced_kernel, m=m, k=k)
    dist_s, idx_s = pl.pallas_call(
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
                (1, 1, tq, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, tq, k), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tq, k), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, tq, k), jnp.float32),
            jax.ShapeDtypeStruct((b, t, tq, k), jnp.int32),
        ),
        cost_estimate=common.cost_estimate(
            flops=b * nq_pad * w * (8 + 4 * k),
            bytes_accessed=b * t * w * 16 + b * nq_pad * 12 + b * nq_pad * k * 8,
            transcendentals=0,
        ),
    )(win, permw, q_tiles)

    # Exactness certificate: the k-th pick must be STRICTLY closer than the
    # squared x-distance to the nearest excluded sorted column on each side
    # (excluded points have |qx - x| >= that bound, so d2 >= bound > kth:
    # no excluded point can enter the k-NN set or tie into its ordering).
    xl = jnp.take_along_axis(xsx, jnp.clip(lo - 1, 0, m - 1), axis=1)  # (B, T)
    xr = jnp.take_along_axis(xsx, jnp.clip(lo + w, 0, m - 1), axis=1)
    qx = q_tiles[..., 0]  # (B, T, TQ)
    bl = jnp.where(
        (lo > 0)[:, :, None],
        jnp.square(jnp.maximum(qx - xl[:, :, None], 0.0)),
        jnp.float32(jnp.inf),
    )
    br = jnp.where(
        (lo + w < m)[:, :, None],
        jnp.square(jnp.maximum(xr[:, :, None] - qx, 0.0)),
        jnp.float32(jnp.inf),
    )
    ok = jnp.all(dist_s[..., k - 1] < jnp.minimum(bl, br))

    dist_sorted = dist_s.reshape(b, nq_pad, k)[:, :nq]
    idx_sorted = idx_s.reshape(b, nq_pad, k)[:, :nq]
    inv = jnp.argsort(qperm, axis=1)
    dist_out = jnp.take_along_axis(dist_sorted, inv[..., None], axis=1)
    idx_out = jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)
    return dist_out, idx_out, ok


def three_nn_sliced(xyz1: jax.Array, xyz2: jax.Array, window: int):
    """Windowed exact 3-NN (three_nn argument order): ``(dist2, idx, ok)``."""
    return knn_sliced(xyz2, xyz1, 3, window)
