#!/usr/bin/env python3
"""Probe: two-stage reduction vs the legacy argmin kNN formulation.

The two-stage reduction (blockwise vreg mins + one cross-lane reduce) is the
PRODUCTION kernel since round 2 (ops/pallas/knn.py); this probe keeps the
legacy full-width argmin+min formulation inlined as _knn_kernel_v1 so the
measured 1.2x claim in PERFORMANCE.md stays reproducible.

Exact semantics in both: ties resolve to the lowest ORIGINAL index.
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

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.pallas.knn import knn_pallas, _round_up
from pointnet2_tpu.utils.bench import slope_time

_LANES = 128


def _knn_kernel_v1(ref_ref, q_ref, dist_ref, idx_ref, *, m: int, k: int):
    """Legacy round-1 formulation: full-width argmin + min per pass."""
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
        imin = jnp.argmin(d2, axis=1).astype(jnp.int32)  # (TQ,)
        dmin = jnp.min(d2, axis=1)  # (TQ,)
        dists.append(dmin[:, None])
        idxs.append(imin[:, None])
        d2 = jnp.where(col == imin[:, None], jnp.float32(jnp.inf), d2)

    dist_ref[0] = jnp.concatenate(dists, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_pallas_v1(xyz1, xyz2, k: int, tq: int | None = None):
    b, m, _ = xyz1.shape
    nq = xyz2.shape[1]
    mpad = _round_up(m, _LANES)
    if tq is None:
        tq = ((512 * 1024 // mpad) // _LANES) * _LANES
        tq = max(_LANES, min(2048, tq))
    tq = min(tq, _round_up(nq, _LANES))

    refs = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if mpad != m:
        refs = jnp.pad(refs, ((0, 0), (0, 0), (0, mpad - m)), constant_values=1e30)
    queries = xyz2.astype(jnp.float32)
    nq_pad = _round_up(nq, tq)
    if nq_pad != nq:
        queries = jnp.pad(queries, ((0, 0), (0, nq_pad - nq), (0, 0)))

    kernel = functools.partial(_knn_kernel_v1, m=m, k=k)
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
    )(refs, queries)
    return dist[:, :nq], idx[:, :nq]


def _knn_kernel_v3(ref_ref, q_ref, dist_ref, idx_ref, *, m: int, k: int):
    """v3: index-tracking two-stage — candidates carry (value, index) so the
    full-width first-index extraction pass disappears; only the masking pass
    still touches the full row. Exact: stage-1 strict < keeps the earliest
    block per lane, and the global first occurrence always survives."""
    mpad = ref_ref.shape[-1]
    tq = q_ref.shape[1]
    nb = mpad // _LANES

    d2 = jnp.zeros((tq, mpad), jnp.float32)
    for c in range(3):
        diff = q_ref[0, :, c : c + 1] - ref_ref[0, c : c + 1, :]
        d2 = d2 + diff * diff
    col = lax.broadcasted_iota(jnp.int32, (tq, mpad), 1)
    d2 = jnp.where(col < m, d2, jnp.float32(jnp.inf))

    dists = []
    idxs = []
    lane = lax.broadcasted_iota(jnp.int32, (tq, _LANES), 1)
    for _ in range(k):
        vals = d2[:, :_LANES]
        idxv = lane
        for b in range(1, nb):
            dv = d2[:, b * _LANES : (b + 1) * _LANES]
            take = dv < vals
            vals = jnp.where(take, dv, vals)
            idxv = jnp.where(take, lane + b * _LANES, idxv)
        dmin = jnp.min(vals, axis=1)
        imin = jnp.min(
            jnp.where(vals == dmin[:, None], idxv, mpad), axis=1
        ).astype(jnp.int32)
        dists.append(dmin[:, None])
        idxs.append(imin[:, None])
        d2 = jnp.where(col == imin[:, None], jnp.float32(jnp.inf), d2)

    dist_ref[0] = jnp.concatenate(dists, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_pallas_v3(xyz1, xyz2, k: int, tq: int | None = None):
    b, m, _ = xyz1.shape
    nq = xyz2.shape[1]
    mpad = _round_up(m, _LANES)
    if tq is None:
        tq = ((512 * 1024 // mpad) // _LANES) * _LANES
        tq = max(_LANES, min(2048, tq))
    tq = min(tq, _round_up(nq, _LANES))

    refs = jnp.transpose(xyz1.astype(jnp.float32), (0, 2, 1))
    if mpad != m:
        refs = jnp.pad(refs, ((0, 0), (0, 0), (0, mpad - m)), constant_values=1e30)
    queries = xyz2.astype(jnp.float32)
    nq_pad = _round_up(nq, tq)
    if nq_pad != nq:
        queries = jnp.pad(queries, ((0, 0), (0, nq_pad - nq), (0, 0)))

    kernel = functools.partial(_knn_kernel_v3, m=m, k=k)
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
    )(refs, queries)
    return dist[:, :nq], idx[:, :nq]


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    B, NQ, M, K = 64, 8192, 1024, 3  # FP4 three_nn shape
    t = (rng.rand(B, NQ, 3) * 10).astype(np.float32)
    s = (rng.rand(B, M, 3) * 10).astype(np.float32)

    wd, wi = reference.three_nn_np(t[:2], s[:2])
    gd, gi = knn_pallas_v1(jnp.asarray(s[:2]), jnp.asarray(t[:2]), K)
    exact = (np.asarray(gi) == wi).all()
    print("legacy-v1 index-exact vs oracle:", exact)
    assert exact

    gd3, gi3 = knn_pallas_v3(jnp.asarray(s[:2]), jnp.asarray(t[:2]), K)
    print("v3 index-exact vs oracle:", bool((np.asarray(gi3) == wi).all()))
    assert (np.asarray(gi3) == wi).all()

    sj, tj = jnp.asarray(s), jnp.asarray(t)
    t1 = slope_time(lambda q: knn_pallas_v1(sj, q, K)[0].sum(), tj)
    t2 = slope_time(lambda q: knn_pallas(sj, q, K)[0].sum(), tj)
    t3 = slope_time(lambda q: knn_pallas_v3(sj, q, K)[0].sum(), tj)
    print(f"FP4 shape: legacy argmin {t1 * 1e3:.2f} ms | "
          f"two-stage (production) {t2 * 1e3:.2f} ms ({t1 / t2:.2f}x) | "
          f"index-tracking {t3 * 1e3:.2f} ms ({t1 / t3:.2f}x)")


if __name__ == "__main__":
    main()
