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
