"""Point-sharded multi-chip ops: scale the big-cloud stages over the mesh.

The reference's scale axis is points-per-cloud (hundreds of millions at
densification time, SURVEY §5 "spatial chunking"). Data parallelism covers
training; these helpers shard the POINT dimension over the ICI mesh for the
embarrassingly-parallel big-cloud stages:

- densify_labels_sharded: dense points sharded over the mesh, sparse
  predictions replicated; each chip densifies its shard with the chunked
  brute-force KNN engine. No collectives in the hot loop — the output stays
  sharded until the caller reads it back.
- three_nn_sharded / knn_sharded: queries sharded, references replicated.

All are shard_map programs over the 1-D mesh from parallel.mesh and are
numerically identical to their single-device counterparts (per-point math,
tested on the 8-virtual-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from pointnet2_tpu.parallel.mesh import BATCH_AXIS


def _pad_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map with the varying-axes checker off (these programs are
    collective-free; the checker rejects unvarying loop-carry constants)."""
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # older jax spells it check_rep
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )


def densify_labels_sharded(
    sparse_points,
    sparse_labels,
    dense_points,
    knn: int,
    mesh: Mesh,
    chunk: int = 4096,
):
    """KNN majority-vote densification with the dense cloud sharded over the
    mesh. Returns dense labels (N,) int32 (gathered to host order).

    Exactly the device engine's semantics (ops/densify.py), one shard per
    chip: a D-chip mesh densifies a 10^8-point cloud D times faster — the
    sparse set (10^5-10^6 points) is replicated, so no communication happens
    during the search.
    """
    axis = mesh.axis_names[0] if mesh.axis_names else BATCH_AXIS
    d = mesh.devices.size
    nd = len(dense_points)
    npad = _pad_to(nd, d * 128)
    dp = jnp.asarray(np.asarray(dense_points, np.float32))
    if npad != nd:
        dp = jnp.pad(dp, ((0, npad - nd), (0, 0)))
    sp = jnp.asarray(np.asarray(sparse_points, np.float32))
    sl = jnp.asarray(np.asarray(sparse_labels)).astype(jnp.int32)
    local_chunk = int(min(chunk, npad // d))
    sparse_tile = int(max(1, min(8192, sp.shape[0])))
    k = int(min(knn, sp.shape[0]))

    fn = _densify_sharded_jit(mesh, axis, k, local_chunk, sparse_tile)
    labels = fn(sp, sl, dp)
    return np.asarray(labels)[:nd]


@functools.lru_cache(maxsize=64)
def _densify_sharded_jit(mesh, axis, k, local_chunk, sparse_tile):
    """Jitted shard_map closure cached per (mesh, static params) so repeated
    same-shape calls reuse the compiled program."""
    from pointnet2_tpu.ops.densify import _densify_device_jit

    def local(sp, sl, dp_shard):
        return _densify_device_jit(sp, sl, dp_shard, k, local_chunk, sparse_tile)

    return jax.jit(_shard_map(local, mesh, (P(), P(), P(axis)), P(axis)))


def knn_sharded(xyz_refs, xyz_queries, k: int, mesh: Mesh):
    """Exact k-NN with the QUERY points sharded over the mesh.

    xyz_refs (M, 3) replicated, xyz_queries (N, 3) sharded on dim 0.
    Returns (dist2 (N, k), idx (N, k)) ascending, identical to ops.knn on a
    single device (unbatched variant).
    """
    axis = mesh.axis_names[0] if mesh.axis_names else BATCH_AXIS
    d = mesh.devices.size
    n = len(xyz_queries)
    npad = _pad_to(n, d * 8)
    q = jnp.asarray(np.asarray(xyz_queries, np.float32))
    if npad != n:
        q = jnp.pad(q, ((0, npad - n), (0, 0)))
    refs = jnp.asarray(np.asarray(xyz_refs, np.float32))

    d2, idx = _knn_sharded_jit(mesh, axis, k)(refs, q)
    return d2[:n], idx[:n]


@functools.lru_cache(maxsize=64)
def _knn_sharded_jit(mesh, axis, k):
    from pointnet2_tpu.ops.core import knn_xla

    def local(refs, q_shard):
        d2, idx = knn_xla(refs[None], q_shard[None], k)
        return d2[0], idx[0]

    return jax.jit(_shard_map(local, mesh, (P(), P(axis)), (P(axis), P(axis))))


def three_nn_sharded(xyz_targets, xyz_refs, mesh: Mesh):
    """Sharded exact 3-NN (squared distances), targets sharded over the mesh."""
    return knn_sharded(xyz_refs, xyz_targets, 3, mesh)
