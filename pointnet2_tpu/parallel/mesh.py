"""Device-mesh data parallelism.

The reference trains on a single GPU (train.py:333-339) with a host-side
multiprocessing producer as its only parallelism. The TPU-native scale-out
story is a 1-D data-parallel mesh: the batch axis is sharded over ICI,
parameters are replicated, and the gradient all-reduce is the only
collective — inserted automatically by XLA/SPMD when the jitted train step
consumes a batch-sharded array and produces replicated parameters.

Each 8192-point sample fits comfortably on one chip, so no tensor/sequence
parallelism is required for parity; the mesh axis is pluggable for
multi-host batch scaling (DCN only carries the input pipeline).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = BATCH_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place a host batch pytree onto the mesh, sharded along dim 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding), batch)


def pad_batch_to_devices(batch_size: int, num_devices: int) -> int:
    """Smallest per-step batch >= batch_size divisible by the mesh size."""
    return -(-batch_size // num_devices) * num_devices
