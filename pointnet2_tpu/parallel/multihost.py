"""Multi-host helpers: distributed init and global batch assembly.

For parity the reference needs nothing here (single GPU, train.py:333-339);
this is the scale-out path (SURVEY §7): each host samples its own batch
shard (the Semantic3D sampler is stateless per draw), and
``global_batch_from_local`` assembles the host-local arrays into one global
jax.Array laid out along the mesh's batch axis — DCN carries only input
data, gradients all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet2_tpu.parallel.mesh import BATCH_AXIS


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, tolerating single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch_from_local(local_batch, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Host-local batch pytree -> globally sharded jax.Array pytree.

    Each process contributes its local leading-dim shard; the global batch
    dim is local_dim * process_count.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
