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


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process rendezvous via the coordination service (not Gloo).

    Gloo collective-context creation has a hard 30 s handshake timeout; if
    one process dispatches its first collective while another is still in a
    cold-cache compile, the handshake dies (observed building the
    multi-process train.py CLI). The coordination-service barrier has a
    configurable timeout, so callers align on it before work whose skew
    could exceed 30 s. No-op in single-process runs.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def local_rows(batch, process_index: Optional[int] = None,
               process_count: Optional[int] = None):
    """This process's leading-dim slice of a globally-sampled batch pytree.

    Used by the "replicated" distributed sampling mode (train.py
    --dist_sampling replicated): every process draws the SAME global batch
    from an identically-seeded deterministic sampler and contributes only
    rows [pid*local : (pid+1)*local] — so the assembled global batch is
    bit-identical to a single-process run with the same seed.
    """
    pid = jax.process_index() if process_index is None else process_index
    nproc = jax.process_count() if process_count is None else process_count

    def cut(x):
        x = np.asarray(x)
        if x.shape[0] % nproc:
            raise ValueError(
                f"global batch dim {x.shape[0]} must divide by the process "
                f"count {nproc}"
            )
        local = x.shape[0] // nproc
        return x[pid * local : (pid + 1) * local]

    return jax.tree.map(cut, batch)


def replicate_state_on_mesh(state, mesh: Mesh):
    """Place a host-local (or single-device) state pytree replicated on mesh.

    The multi-process-safe version of
    ``jax.device_put(state, replicated_sharding(mesh))`` (train.py --resume):
    when the mesh spans several processes, device_put rejects targets with
    non-addressable devices, so each process contributes its full local copy
    via make_array_from_process_local_data (every process restored the same
    checkpoint bytes, so the copies agree).
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, state)
