"""Subprocess worker for tests/test_multihost.py.

Runs ONE process of a 2-process jax.distributed CPU job (4 virtual devices
per process, Gloo collectives): initializes the distributed runtime through
``maybe_initialize_distributed``, assembles its local batch shard into a
global array with ``global_batch_from_local``, executes a REAL
Trainer.train_step over the global 8-device mesh, and writes the resulting
loss/metrics to a JSON file for the parent test to compare against a
single-process run of the identical global batch.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

if __name__ == "__main__":
    # env/backend setup MUST precede any jax import side effects when run
    # as a worker; harmless when imported by the test for its constants.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pointnet2_tpu.config import Config

TINY = Config(
    num_point=128, batch_size=8,
    l1_npoint=32, l2_npoint=16, l3_npoint=8, l4_npoint=4,
    l1_radius=0.3, l2_radius=0.6, l3_radius=1.2, l4_radius=2.4,
    l1_nsample=8, l2_nsample=8, l3_nsample=4, l4_nsample=4,
)


def global_batch(rng):
    pts = rng.rand(8, TINY.num_point, 6).astype(np.float32)
    labels = 1 + (pts[:, :, 2] > 0.5).astype(np.int32)
    return {
        "points": pts,
        "labels": labels,
        "weights": np.ones((8, TINY.num_point), np.float32),
    }


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pointnet2_tpu.parallel import create_mesh
    from pointnet2_tpu.parallel.multihost import (
        global_batch_from_local,
        maybe_initialize_distributed,
    )
    from pointnet2_tpu.train.trainer import Trainer

    maybe_initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    mesh = create_mesh()  # global 1-D mesh across BOTH processes
    # every process derives the same global batch, then contributes only its
    # own leading-dim shard (the real multi-host input pattern: each host
    # samples its share; here determinism substitutes for the sampler)
    full = global_batch(np.random.RandomState(0))
    local = {k: v[pid * 4 : (pid + 1) * 4] for k, v in full.items()}
    batch = global_batch_from_local(local, mesh)
    assert batch["points"].shape == (8, TINY.num_point, 6)

    trainer = Trainer(cfg=TINY)
    state = trainer.init_state(jax.random.PRNGKey(0))
    new_state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(7))
    result = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "loss": float(metrics["loss"]),
        "accuracy": float(metrics["accuracy"]),
        "step": int(new_state.step),
        "params_replicated": bool(
            jax.tree.leaves(new_state.params)[0].sharding.is_fully_replicated
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"proc {pid} OK: {result}", flush=True)


if __name__ == "__main__":
    main()
