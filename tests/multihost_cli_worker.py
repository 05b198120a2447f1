"""Subprocess worker for tests/test_multihost_cli.py.

Runs ONE process of a multi-process `train.py` CLI launch (4 virtual CPU
devices per process, Gloo collectives): the REAL CLI entrypoint with the
--dist_* flags — distributed init before any device access, per-process
batch assembly, process-0-only logging, collective orbax checkpoints.

Usage: python multihost_cli_worker.py <pid> <nproc> <port> <cfg.json> \
           [extra train.py args...]
"""

import os
import sys

if __name__ == "__main__":
    # Backend env MUST be set before jax is imported (train.main imports jax).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> None:
    pid, nproc, port, cfg_path = sys.argv[1:5]
    extra = sys.argv[5:]
    sys.argv = [
        "train.py",
        "--config_file", cfg_path,
        "--dist_coordinator", f"localhost:{port}",
        "--dist_num_processes", nproc,
        "--dist_process_id", pid,
    ] + extra

    # The env var alone loses to the axon TPU plugin (tests/conftest.py
    # precedent): pin the CPU backend in-code before any device access.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import train

    train.main()
    print(f"proc {pid} train.py OK", flush=True)


if __name__ == "__main__":
    main()
