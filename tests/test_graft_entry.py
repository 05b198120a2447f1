"""Driver entry points: multi-chip dry run on the virtual CPU mesh, and
multi-host batch helpers."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)


def test_global_batch_from_local():
    from pointnet2_tpu.parallel import create_mesh
    from pointnet2_tpu.parallel.multihost import (
        global_batch_from_local,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()  # no-op single process
    mesh = create_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = global_batch_from_local(batch, mesh)
    assert out["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
