"""Point-sharded multi-chip ops on the 8-virtual-device CPU mesh.

Each op must be numerically identical to its single-device counterpart —
the point dimension is embarrassingly parallel, so sharding may not change
a single label or index.
"""

import jax
import numpy as np
import pytest

from pointnet2_tpu.ops.core import knn_xla
from pointnet2_tpu.ops.densify import densify_labels
from pointnet2_tpu.parallel import (
    create_mesh,
    densify_labels_sharded,
    knn_sharded,
    three_nn_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return create_mesh(devices)


def test_densify_sharded_matches_single_device(rng, mesh):
    sparse = (rng.rand(500, 3) * 10).astype(np.float32)
    labels = rng.randint(0, 9, size=500).astype(np.int32)
    dense = (rng.rand(10_000, 3) * 10).astype(np.float32)  # not divisible by 8*128
    got = densify_labels_sharded(sparse, labels, dense, knn=3, mesh=mesh)
    want, _ = densify_labels(sparse, labels, dense, knn=3, engine="device")
    assert got.shape == (10_000,)
    np.testing.assert_array_equal(got, want)


def test_densify_sharded_output_is_sharded_work(rng, mesh):
    # every device shard contributes: a tiny cloud per shard still works
    sparse = (rng.rand(50, 3)).astype(np.float32)
    labels = rng.randint(1, 9, size=50).astype(np.int32)
    dense = (rng.rand(1033, 3)).astype(np.float32)
    got = densify_labels_sharded(sparse, labels, dense, knn=1, mesh=mesh)
    want, _ = densify_labels(sparse, labels, dense, knn=1, engine="device")
    np.testing.assert_array_equal(got, want)


def test_knn_sharded_matches_single_device(rng, mesh):
    refs = (rng.rand(700, 3) * 5).astype(np.float32)
    queries = (rng.rand(2_001, 3) * 5).astype(np.float32)
    d2, idx = knn_sharded(refs, queries, k=4, mesh=mesh)
    want_d, want_i = knn_xla(refs[None], queries[None], 4)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i)[0])
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(want_d)[0], rtol=1e-6, atol=1e-6
    )


def test_three_nn_sharded(rng, mesh):
    refs = (rng.rand(300, 3)).astype(np.float32)
    targets = (rng.rand(999, 3)).astype(np.float32)
    d2, idx = three_nn_sharded(targets, refs, mesh)
    assert d2.shape == (999, 3) and idx.shape == (999, 3)
    # ascending distances, valid indices
    assert (np.diff(np.asarray(d2), axis=1) >= 0).all()
    assert np.asarray(idx).max() < 300
