"""Densification engines (native C++ / scipy / device) vs the NumPy oracle."""

import numpy as np
import pytest

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.densify import densify_labels
from pointnet2_tpu.utils.colors import LABEL_COLORS_UINT8, label_to_colors


def _problem(rng, ns=300, nd=1000):
    sparse = (rng.rand(ns, 3) * 5).astype(np.float32)
    labels = rng.randint(0, 9, ns).astype(np.int32)
    dense = (rng.rand(nd, 3) * 5).astype(np.float32)
    return sparse, labels, dense


def test_scipy_engine_matches_oracle(rng):
    sparse, labels, dense = _problem(rng)
    got, colors = densify_labels(sparse, labels, dense, knn=3, engine="scipy")
    want = reference.densify_labels_np(sparse, labels, dense, k=3)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(colors, LABEL_COLORS_UINT8[want])


def test_native_engine_matches_oracle(rng):
    from pointnet2_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native lib not built")
    sparse, labels, dense = _problem(rng)
    got, colors = densify_labels(sparse, labels, dense, knn=3, engine="native")
    want = reference.densify_labels_np(sparse, labels, dense, k=3)
    np.testing.assert_array_equal(got, want)


def test_device_engine_matches_oracle(rng):
    sparse, labels, dense = _problem(rng, ns=200, nd=500)
    got, _ = densify_labels(sparse, labels, dense, knn=3, engine="device")
    want = reference.densify_labels_np(sparse, labels, dense, k=3)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_native_knn_exact(rng):
    from pointnet2_tpu.native import get_lib, knn_search_native

    if get_lib() is None:
        pytest.skip("native lib not built")
    data = (rng.rand(500, 3) * 3).astype(np.float32)
    queries = (rng.rand(100, 3) * 3).astype(np.float32)
    idx, d2 = knn_search_native(data, queries, 5)
    want_d2, want_idx = reference.knn_np(data[None], queries[None], 5)
    np.testing.assert_array_equal(idx, want_idx[0])
    np.testing.assert_allclose(d2, want_d2[0], rtol=1e-5, atol=1e-7)


def test_native_lib_is_fresh_build_from_source(rng):
    """The .so is a local build product (untracked): a binary older than
    densify.cpp must be rebuilt by get_lib, never loaded stale."""
    import os
    import time

    import pointnet2_tpu.native as native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    so = native._LIB_PATH
    src = so.parent / "densify.cpp"
    # Backdate the .so so it predates the source, then force a reload.
    os.utime(so, (src.stat().st_mtime - 10, src.stat().st_mtime - 10))
    native._lib = None
    native._load_attempted = False
    assert native._is_stale()
    t0 = time.time()
    lib = native.get_lib()
    assert lib is not None
    # get_lib must have rebuilt: the .so is now at least as new as the source.
    assert so.stat().st_mtime >= src.stat().st_mtime, (
        "stale libpn2native.so was loaded without rebuilding"
    )
    assert so.stat().st_mtime >= t0 - 1
    # And the rebuilt library actually works.
    sparse, labels, dense = _problem(rng, ns=50, nd=100)
    got, _ = densify_labels(sparse, labels, dense, knn=3, engine="native")
    want = reference.densify_labels_np(sparse, labels, dense, k=3)
    np.testing.assert_array_equal(got, want)


def test_knn_larger_than_dataset_clamps(rng):
    sparse = rng.rand(2, 3).astype(np.float32)
    labels = np.array([4, 7], np.int32)
    dense = rng.rand(10, 3).astype(np.float32)
    got, _ = densify_labels(sparse, labels, dense, knn=5, engine="scipy")
    assert set(got.tolist()) <= {4, 7}


def test_label_to_colors():
    got = label_to_colors(np.array([0, 5, 8]))
    np.testing.assert_array_equal(
        got, [[255, 255, 255], [255, 0, 0], [128, 128, 0]]
    )
    with pytest.raises(ValueError):
        label_to_colors(np.array([9]))


def test_device_engine_tiny_sparse_set(rng):
    """sparse count below the 128 tile must not break dynamic_slice bounds."""
    from pointnet2_tpu.ops.densify import densify_labels

    sparse = rng.rand(7, 3).astype(np.float32)
    labels = np.arange(1, 8, dtype=np.int32)
    dense = rng.rand(300, 3).astype(np.float32)
    got, _ = densify_labels(sparse, labels, dense, knn=3, engine="device")
    want, _ = densify_labels(sparse, labels, dense, knn=3, engine="scipy")
    np.testing.assert_array_equal(got, want)


def test_sharded_engine_dispatch(rng):
    from pointnet2_tpu.ops.densify import densify_labels

    sparse = rng.rand(200, 3).astype(np.float32)
    labels = rng.randint(0, 9, 200).astype(np.int32)
    dense = rng.rand(3000, 3).astype(np.float32)
    got, colors = densify_labels(sparse, labels, dense, knn=3, engine="sharded")
    want, _ = densify_labels(sparse, labels, dense, knn=3, engine="device")
    np.testing.assert_array_equal(got, want)
    assert colors.shape == (3000, 3)
