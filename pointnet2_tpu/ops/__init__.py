"""Point-set operators: public API with backend dispatch.

Each operator has:
- a NumPy oracle in ``pointnet2_tpu.ops.reference`` (test golden),
- an XLA implementation in ``pointnet2_tpu.ops.core`` (any backend),
- for the hot ops, a Pallas TPU kernel in ``pointnet2_tpu.ops.pallas``.

The public functions here auto-dispatch: Pallas on TPU, XLA elsewhere.
Pass ``impl="xla"`` / ``impl="pallas"`` to force a path.
"""

from __future__ import annotations

import jax

from pointnet2_tpu.ops.core import (
    ball_query_xla,
    farthest_point_sample_xla,
    gather_points,
    group_points,
    interpolation_weights,
    knn_xla,
    prob_sample,
    project_group_leaf,
    select_top_k,
    selection_sort,
    three_interpolate as three_interpolate_xla,
    three_nn_xla,
)
from pointnet2_tpu.ops.pallas import (
    ball_query_pallas,
    ball_query_sliced,
    ball_query_windowed,
    farthest_point_sample_pallas,
    fps_centroids_pallas_diff,
    knn_pallas,
    knn_sliced,
    project_group_sliced,
    three_interpolate_pallas,
    three_nn_pallas,
    three_nn_sliced,
)

__all__ = [
    "farthest_point_sample",
    "fps_centroids",
    "gather_points",
    "prob_sample",
    "ball_query",
    "ball_query_calibrated",
    "group_points",
    "project_group_leaf",
    "project_group_calibrated",
    "knn",
    "knn_calibrated",
    "select_top_k",
    "selection_sort",
    "three_nn",
    "three_nn_calibrated",
    "three_interpolate",
    "interpolation_weights",
]


def _use_pallas(impl: str | None) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    if impl is not None:
        raise ValueError(f"unknown impl {impl!r}, expected 'xla'/'pallas'/None")
    return jax.default_backend() == "tpu"


def farthest_point_sample(xyz, npoint: int, impl: str | None = None):
    """(B, N, 3) -> (B, npoint) int32 FPS indices (tf_ops/tf_sampling.cu:111)."""
    if _use_pallas(impl):
        return farthest_point_sample_pallas(xyz, npoint)
    return farthest_point_sample_xla(xyz, npoint)


def fps_centroids(xyz, npoint: int, impl: str | None = None):
    """FPS indices AND centroid coordinates in one op.

    (B, N, 3) -> ((B, npoint) int32, (B, npoint, 3)). On TPU the centroids
    are emitted by the FPS kernel itself (they ride the selection sweep for
    free), eliminating the follow-up ``gather_points(xyz, idx)`` — an
    addressing-bound row gather — from every SA level. Values and the VJP
    (scatter-add of the centroid cotangent, tf_ops/tf_sampling.py:54-58)
    are identical to ``gather_points(xyz, farthest_point_sample(xyz))``.
    """
    if _use_pallas(impl):
        return fps_centroids_pallas_diff(xyz, npoint)
    idx = farthest_point_sample_xla(xyz, npoint)
    return idx, gather_points(xyz, idx)


def ball_query(xyz1, xyz2, radius: float, nsample: int, impl: str | None = None):
    """First-nsample-in-ball radius search (tf_ops/tf_grouping.cu:3-43).

    TPU default is the full-width Pallas kernel. The windowed variant
    (impl="windowed": x-sorted locality with an exactness-checked fallback)
    is exact but measured slower end-to-end — its XLA-side sorts and
    permutation gathers cost more than the kernel work it saves (see
    PERFORMANCE.md).
    """
    if impl == "windowed":
        return ball_query_windowed(xyz1, xyz2, radius, nsample)
    if _use_pallas(impl):
        return ball_query_pallas(xyz1, xyz2, radius, nsample)
    return ball_query_xla(xyz1, xyz2, radius, nsample)


def ball_query_calibrated(
    xyz1, xyz2, radius: float, nsample: int, window: int, impl: str | None = None
):
    """Ball query with a calibrated x-window: ``(idx, cnt, ok)``.

    The production fast path for large N (tf_ops/tf_grouping.cu:3-43
    semantics): the dataset and queries are x-sorted, each 128-query tile
    sweeps only a ``window``-wide slice of the sorted cloud, and ``ok`` (a
    scalar bool) certifies that every tile's true candidate span fit — when
    True, outputs are bit-identical to :func:`ball_query`. Measured 1.6-2.3x
    faster than the full kernel at the SA1 regime (PERFORMANCE.md).

    There is intentionally no in-graph fallback when the window is too
    small: ``lax.cond`` costs more on TPU than the entire windowed saving
    (tools/bq_cond_probe.py). Pick ``window`` with
    ``tools/bq_window_calibrate.py`` and monitor ``ok`` (PointNet2SemSeg
    sows it; Trainer.check_bq_window asserts it on real batches).

    On the XLA path (CPU/GPU) the window is ignored: the exact full query
    runs and ``ok`` is constant True.
    """
    if _use_pallas(impl):
        return ball_query_sliced(xyz1, xyz2, radius, nsample, window)
    idx, cnt = ball_query_xla(xyz1, xyz2, radius, nsample)
    return idx, cnt, jax.numpy.ones((), bool)


def project_group_calibrated(
    inputs, w0, b0, xyz, new_xyz, radius: float, nsample: int, window: int,
    impl: str | None = None,
):
    """Fused project + calibrated ball query + windowed grouped gather.

    The production SA1 eval path: equals
    ``group_points(inputs @ w0 + b0, ball_query(xyz, new_xyz, ...))`` but
    on TPU the gather rides two contiguous block DMAs per query tile
    instead of per-row HBM lookups (1.9x the XLA gather at the SA1 shape —
    ops/pallas/wingather.py). Returns
    ``(grouped, idx, cnt, qperm, inv_q, ok)``; when ``qperm`` is not None
    the grouped tensor (only) is in x-sorted-query order — keep per-centroid
    work in that order and un-permute the pooled result with ``inv_q``
    (SetAbstraction._pre_projected does). ``idx``/``cnt`` are always in
    original query order; ``ok`` is the ball_query_calibrated certificate.

    On the XLA path (CPU/GPU) the window is ignored: exact query + plain
    gather, original order (qperm/inv_q None), ok constant True.
    """
    if _use_pallas(impl):
        return project_group_sliced(
            inputs, w0, b0, xyz, new_xyz, radius, nsample, window
        )
    idx, cnt = ball_query_xla(xyz, new_xyz, radius, nsample)
    zp = inputs @ w0 + b0
    return (
        group_points(zp, idx), idx, cnt, None, None,
        jax.numpy.ones((), bool),
    )


def knn(xyz1, xyz2, k: int, impl: str | None = None):
    """k exact nearest neighbors, squared distances (tf_ops/tf_grouping.py:66)."""
    if _use_pallas(impl):
        return knn_pallas(xyz1, xyz2, k)
    return knn_xla(xyz1, xyz2, k)


def knn_calibrated(xyz1, xyz2, k: int, window: int, impl: str | None = None):
    """kNN with a calibrated x-window: ``(dist2, idx, ok)``.

    The kNN analogue of :func:`ball_query_calibrated`: dataset and queries
    are x-sorted, each 128-query tile sweeps only a ``window``-wide centered
    slice of the sorted dataset, and ``ok`` (a scalar bool) certifies
    exactness — every query's k-th pick is strictly closer than the squared
    x-distance to the nearest excluded column, so when True the outputs are
    bit-identical to :func:`knn`. No in-graph fallback (lax.cond costs more
    than the saving on TPU — tools/bq_cond_probe.py); calibrate with
    tools/bq_window_calibrate.py and monitor ``ok``.

    On the XLA path (CPU/GPU) the window is ignored: the exact full query
    runs and ``ok`` is constant True.
    """
    if _use_pallas(impl):
        return knn_sliced(xyz1, xyz2, k, window)
    dist, idx = knn_xla(xyz1, xyz2, k)
    return dist, idx, jax.numpy.ones((), bool)


def three_nn(xyz1, xyz2, impl: str | None = None):
    """Exact 3-NN with squared distances (tf_ops/tf_interpolate.cpp:213-243)."""
    if _use_pallas(impl):
        return three_nn_pallas(xyz1, xyz2)
    return three_nn_xla(xyz1, xyz2)


def three_nn_calibrated(xyz1, xyz2, window: int, impl: str | None = None):
    """Exact 3-NN with a calibrated x-window: ``(dist2, idx, ok)``.

    See :func:`knn_calibrated` (this is its three_nn-argument-order form:
    ``xyz1`` = dense queries, ``xyz2`` = coarse dataset). Used by the FP
    levels when ``fp_window`` is set; datasets not larger than the window
    automatically run the full exact kernel with ``ok`` True.
    """
    if _use_pallas(impl):
        return three_nn_sliced(xyz1, xyz2, window)
    dist, idx = three_nn_xla(xyz1, xyz2)
    return dist, idx, jax.numpy.ones((), bool)


def three_interpolate(
    points, idx, weight, impl: str | None = None, precision: str | None = None
):
    """Inverse-distance 3-point blend (tf_ops/tf_interpolate.cpp:305-330).

    TPU default runs as a sparse-weight MXU matmul (the (N, 3, C) gathered
    intermediate never materializes; ~1e-7 rel vs the gather formulation);
    impl="xla" keeps the exact gather + weighted-sum path.

    ``precision`` is honored on BOTH paths: "highest" (default) keeps the
    accumulation in f32 even for bf16 points (Pallas: f32 MXU passes; XLA:
    f32 gather + weighted sum), "default" runs in the points dtype (Pallas:
    bf16 MXU inputs, ~2x the rate — the production bf16 inference mode).
    """
    if _use_pallas(impl):
        return three_interpolate_pallas(points, idx, weight, precision or "highest")
    return three_interpolate_xla(points, idx, weight, precision)
