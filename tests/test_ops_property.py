"""Property-based fuzzing: XLA ops vs NumPy oracles on adversarial inputs.

Coordinates are drawn from a COARSE grid so duplicate points and exact
distance ties are common — the hardest regime for the reference's ordering
semantics (first-in-dataset-order ball query, stable-argsort kNN ties, FPS
argmax first-occurrence, selection-sort swap order).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.core import (
    ball_query_xla,
    farthest_point_sample_xla,
    knn_xla,
    prob_sample,
    selection_sort,
    three_interpolate,
)

SETTINGS = dict(max_examples=25, deadline=None)


def _grid_cloud(draw, b, n, levels=5, scale=1.0):
    vals = draw(
        st.lists(
            st.integers(min_value=0, max_value=levels - 1),
            min_size=b * n * 3,
            max_size=b * n * 3,
        )
    )
    return (np.array(vals, np.float32).reshape(b, n, 3) / levels) * scale


@st.composite
def ball_query_case(draw):
    b = draw(st.integers(1, 2))
    n = draw(st.integers(1, 48))
    m = draw(st.integers(1, 24))
    nsample = draw(st.integers(1, 8))
    radius = draw(st.sampled_from([0.05, 0.21, 0.4, 0.75, 2.0]))
    xyz1 = _grid_cloud(draw, b, n)
    xyz2 = _grid_cloud(draw, b, m)
    return xyz1, xyz2, radius, nsample


@given(ball_query_case())
@settings(**SETTINGS)
def test_ball_query_property(case):
    xyz1, xyz2, radius, nsample = case
    gi, gc = ball_query_xla(xyz1, xyz2, radius, nsample)
    wi, wc = reference.ball_query_np(xyz1, xyz2, radius, nsample)
    np.testing.assert_array_equal(np.asarray(gc), wc)
    np.testing.assert_array_equal(np.asarray(gi), wi)


@st.composite
def fps_case(draw):
    b = draw(st.integers(1, 2))
    n = draw(st.integers(1, 40))
    npoint = draw(st.integers(1, n))
    return _grid_cloud(draw, b, n, levels=4), npoint


@given(fps_case())
@settings(**SETTINGS)
def test_fps_property(case):
    xyz, npoint = case
    got = np.asarray(farthest_point_sample_xla(xyz, npoint))
    want = reference.farthest_point_sample_np(xyz, npoint)
    np.testing.assert_array_equal(got, want)


@st.composite
def knn_case(draw):
    b = draw(st.integers(1, 2))
    n = draw(st.integers(1, 32))
    m = draw(st.integers(1, 24))
    k = draw(st.integers(1, min(6, n)))
    return _grid_cloud(draw, b, n, levels=4), _grid_cloud(draw, b, m, levels=4), k


@given(knn_case())
@settings(**SETTINGS)
def test_knn_property(case):
    xyz1, xyz2, k = case
    gd, gi = knn_xla(xyz1, xyz2, k)
    wd, wi = reference.knn_np(xyz1, xyz2, k)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_allclose(np.asarray(gd), wd, rtol=1e-6, atol=1e-7)


@st.composite
def selection_sort_case(draw):
    b = draw(st.integers(1, 2))
    m = draw(st.integers(1, 4))
    n = draw(st.integers(1, 20))
    k = draw(st.integers(1, n))
    vals = draw(
        st.lists(st.integers(0, 6), min_size=b * m * n, max_size=b * m * n)
    )
    dist = np.array(vals, np.float32).reshape(b, m, n) / 6.0
    return dist, k


@given(selection_sort_case())
@settings(**SETTINGS)
def test_selection_sort_property(case):
    dist, k = case
    gi, gv = selection_sort(dist, k)
    wi, wv = reference.selection_sort_np(dist, k)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_array_equal(np.asarray(gv), wv)


@st.composite
def interpolate_case(draw):
    b = draw(st.integers(1, 2))
    m = draw(st.integers(3, 16))
    n = draw(st.integers(1, 20))
    c = draw(st.integers(1, 5))
    pts = _grid_cloud(draw, b, m, levels=6)[..., 0:1]
    points = np.repeat(pts, c, axis=-1)
    idx = np.array(
        draw(st.lists(st.integers(0, m - 1), min_size=b * n * 3, max_size=b * n * 3)),
        np.int32,
    ).reshape(b, n, 3)
    w = np.array(
        draw(st.lists(st.integers(0, 5), min_size=b * n * 3, max_size=b * n * 3)),
        np.float32,
    ).reshape(b, n, 3)
    w = w / np.maximum(w.sum(-1, keepdims=True), 1.0)
    return points.astype(np.float32), idx, w


@given(interpolate_case())
@settings(**SETTINGS)
def test_three_interpolate_property(case):
    points, idx, w = case
    got = np.asarray(three_interpolate(points, idx, w))
    want = reference.three_interpolate_np(points, idx, w)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@given(
    st.integers(1, 2),
    st.integers(2, 30),
    st.integers(1, 10),
    st.integers(0, 2**31 - 1),
)
@settings(**SETTINGS)
def test_prob_sample_property(b, n, m, seed):
    rng = np.random.RandomState(seed % (2**31))
    weights = rng.randint(0, 4, size=(b, n)).astype(np.float32)
    weights[:, -1] = np.maximum(weights[:, -1], 1.0)  # nonzero total
    cdf = np.cumsum(weights, axis=1)
    uniforms = rng.rand(b, m).astype(np.float32)
    got = np.asarray(prob_sample(cdf, uniforms))
    want = reference.prob_sample_np(cdf, uniforms)
    np.testing.assert_array_equal(got, want)
