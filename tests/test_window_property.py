"""Property-based fuzzing of the calibrated-window kernels' certificates.

The windowed production mode's ONLY safety property is the exactness
certificate: `ok=True` must imply outputs bit-identical to the exact full
kernels (reference semantics: first-in-dataset-order ball query,
tie-to-lowest-index kNN). Coordinates are drawn from a coarse grid so
duplicate points and exact distance ties are common — the adversarial
regime for both the tie-break rules and the kNN certificate's strict
inequality.

Cross-checks per case:
- soundness: ok=True -> bit-equal to the NumPy oracle;
- ball query's certificate is exactly "every tile's span fit": ok must
  EQUAL the host-side tile math (ops/calibrate.required_bq_window);
- calibration consistency: the width required_fp_window returns must
  certify on the same data (the package math simulates the kernel's
  in-VMEM certificate faithfully).

The grid is DYADIC (half-integer coordinates): every squared distance is
then exactly representable in f32 regardless of summation order, so ties
are EXACT ties (exercising the tie-break rules) rather than 1-ulp
near-ties that interpret mode's different FMA contraction vs NumPy can
legitimately order differently (observed: two distances 6e-8 apart flipped
the 3rd-NN pick — a rounding artifact, not a semantics bug; hardware
bit-exactness is asserted separately in tools/tpu_parity.py).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.calibrate import required_bq_window, required_fp_window
from pointnet2_tpu.ops.pallas import ball_query_sliced, knn_sliced

SETTINGS = dict(max_examples=12, deadline=None)

# Fixed tile-friendly shapes (128-query tiles; 128-multiple windows) so
# interpret-mode tracing is amortized; the randomness is in the coords.
N, M = 256, 128


def _grid_cloud(draw, b, n, levels, scale):
    vals = draw(
        st.lists(
            st.integers(min_value=0, max_value=levels - 1),
            min_size=b * n * 3,
            max_size=b * n * 3,
        )
    )
    return (np.array(vals, np.float32).reshape(b, n, 3) / levels) * scale


@st.composite
def window_case(draw):
    # coarse DYADIC grid (0.5 steps): duplicate points and EXACT ties are
    # common, and every squared distance is exactly representable
    cloud = _grid_cloud(draw, 1, N, levels=8, scale=4.0)
    queries = _grid_cloud(draw, 1, M, levels=8, scale=4.0)
    radius = draw(st.sampled_from([0.25, 0.5, 1.0]))
    window = draw(st.sampled_from([128, 256]))
    return cloud, queries, radius, window


@given(window_case())
@settings(**SETTINGS)
def test_ball_query_certificate_soundness(case):
    cloud, queries, radius, window = case
    with pltpu.force_tpu_interpret_mode():
        idx, cnt, ok = ball_query_sliced(cloud, queries, radius, 8, window)
    req = required_bq_window(cloud, queries, radius)
    # the bq certificate IS the tile-span condition — no slack either way
    assert bool(ok) == (req <= window), (req, window)
    if bool(ok):
        wi, wc = reference.ball_query_np(cloud, queries, radius, 8)
        np.testing.assert_array_equal(np.asarray(idx), wi)
        np.testing.assert_array_equal(np.asarray(cnt), wc)


@given(window_case())
@settings(**SETTINGS)
def test_knn_certificate_soundness(case):
    queries, cloud, _, window = case  # kNN: dataset=M pts, queries=N pts
    with pltpu.force_tpu_interpret_mode():
        dist, idx, ok = knn_sliced(cloud, queries, 3, window)
    if bool(ok):
        wd, wi = reference.knn_np(cloud, queries, 3)
        np.testing.assert_array_equal(np.asarray(idx), wi)
        # dyadic grid: distances are exactly representable -> bit-equal
        np.testing.assert_array_equal(np.asarray(dist), wd)


@given(window_case())
@settings(max_examples=6, deadline=None)
def test_required_fp_window_certifies_on_kernel(case):
    queries, cloud, _, _ = case
    req = required_fp_window(cloud, queries, k=3)
    if req < cloud.shape[1]:  # engages; else static fallback, nothing to pin
        with pltpu.force_tpu_interpret_mode():
            _, _, ok = knn_sliced(cloud, queries, 3, req)
        assert bool(ok), req
