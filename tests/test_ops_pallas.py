"""Pallas kernels vs NumPy oracles, run in TPU-interpret mode on CPU."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.pallas import ball_query_pallas, farthest_point_sample_pallas


def _cloud(rng, b, n, scale=2.0):
    return (rng.rand(b, n, 3) * scale).astype(np.float32)


@pytest.mark.parametrize("b,n,m", [(2, 128, 16), (1, 200, 32), (3, 64, 64)])
def test_fps_pallas_matches_numpy(rng, b, n, m):
    xyz = _cloud(rng, b, n)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(farthest_point_sample_pallas(xyz, m))
    want = reference.farthest_point_sample_np(xyz, m)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "b,n,m,radius,nsample",
    [(2, 128, 128, 0.3, 8), (1, 300, 128, 0.5, 4), (2, 64, 32, 0.8, 16)],
)
def test_ball_query_pallas_matches_numpy(rng, b, n, m, radius, nsample):
    xyz1 = _cloud(rng, b, n, scale=1.0)
    xyz2 = _cloud(rng, b, m, scale=1.0)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = ball_query_pallas(xyz1, xyz2, radius, nsample)
    want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, radius, nsample)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


@pytest.mark.parametrize("b,n,m", [(2, 128, 16), (1, 200, 32), (3, 64, 64), (2, 300, 100)])
def test_fps_fused_centroids_match_numpy(rng, b, n, m):
    """Round-3 fused kernel: FPS indices bit-identical to the oracle AND the
    emitted centroids exactly equal to the gathered rows."""
    from pointnet2_tpu.ops.pallas import fps_centroids_pallas

    xyz = _cloud(rng, b, n)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_xyz = fps_centroids_pallas(xyz, m)
    want = reference.farthest_point_sample_np(xyz, m)
    np.testing.assert_array_equal(np.asarray(got_idx), want)
    np.testing.assert_array_equal(
        np.asarray(got_xyz), np.take_along_axis(xyz, want[..., None], axis=1)
    )


def test_fps_centroids_diff_vjp_matches_gather(rng):
    """The fused op's custom VJP == gather's VJP (scatter-add of the
    centroid cotangent)."""
    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.ops.core import farthest_point_sample_xla, gather_points
    from pointnet2_tpu.ops.pallas import fps_centroids_pallas_diff

    xyz = jnp.asarray(_cloud(rng, 2, 128))
    m = 16
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(
            lambda p: jnp.sum(jnp.sin(fps_centroids_pallas_diff(p, m)[1]))
        )(xyz)
    g_ref = jax.grad(
        lambda p: jnp.sum(
            jnp.sin(gather_points(p, farthest_point_sample_xla(p, m)))
        )
    )(xyz)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-6)


@pytest.mark.parametrize("b,m,nq,k", [(2, 100, 128, 3), (1, 64, 256, 5), (2, 16, 128, 3)])
def test_knn_pallas_matches_numpy(rng, b, m, nq, k):
    from pointnet2_tpu.ops.pallas import knn_pallas

    xyz1 = _cloud(rng, b, m)
    xyz2 = _cloud(rng, b, nq)
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = knn_pallas(xyz1, xyz2, k)
    want_d, want_i = reference.knn_np(xyz1, xyz2, k)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5, atol=1e-6)


def test_three_nn_pallas_matches_numpy(rng):
    from pointnet2_tpu.ops.pallas import three_nn_pallas

    xyz1 = _cloud(rng, 2, 200)  # targets
    xyz2 = _cloud(rng, 2, 60)  # references
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = three_nn_pallas(xyz1, xyz2)
    want_d, want_i = reference.three_nn_np(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "b,n,m,radius,nsample,window",
    [
        (2, 1024, 128, 0.1, 8, 256),   # windows fit -> windowed path
        (1, 512, 128, 0.9, 4, 128),    # tight window, may or may not fit
        (2, 512, 256, 0.05, 16, 128),  # tiny balls
    ],
)
def test_ball_query_windowed_matches_numpy(rng, b, n, m, radius, nsample, window):
    from pointnet2_tpu.ops.pallas import ball_query_windowed

    xyz1 = _cloud(rng, b, n, scale=1.0)
    xyz2 = _cloud(rng, b, m, scale=1.0)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = ball_query_windowed(xyz1, xyz2, radius, nsample, window)
    want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, radius, nsample)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_ball_query_windowed_fallback_when_too_dense(rng):
    # All points at the same x -> spans exceed any window -> cond fallback.
    from pointnet2_tpu.ops.pallas import ball_query_windowed

    xyz1 = _cloud(rng, 1, 512, scale=1.0)
    xyz1[:, :, 0] = 0.5
    xyz2 = xyz1[:, :128]
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = ball_query_windowed(xyz1, xyz2, 0.3, 8, 128)
    want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, 0.3, 8)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)


def test_ball_query_pallas_empty_ball(rng):
    xyz1 = np.zeros((1, 64, 3), np.float32)
    xyz2 = np.full((1, 32, 3), 50.0, np.float32)
    with pltpu.force_tpu_interpret_mode():
        idx, cnt = ball_query_pallas(xyz1, xyz2, 0.5, 4)
    assert np.asarray(cnt).sum() == 0
    np.testing.assert_array_equal(np.asarray(idx), 0)


@pytest.mark.parametrize(
    "b,n,m,radius,nsample",
    [(1, 128, 100, 0.4, 8), (2, 96, 37, 0.6, 4), (1, 300, 129, 0.5, 8)],
)
def test_ball_query_pallas_nonmultiple_queries(rng, b, n, m, radius, nsample):
    """Query counts not divisible by the 128 tile must pad, not crash."""
    xyz1 = _cloud(rng, b, n, scale=1.0)
    xyz2 = _cloud(rng, b, m, scale=1.0)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = ball_query_pallas(xyz1, xyz2, radius, nsample)
    want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, radius, nsample)
    assert got_idx.shape == (b, m, nsample) and got_cnt.shape == (b, m)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


class TestThreeInterpolatePallas:
    """Sparse-weight MXU matmul formulation vs the gather oracle."""

    @pytest.mark.parametrize("b,m,n,c", [(2, 64, 256, 128), (1, 16, 128, 512),
                                         (2, 100, 130, 96)])
    def test_forward_matches_oracle(self, rng, b, m, n, c):
        from pointnet2_tpu.ops.pallas import three_interpolate_pallas

        points = rng.randn(b, m, c).astype(np.float32)
        xyz1 = _cloud(rng, b, n)
        xyz2 = _cloud(rng, b, m)
        d2, idx = reference.three_nn_np(xyz1, xyz2)
        weight = reference.interpolation_weights_np(d2).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(three_interpolate_pallas(points, idx, weight))
        want = reference.three_interpolate_np(points, idx, weight)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla_ad(self, rng):
        import jax
        import jax.numpy as jnp

        from pointnet2_tpu.ops.core import three_interpolate as ti_xla
        from pointnet2_tpu.ops.pallas import three_interpolate_pallas

        b, m, n, c = 2, 32, 128, 128
        points = rng.randn(b, m, c).astype(np.float32)
        idx = rng.randint(0, m, size=(b, n, 3)).astype(np.int32)
        weight = rng.rand(b, n, 3).astype(np.float32)
        cot = rng.randn(b, n, c).astype(np.float32)

        def f_ref(p, w):
            return jnp.sum(ti_xla(p, idx, w) * cot)

        def f_pal(p, w):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(three_interpolate_pallas(p, idx, w) * cot)

        gp_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(points, weight)
        # The context must cover the grad call: the backward is now a
        # Pallas kernel too (W^T sparse matmul), traced when the vjp runs.
        with pltpu.force_tpu_interpret_mode():
            gp_pal, gw_pal = jax.grad(f_pal, argnums=(0, 1))(points, weight)
        np.testing.assert_allclose(np.asarray(gp_pal), np.asarray(gp_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-3)


def test_ball_query_windowed_non_multiple_window(rng):
    """Explicit windows are perf hints: non-128-multiples must round up, not
    silently drop trailing columns (regression for the blockwise reduction)."""
    from pointnet2_tpu.ops.pallas import ball_query_windowed

    xyz1 = _cloud(rng, 1, 1024, scale=4.0)
    # mid-band queries so the window path (not the fallback) is exercised
    order = np.argsort(xyz1[0, :, 0])
    xyz2 = xyz1[:, order[256:384]]
    want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, 0.3, 8)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = ball_query_windowed(xyz1, xyz2, 0.3, 8, window=333)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
