"""Cross-checks of the XLA operators against the NumPy oracles.

Mirrors the reference's op test strategy (tf_ops/test_tf_ops.py,
tf_ops/test_interpolate.py): fixed-seed golden comparisons + gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.ops import core, reference


def _cloud(rng, b=2, n=256, scale=2.0):
    return (rng.rand(b, n, 3) * scale).astype(np.float32)


class TestFPS:
    def test_matches_numpy(self, rng):
        xyz = _cloud(rng, b=3, n=200)
        got = np.asarray(core.farthest_point_sample_xla(xyz, 32))
        want = reference.farthest_point_sample_np(xyz, 32)
        np.testing.assert_array_equal(got, want)

    def test_first_index_zero_and_unique(self, rng):
        xyz = _cloud(rng, b=2, n=128)
        idx = np.asarray(core.farthest_point_sample_xla(xyz, 16))
        assert (idx[:, 0] == 0).all()
        for row in idx:
            assert len(set(row.tolist())) == 16

    def test_spread_better_than_random(self, rng):
        # FPS points should cover the cloud: max point-to-sample distance
        # must be well below that of the first-k prefix.
        xyz = _cloud(rng, b=1, n=512)
        idx = np.asarray(core.farthest_point_sample_xla(xyz, 64))[0]
        d_fps = reference.knn_np(xyz[:, idx], xyz, 1)[0].max()
        d_prefix = reference.knn_np(xyz[:, :64], xyz, 1)[0].max()
        assert d_fps < d_prefix


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.randn(2, 64, 5).astype(np.float32)
        idx = rng.randint(0, 64, size=(2, 10)).astype(np.int32)
        np.testing.assert_allclose(
            np.asarray(core.gather_points(jnp.asarray(pts), jnp.asarray(idx))),
            reference.gather_points_np(pts, idx),
        )

    def test_group(self, rng):
        pts = rng.randn(2, 64, 5).astype(np.float32)
        idx = rng.randint(0, 64, size=(2, 10, 4)).astype(np.int32)
        np.testing.assert_allclose(
            np.asarray(core.group_points(jnp.asarray(pts), jnp.asarray(idx))),
            reference.group_points_np(pts, idx),
        )

    def test_group_grad_is_scatter_add(self, rng):
        # The reference registers a scatter-add gradient by hand
        # (tf_ops/tf_grouping.py:57-61); JAX AD must produce the same thing.
        pts = rng.randn(1, 8, 2).astype(np.float32)
        idx = np.array([[[0, 0, 3], [7, 3, 3]]], dtype=np.int32)

        def f(p):
            return jnp.sum(core.group_points(p, jnp.asarray(idx)) * 2.0)

        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        want = np.zeros_like(pts)
        for q in range(idx.shape[1]):
            for s in range(idx.shape[2]):
                want[0, idx[0, q, s]] += 2.0
        np.testing.assert_allclose(g, want)

    def test_numeric_gradient_check(self, rng):
        # Parallels tf.test.compute_gradient_error < 1e-4 (test_tf_ops.py:38-56).
        with jax.enable_x64(True):
            pts = rng.randn(1, 16, 3)
            idx = rng.randint(0, 16, size=(1, 6, 4)).astype(np.int32)
            tang = rng.randn(*pts.shape)

            def f(p):
                return jnp.sum(jnp.sin(core.group_points(p, jnp.asarray(idx))))

            g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
            eps = 1e-6
            num = (
                f(jnp.asarray(pts + eps * tang)) - f(jnp.asarray(pts - eps * tang))
            ) / (2 * eps)
            assert abs(float(num) - float(np.sum(g * tang))) < 1e-4


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.3, 8), (0.5, 4), (0.1, 16)])
    def test_matches_numpy(self, rng, radius, nsample):
        xyz1 = _cloud(rng, b=2, n=128, scale=1.0)
        xyz2 = xyz1[:, :32]
        got_idx, got_cnt = core.ball_query_xla(xyz1, xyz2, radius, nsample)
        want_idx, want_cnt = reference.ball_query_np(xyz1, xyz2, radius, nsample)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_empty_ball(self):
        xyz1 = np.zeros((1, 4, 3), np.float32)
        xyz2 = np.full((1, 2, 3), 100.0, np.float32)
        idx, cnt = core.ball_query_xla(xyz1, xyz2, 0.5, 3)
        assert np.asarray(cnt).sum() == 0
        np.testing.assert_array_equal(np.asarray(idx), 0)

    def test_pad_with_first(self):
        # One point in ball -> every slot holds its index.
        xyz1 = np.array([[[5, 5, 5], [0, 0, 0], [9, 9, 9]]], np.float32)
        xyz2 = np.array([[[0.05, 0, 0]]], np.float32)
        idx, cnt = core.ball_query_xla(xyz1, xyz2, 0.5, 4)
        np.testing.assert_array_equal(np.asarray(idx)[0, 0], [1, 1, 1, 1])
        assert int(np.asarray(cnt)[0, 0]) == 1


class TestKNNInterp:
    def test_knn_matches_numpy(self, rng):
        xyz1 = _cloud(rng, b=2, n=100)
        xyz2 = _cloud(rng, b=2, n=40)
        got_d, got_i = core.knn_xla(xyz1, xyz2, 5)
        want_d, want_i = reference.knn_np(xyz1, xyz2, 5)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)

    def test_three_nn_golden_seed100(self, rng):
        # Fixed-seed regression in the spirit of tf_ops/test_interpolate.py:7-35.
        xyz1 = rng.rand(1, 16, 3).astype(np.float32)
        xyz2 = rng.rand(1, 8, 3).astype(np.float32)
        d, i = core.three_nn_xla(xyz1, xyz2)
        want_d, want_i = reference.three_nn_np(xyz1, xyz2)
        np.testing.assert_array_equal(np.asarray(i), want_i)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5, atol=1e-6)
        # squared distances, not euclidean
        diff = xyz1[0, 0] - xyz2[0, want_i[0, 0, 0]]
        np.testing.assert_allclose(
            np.asarray(d)[0, 0, 0], np.sum(diff * diff), rtol=1e-5
        )

    def test_three_interpolate(self, rng):
        pts = rng.randn(2, 20, 6).astype(np.float32)
        d2, idx = reference.three_nn_np(rng.rand(2, 30, 3), rng.rand(2, 20, 3))
        w = reference.interpolation_weights_np(d2).astype(np.float32)
        got = core.three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w))
        want = reference.three_interpolate_np(pts, idx, w)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_three_interpolate_gradient(self, rng):
        with jax.enable_x64(True):
            pts = rng.randn(1, 10, 4)
            idx = rng.randint(0, 10, size=(1, 12, 3)).astype(np.int32)
            w = reference.interpolation_weights_np(rng.rand(1, 12, 3))
            tang = rng.randn(*pts.shape)

            def f(p):
                return jnp.sum(
                    jnp.cos(core.three_interpolate(p, jnp.asarray(idx), jnp.asarray(w)))
                )

            g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
            eps = 1e-6
            num = (
                f(jnp.asarray(pts + eps * tang)) - f(jnp.asarray(pts - eps * tang))
            ) / (2 * eps)
            assert abs(float(num) - float(np.sum(g * tang))) < 1e-4

    def test_weights_clamp(self):
        # Zero distance must not produce NaN (1e-10 clamp).
        d2 = np.array([[[0.0, 0.0, 1.0]]], np.float32)
        w = np.asarray(core.interpolation_weights(jnp.asarray(d2)))
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


class TestProbSample:
    def test_matches_numpy(self, rng):
        probs = rng.rand(2, 50).astype(np.float32)
        cdf = np.cumsum(probs, axis=-1)
        u = rng.rand(2, 30).astype(np.float32)
        got = np.asarray(core.prob_sample(jnp.asarray(cdf), jnp.asarray(u)))
        want = reference.prob_sample_np(cdf, u)
        np.testing.assert_array_equal(got, want)

    def test_distribution(self, rng):
        # Composite test in the spirit of test_tf_ops.py:97-133: samples follow
        # the given density.
        probs = np.array([[0.0, 0.7, 0.0, 0.3]], np.float32)
        cdf = np.cumsum(probs, axis=-1)
        u = rng.rand(1, 4000).astype(np.float32)
        s = np.asarray(core.prob_sample(jnp.asarray(cdf), jnp.asarray(u)))
        frac1 = (s == 1).mean()
        assert 0.65 < frac1 < 0.75
        assert ((s == 1) | (s == 3)).all()


class TestSelectionSort:
    """Full-row SelectionSort parity (tf_grouping.cu:93-136)."""

    def test_matches_numpy_oracle(self, rng):
        from pointnet2_tpu.ops import selection_sort
        from pointnet2_tpu.ops.reference import selection_sort_np

        dist = rng.rand(2, 5, 40).astype(np.float32)
        idx, vals = selection_sort(jnp.asarray(dist), 7)
        idx_np, vals_np = selection_sort_np(dist, 7)
        np.testing.assert_array_equal(np.asarray(idx), idx_np)
        np.testing.assert_array_equal(np.asarray(vals), vals_np)

    def test_full_row_is_permutation_and_prefix_sorted(self, rng):
        from pointnet2_tpu.ops import select_top_k

        dist = rng.rand(1, 3, 25).astype(np.float32)
        k = 6
        idx, vals = select_top_k(k, jnp.asarray(dist))
        idx, vals = np.asarray(idx), np.asarray(vals)
        assert idx.shape == dist.shape and vals.shape == dist.shape  # FULL rows
        for j in range(3):
            # full row is a permutation of the input
            assert sorted(idx[0, j].tolist()) == list(range(25))
            np.testing.assert_allclose(np.sort(vals[0, j]), np.sort(dist[0, j]))
            # prefix ascending and equal to the true k smallest
            prefix = vals[0, j, :k]
            assert (np.diff(prefix) >= 0).all()
            np.testing.assert_allclose(prefix, np.sort(dist[0, j])[:k])
            np.testing.assert_allclose(dist[0, j, idx[0, j]], vals[0, j])

    def test_ties_keep_first_occurrence(self):
        from pointnet2_tpu.ops import selection_sort
        from pointnet2_tpu.ops.reference import selection_sort_np

        dist = np.array([[[3.0, 1.0, 1.0, 2.0, 1.0]]], np.float32)
        idx, vals = selection_sort(jnp.asarray(dist), 3)
        idx_np, vals_np = selection_sort_np(dist, 3)
        np.testing.assert_array_equal(np.asarray(idx), idx_np)
        assert idx_np[0, 0, 0] == 1  # first of the tied minima


class TestProjectGroupLeaf:
    """Scatter-free project+group for leaf inputs (ops/core.py).

    The backward must equal autodiff's scatter-add route for every
    parameter gradient (grad_w = gather(inputs, idx)^T @ g identity),
    while returning a zero cotangent for the leaf inputs by construction.
    """

    def _problem(self, rng):
        B, N, M, K, cin, f0 = 2, 64, 16, 8, 6, 32
        inputs = jnp.asarray(rng.randn(B, N, cin), jnp.float32)
        w = jnp.asarray(rng.randn(cin, f0), jnp.float32)
        b = jnp.asarray(rng.randn(f0), jnp.float32)
        idx = jnp.asarray(rng.randint(0, N, (B, M, K)), np.int32)
        cot = jnp.asarray(rng.randn(B, M, K, f0), jnp.float32)
        return inputs, w, b, idx, cot

    def test_forward_bit_identical(self, rng):
        from pointnet2_tpu.ops import group_points, project_group_leaf

        inputs, w, b, idx, _ = self._problem(rng)
        plain = group_points(inputs @ w + b, idx)
        leaf = project_group_leaf(inputs, w, b, idx)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(leaf))

    def test_param_grads_match_autodiff_scatter(self, rng):
        from pointnet2_tpu.ops import group_points, project_group_leaf

        inputs, w, b, idx, cot = self._problem(rng)

        def loss_plain(i_, w_, b_):
            return jnp.vdot(group_points(i_ @ w_ + b_, idx), cot)

        def loss_leaf(i_, w_, b_):
            return jnp.vdot(project_group_leaf(i_, w_, b_, idx), cot)

        gp = jax.grad(loss_plain, argnums=(0, 1, 2))(inputs, w, b)
        gl = jax.grad(loss_leaf, argnums=(0, 1, 2))(inputs, w, b)
        np.testing.assert_allclose(
            np.asarray(gl[1]), np.asarray(gp[1]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gl[2]), np.asarray(gp[2]), rtol=1e-5, atol=1e-5
        )
        # leaf contract: inputs' cotangent is exactly zero
        assert np.all(np.asarray(gl[0]) == 0.0)
        # ...whereas the plain route's is not (sanity that the test bites)
        assert np.any(np.asarray(gp[0]) != 0.0)
