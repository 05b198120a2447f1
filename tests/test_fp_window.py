"""Calibrated-window kNN / 3-NN: exactness certificate + model plumbing.

The FP-decoder analogue of the calibrated ball query (tests/test_bq_window.py):
ops.knn_calibrated / three_nn_calibrated sweep only a centered x-sorted
window per query tile and return an `ok` scalar certifying that every
query's k-th pick is strictly closer than any excluded column's x-distance
— when ok is True the outputs are bit-identical to the exact kernel
(tf_ops/tf_interpolate.cpp:213-243 semantics: ascending distances,
tie-to-lowest-index). No in-graph fallback (lax.cond costs more than the
saving on TPU — tools/bq_cond_probe.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import ops
from pointnet2_tpu.config import Config
from pointnet2_tpu.models import PointNet2SemSeg
from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.pallas import knn_sliced, three_nn_sliced
from pointnet2_tpu.train.trainer import Trainer


def _fps_like(x1, m):
    n = x1.shape[1]
    return x1[:, :: n // m][:, :m]


def _box(rng, b, n):
    # Semantic3D z-box regime: long in x so the x-window margin dwarfs the
    # kNN distances (the production data shape the window is calibrated on).
    return (rng.rand(b, n, 3) * [8.0, 1.0, 1.0]).astype(np.float32)


class TestKnnSliced:
    """Index parity is exact; distances compared with allclose on CPU —
    interpret mode accumulates with different FMA contraction than NumPy
    (same policy as test_ops_pallas); hardware bit-exactness is asserted in
    tools/tpu_parity.py."""

    @pytest.mark.parametrize(
        "b,m,nq,k,window",
        [
            (2, 512, 1024, 3, 384),
            (1, 1024, 2048, 3, 512),
            (2, 512, 1024, 4, 256),
        ],
    )
    def test_fitting_window_is_exact(self, rng, b, m, nq, k, window):
        x1 = _box(rng, b, m)  # dataset
        x2 = _box(rng, b, nq)  # queries
        with pltpu.force_tpu_interpret_mode():
            dist, idx, ok = knn_sliced(x1, x2, k, window)
        assert bool(ok), "calibrated window must fit on this data"
        want_d, want_i = reference.knn_np(x1, x2, k)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-5, atol=1e-6)

    def test_too_small_window_is_detected(self, rng):
        # A flat-in-x dataset (all x equal) makes the x-window useless for
        # bounding 3D distance: far-in-y points are excluded by column
        # position while being arbitrarily close in x — the certificate
        # must catch it. Window 128 over 1024 columns cannot certify.
        x1 = rng.rand(1, 1024, 3).astype(np.float32)
        x1[..., 0] = 0.5
        x2 = rng.rand(1, 512, 3).astype(np.float32)
        x2[..., 0] = 0.5
        with pltpu.force_tpu_interpret_mode():
            _, _, ok = knn_sliced(x1, x2, 3, 128)
        assert not bool(ok)

    def test_oversized_window_falls_back_to_exact_kernel(self, rng):
        x1 = rng.rand(2, 256, 3).astype(np.float32)
        x2 = rng.rand(2, 512, 3).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            dist, idx, ok = knn_sliced(x1, x2, 3, 512)
        assert bool(ok)
        want_d, want_i = reference.knn_np(x1, x2, 3)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-5, atol=1e-6)

    def test_three_nn_argument_order(self, rng):
        # three_nn(xyz1=queries, xyz2=dataset) — the sliced form must match
        # the oracle in the same order.
        dense = _box(rng, 2, 1024)
        coarse = _box(rng, 2, 512)
        with pltpu.force_tpu_interpret_mode():
            dist, idx, ok = three_nn_sliced(dense, coarse, 384)
        assert bool(ok)
        want_d, want_i = reference.three_nn_np(dense, coarse)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-5, atol=1e-6)

    def test_dispatch_xla_path_ignores_window(self, rng):
        dense = rng.rand(2, 512, 3).astype(np.float32)
        coarse = rng.rand(2, 256, 3).astype(np.float32)
        da, ia = ops.three_nn(dense, coarse, impl="xla")
        db, ib, ok = ops.three_nn_calibrated(dense, coarse, 128, impl="xla")
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))

    def test_unaligned_query_count_pads_safely(self, rng):
        # nq not a multiple of 128: padded rows replicate the last sorted
        # query and are sliced off; results must still match the oracle.
        x1 = _box(rng, 1, 512)
        x2 = _box(rng, 1, 200)
        with pltpu.force_tpu_interpret_mode():
            dist, idx, ok = knn_sliced(x1, x2, 3, 384)
        assert bool(ok)
        want_d, want_i = reference.knn_np(x1, x2, 3)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-5, atol=1e-6)


class TestCalibration:
    def test_required_fp_window_certifies(self, rng):
        # The calibration helper simulates knn_sliced's placement exactly:
        # the width it returns must certify on the same data, and one lane
        # block less must not (minimality), unless it already hit the floor.
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "bq_window_calibrate",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
                "bq_window_calibrate.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        dataset = _box(rng, 2, 512)
        queries = _box(rng, 2, 1024)
        w = mod.required_fp_window(dataset, queries, k=3)
        assert w % 128 == 0
        if w < 512:
            with pltpu.force_tpu_interpret_mode():
                _, _, ok = knn_sliced(dataset, queries, 3, w)
            assert bool(ok)
        if w > 128:
            with pltpu.force_tpu_interpret_mode():
                _, _, ok_small = knn_sliced(dataset, queries, 3, w - 128)
            assert not bool(ok_small)


SMALL = Config(
    num_point=512,
    l1_npoint=128,
    l2_npoint=64,
    l3_npoint=32,
    l4_npoint=16,
    l1_radius=0.2,
    l2_radius=0.4,
    l3_radius=0.8,
    l4_radius=1.6,
    l1_nsample=8,
    l2_nsample=8,
    l3_nsample=8,
    l4_nsample=8,
)


class TestModelPlumbing:
    """fp_window wiring through PointNet2SemSeg / Trainer (XLA path on CPU:
    the window is advisory there, so logits must be IDENTICAL)."""

    def test_model_logits_unchanged_and_ok_sown(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        wind = base.clone(fp_window=64)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        vars_base = base.init(rngs, x, train=False, bn_momentum=0.9)
        logits_base = base.apply(vars_base, x, train=False, bn_momentum=0.9)
        logits_wind, diag = wind.apply(
            vars_base, x, train=False, bn_momentum=0.9, mutable=["diagnostics"]
        )
        np.testing.assert_array_equal(
            np.asarray(logits_base), np.asarray(logits_wind)
        )
        flags = jax.tree.leaves(diag["diagnostics"])
        assert len(flags) == 4, "one certificate per FP level"
        assert all(bool(jnp.all(f)) for f in flags)

    def test_both_windows_sow_eight_certificates(self, rng):
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        wind = base.clone(bq_window=256, fp_window=64)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        vars_base = base.init(rngs, x, train=False, bn_momentum=0.9)
        logits_base = base.apply(vars_base, x, train=False, bn_momentum=0.9)
        logits_wind, diag = wind.apply(
            vars_base, x, train=False, bn_momentum=0.9, mutable=["diagnostics"]
        )
        np.testing.assert_array_equal(
            np.asarray(logits_base), np.asarray(logits_wind)
        )
        flags = jax.tree.leaves(diag["diagnostics"])
        assert len(flags) == 8, "4 SA bq certificates + 4 FP certificates"
        assert all(bool(jnp.all(f)) for f in flags)

    def test_trainer_check_covers_fp_window(self, rng):
        tr = Trainer(cfg=SMALL, fp_window=64)
        state = tr.init_state(jax.random.PRNGKey(0))
        pts = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        assert tr.check_bq_window(state, pts) is True

    def test_train_step_runs_with_fp_window(self, rng):
        tr = Trainer(cfg=SMALL, bq_window=256, fp_window=64)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = {
            "points": jnp.asarray(
                rng.rand(SMALL.batch_size, SMALL.num_point, 6), jnp.float32
            ),
            "labels": jnp.asarray(
                rng.randint(0, 9, (SMALL.batch_size, SMALL.num_point)), jnp.int32
            ),
            "weights": jnp.ones((SMALL.batch_size, SMALL.num_point), jnp.float32),
        }
        state2, metrics = tr.train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1
