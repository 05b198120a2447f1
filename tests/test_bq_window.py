"""Calibrated-window ball query: exactness certificate + model plumbing.

The production fast path (ops.ball_query_calibrated / ball_query_sliced)
sweeps only an x-sorted window per query tile and returns an `ok` scalar
certifying the window covered every candidate — when ok is True the outputs
are bit-identical to the exact kernel (tf_ops/tf_grouping.cu:3-43
semantics). There is deliberately no in-graph fallback: lax.cond costs more
on TPU than the windowed saving (tools/bq_cond_probe.py, ROADMAP.md).
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
from pointnet2_tpu.ops.pallas import ball_query_sliced
from pointnet2_tpu.train.trainer import Trainer


def _fps_like(x1, m):
    n = x1.shape[1]
    return x1[:, :: n // m][:, :m]


class TestBallQuerySliced:
    @pytest.mark.parametrize(
        "b,n,m,radius,nsample,window",
        [
            (2, 2048, 256, 0.05, 16, 1536),
            (1, 1024, 256, 0.03, 8, 768),
            (2, 1536, 256, 0.02, 4, 1280),
        ],
    )
    def test_fitting_window_is_bit_exact(self, rng, b, n, m, radius, nsample, window):
        x1 = (rng.rand(b, n, 3)).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, m))
        with pltpu.force_tpu_interpret_mode():
            idx, cnt, ok = ball_query_sliced(x1, x2, radius, nsample, window)
        assert bool(ok), "calibrated window must fit on this data"
        want_idx, want_cnt = reference.ball_query_np(x1, x2, radius, nsample)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

    def test_too_small_window_is_detected(self, rng):
        # One query tile spanning the whole cloud cannot fit a 512 window
        # over 1024 x-sorted columns: the certificate must be False.
        x1 = rng.rand(2, 1024, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        with pltpu.force_tpu_interpret_mode():
            _, _, ok = ball_query_sliced(x1, x2, 0.1, 16, 512)
        assert not bool(ok)

    def test_oversized_window_falls_back_to_exact_kernel(self, rng):
        # window >= n: the static fallback runs the full kernel, ok == True.
        x1 = rng.rand(2, 256, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        with pltpu.force_tpu_interpret_mode():
            idx, cnt, ok = ball_query_sliced(x1, x2, 0.3, 8, 512)
        assert bool(ok)
        want_idx, want_cnt = reference.ball_query_np(x1, x2, 0.3, 8)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

    def test_dispatch_xla_path_ignores_window(self, rng):
        x1 = rng.rand(2, 512, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        ia, ca = ops.ball_query(x1, x2, 0.1, 8, impl="xla")
        ib, cb, ok = ops.ball_query_calibrated(x1, x2, 0.1, 8, 128, impl="xla")
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


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
    """bq_window wiring through PointNet2SemSeg / Trainer (XLA path on CPU:
    the window is advisory there, so logits must be IDENTICAL — this pins
    the flax plumbing, while TestBallQuerySliced pins the kernel)."""

    def test_model_logits_unchanged_and_ok_sown(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        wind = base.clone(bq_window=256)
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
        assert len(flags) == 4, "one certificate per SA level"
        assert all(bool(jnp.all(f)) for f in flags)

    def test_msg_model_logits_unchanged_and_ok_sown(self, rng):
        from pointnet2_tpu.models import PointNet2SemSegMSG

        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSegMSG(num_classes=9, use_color=True, config=SMALL)
        wind = base.clone(bq_window=256)
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
        # two MSG levels x two scales + two SSG levels
        assert len(flags) == 6
        assert all(bool(jnp.all(f)) for f in flags)

    def test_params_identical_with_and_without_window(self, rng):
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        wind = base.clone(bq_window=256)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        va = base.init(rngs, x, train=False, bn_momentum=0.9)
        vb = wind.init(rngs, x, train=False, bn_momentum=0.9)
        # init with bq_window also collects the sown "diagnostics"; the
        # LEARNED collections must be byte-identical.
        for coll in ("params", "batch_stats"):
            jax.tree.map(
                np.testing.assert_array_equal,
                jax.tree.map(np.asarray, va[coll]),
                jax.tree.map(np.asarray, vb[coll]),
            )

    def test_trainer_check_bq_window(self, rng):
        tr = Trainer(cfg=SMALL, bq_window=256)
        state = tr.init_state(jax.random.PRNGKey(0))
        pts = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        assert tr.check_bq_window(state, pts) is True
        tr_off = Trainer(cfg=SMALL)
        state_off = tr_off.init_state(jax.random.PRNGKey(0))
        assert tr_off.check_bq_window(state_off, pts) is True

    def test_train_step_runs_with_window(self, rng):
        tr = Trainer(cfg=SMALL, bq_window=256)
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
        # windowed steps must surface the per-batch certificate (the AND of
        # every sown flag) so train.py can abort at the epoch boundary
        assert bool(metrics["window_ok"]) is True

    def _batch(self, rng):
        return {
            "points": jnp.asarray(
                rng.rand(SMALL.batch_size, SMALL.num_point, 6), jnp.float32
            ),
            "labels": jnp.asarray(
                rng.randint(0, 9, (SMALL.batch_size, SMALL.num_point)), jnp.int32
            ),
            "weights": jnp.ones((SMALL.batch_size, SMALL.num_point), jnp.float32),
        }

    def test_train_step_window_ok_metric_accum_and_gating(self, rng):
        # accum path also reports the certificate (AND over microbatches)...
        tr = Trainer(cfg=SMALL, fp_window=128, accum_steps=2)
        state = tr.init_state(jax.random.PRNGKey(0))
        _, metrics = tr.train_step(state, self._batch(rng), jax.random.PRNGKey(2))
        assert bool(metrics["window_ok"]) is True
        # ...and the default (no-window) step's metric pytree is unchanged
        tr_off = Trainer(cfg=SMALL, accum_steps=2)
        state_off = tr_off.init_state(jax.random.PRNGKey(0))
        _, m_off = tr_off.train_step(
            state_off, self._batch(rng), jax.random.PRNGKey(2)
        )
        assert "window_ok" not in m_off

    def test_predict_step_checked_and_eval_certificates(self, rng):
        tr = Trainer(cfg=SMALL, bq_window=256, fp_window=128)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = self._batch(rng)
        labels, ok = tr.predict_step_checked(state, batch["points"])
        assert bool(ok) is True
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(tr.predict_step(state, batch["points"]))
        )
        em = tr.eval_step(state, batch)
        assert bool(em["window_ok"]) is True
        # no-window eval metrics stay unchanged
        tr_off = Trainer(cfg=SMALL)
        state_off = tr_off.init_state(jax.random.PRNGKey(0))
        assert "window_ok" not in tr_off.eval_step(state_off, batch)

    def test_diag_ok_reduction(self):
        from pointnet2_tpu.train.trainer import _diag_ok

        ok = {"SA_0": {"bq_window_ok": (jnp.ones((), jnp.bool_),)}}
        bad = {
            "SA_0": {"bq_window_ok": (jnp.ones((), jnp.bool_),)},
            "FP_1": {"fp_window_ok": (jnp.zeros((), jnp.bool_),)},
        }
        assert bool(_diag_ok(ok)) is True
        assert bool(_diag_ok(bad)) is False
        assert bool(_diag_ok({})) is True


class TestPerLevelWindows:
    """Per-SA-level window sequences (round 5): an int engages one shared
    width everywhere; a 4-tuple picks each level's width independently
    (None entries keep that level exact). XLA path on CPU: logits must be
    IDENTICAL — this pins the per-level plumbing; kernel exactness per
    width is TestBallQuerySliced's job (widths are level-independent)."""

    def _logits_and_diag(self, model, variables, x):
        return model.apply(
            variables, x, train=False, bn_momentum=0.9,
            mutable=["diagnostics"],
        )

    def test_tuple_of_equal_widths_matches_scalar(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        scalar = base.clone(bq_window=256, fp_window=128)
        tup = base.clone(bq_window=(256,) * 4, fp_window=(128,) * 4)
        v = base.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False, bn_momentum=0.9
        )
        ls, ds = self._logits_and_diag(scalar, v, x)
        lt, dt = self._logits_and_diag(tup, v, x)
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(lt))
        assert len(jax.tree.leaves(ds["diagnostics"])) == len(
            jax.tree.leaves(dt["diagnostics"])
        )

    def test_none_entries_keep_levels_exact(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        sel = base.clone(bq_window=(None, 256, None, None))
        v = base.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False, bn_momentum=0.9
        )
        lb = base.apply(v, x, train=False, bn_momentum=0.9)
        lsel, diag = self._logits_and_diag(sel, v, x)
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(lsel))
        # only the single engaged level sows a certificate
        flags = jax.tree.leaves(diag["diagnostics"])
        assert len(flags) == 1
        assert bool(jnp.all(flags[0]))

    def test_trainer_normalizes_lists_and_steps(self, rng):
        tr = Trainer(
            cfg=SMALL, bq_window=[None, 256, None, None],
            fp_window=[128, None, None, None],
        )
        assert tr.bq_window == (None, 256, None, None)
        assert tr.fp_window == (128, None, None, None)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = {
            "points": jnp.asarray(
                rng.rand(SMALL.batch_size, SMALL.num_point, 6), jnp.float32
            ),
            "labels": jnp.asarray(
                rng.randint(0, 9, (SMALL.batch_size, SMALL.num_point)),
                jnp.int32,
            ),
            "weights": jnp.ones(
                (SMALL.batch_size, SMALL.num_point), jnp.float32
            ),
        }
        assert tr.check_bq_window(state, batch["points"]) is True
        _, metrics = tr.train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert bool(metrics["window_ok"]) is True

    def test_precompute_geometry_per_level_matches_scalar(self, rng):
        from pointnet2_tpu.models import precompute_geometry

        pts = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        g_scalar, ok_s = precompute_geometry(
            pts, config=SMALL, bq_window=256, fp_window=128
        )
        g_tuple, ok_t = precompute_geometry(
            pts, config=SMALL, bq_window=(256,) * 4, fp_window=(128,) * 4
        )
        assert bool(ok_s) and bool(ok_t)
        jax.tree.map(
            np.testing.assert_array_equal,
            jax.tree.map(np.asarray, g_scalar),
            jax.tree.map(np.asarray, g_tuple),
        )

    def test_trainer_rejects_unresolved_window_strings(self):
        """The CLI sentinel 'auto' must be resolved BEFORE Trainer
        construction (predict.py/train.py/tools/export_model.py all
        calibrate first); a leaked string fails fast, not deep in a
        kernel (the export_model.py regression this pins)."""
        from pointnet2_tpu.train.trainer import Trainer

        with pytest.raises(TypeError, match="auto"):
            Trainer(cfg=SMALL, bq_window="auto")
        with pytest.raises(TypeError, match="calibrate"):
            Trainer(cfg=SMALL, fp_window="auto")
        with pytest.raises(TypeError, match="fp_window"):
            Trainer(cfg=SMALL, fp_window=(128, "x", None, None))

    def test_msg_model_accepts_per_level_windows(self, rng):
        from pointnet2_tpu.models import PointNet2SemSegMSG

        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        base = PointNet2SemSegMSG(num_classes=9, use_color=True, config=SMALL)
        sel = base.clone(bq_window=(256, None, None, None))
        rngs = {"params": jax.random.PRNGKey(0)}
        v = base.init(rngs, x, train=False, bn_momentum=0.9)
        lb = base.apply(v, x, train=False, bn_momentum=0.9)
        ls, diag = sel.apply(
            v, x, train=False, bn_momentum=0.9, mutable=["diagnostics"]
        )
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(ls))
        # only SA1's two scales sow certificates
        assert len(jax.tree.leaves(diag["diagnostics"])) == 2
