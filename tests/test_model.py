"""Model shape/parity tests: forward shapes per SURVEY §3.4, BN/dropout
behavior, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.config import Config
from pointnet2_tpu.models import PointNet2SemSeg, weighted_ce_loss
from pointnet2_tpu.nn.layers import BatchNorm
from pointnet2_tpu.nn.pointnet import FeaturePropagation, SetAbstraction

# Scaled-down config so CPU tests stay fast; ratios match semantic.json.
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


def _init(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, train=train, bn_momentum=0.9)


class TestSetAbstraction:
    def test_shapes(self, rng):
        xyz = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
        feats = jnp.asarray(rng.rand(2, 128, 6), jnp.float32)
        sa = SetAbstraction(npoint=32, radius=0.4, nsample=8, mlp=[16, 32])
        variables = sa.init(
            jax.random.PRNGKey(0), xyz, feats, train=False, bn_momentum=0.9
        )
        new_xyz, new_points, idx = sa.apply(
            variables, xyz, feats, train=False, bn_momentum=0.9
        )
        assert new_xyz.shape == (2, 32, 3)
        assert new_points.shape == (2, 32, 32)
        assert idx.shape == (2, 32, 8)

    @pytest.mark.parametrize("pooling", ["max", "avg", "weighted_avg", "max_and_avg"])
    def test_pooling_modes(self, rng, pooling):
        xyz = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        sa = SetAbstraction(
            npoint=16, radius=0.5, nsample=4, mlp=[8], pooling=pooling
        )
        variables = sa.init(
            jax.random.PRNGKey(0), xyz, None, train=False, bn_momentum=0.9
        )
        _, new_points, _ = sa.apply(
            variables, xyz, None, train=False, bn_momentum=0.9
        )
        want_c = 16 if pooling == "max_and_avg" else 8
        assert new_points.shape == (1, 16, want_c)

    def test_group_all(self, rng):
        xyz = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        feats = jnp.asarray(rng.rand(1, 64, 4), jnp.float32)
        sa = SetAbstraction(
            npoint=0, radius=0.0, nsample=0, mlp=[8], group_all=True
        )
        variables = sa.init(
            jax.random.PRNGKey(0), xyz, feats, train=False, bn_momentum=0.9
        )
        new_xyz, new_points, _ = sa.apply(
            variables, xyz, feats, train=False, bn_momentum=0.9
        )
        assert new_xyz.shape == (1, 1, 3)
        assert float(jnp.abs(new_xyz).max()) == 0.0
        assert new_points.shape == (1, 1, 8)


    @pytest.mark.parametrize("mode", ["use_knn", "group_all"])
    def test_geometry_rejected_for_non_ball_query_modes(self, rng, mode):
        """Precomputed geometry carries ball-query indices; passing it to a
        kNN/group-all SA must raise instead of silently substituting them."""
        xyz = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        sa = SetAbstraction(
            npoint=16, radius=0.5, nsample=4, mlp=[8], **{mode: True}
        )
        variables = sa.init(
            jax.random.PRNGKey(0), xyz, None, train=False, bn_momentum=0.9
        )
        geom = {
            "new_xyz": jnp.zeros((1, 16, 3), jnp.float32),
            "idx": jnp.zeros((1, 16, 4), jnp.int32),
        }
        with pytest.raises(ValueError, match="ball-query"):
            sa.apply(
                variables, xyz, None, train=False, bn_momentum=0.9,
                geometry=geom,
            )


class TestFeaturePropagation:
    def test_shapes_and_exact_interp_at_source(self, rng):
        # A dense point co-located with a sparse point must (nearly) inherit
        # its feature before the MLP: verified indirectly by shape + finite.
        xyz1 = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
        xyz2 = jnp.asarray(rng.rand(2, 16, 3), jnp.float32)
        p1 = jnp.asarray(rng.rand(2, 64, 5), jnp.float32)
        p2 = jnp.asarray(rng.rand(2, 16, 7), jnp.float32)
        fp = FeaturePropagation(mlp=[32, 16])
        variables = fp.init(
            jax.random.PRNGKey(0), xyz1, xyz2, p1, p2, train=False, bn_momentum=0.9
        )
        out = fp.apply(variables, xyz1, xyz2, p1, p2, train=False, bn_momentum=0.9)
        assert out.shape == (2, 64, 16)
        assert bool(jnp.isfinite(out).all())


class TestBatchNorm:
    def test_train_normalizes_and_updates_stats(self, rng):
        x = jnp.asarray(rng.randn(32, 4) * 3 + 5, jnp.float32)
        bn = BatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), x, train=True, momentum=0.5)
        y, mutated = bn.apply(
            variables, x, train=True, momentum=0.5, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(y.mean(0)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y.std(0)), 1.0, atol=1e-2)
        # moving = 0*0.5 + batch*0.5
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            np.asarray(x.mean(0)) * 0.5,
            rtol=1e-5,
        )

    def test_eval_uses_running_stats(self, rng):
        x = jnp.asarray(rng.randn(8, 4), jnp.float32)
        bn = BatchNorm()
        variables = bn.init(jax.random.PRNGKey(0), x, train=True, momentum=0.9)
        y = bn.apply(variables, x, train=False, momentum=0.9)
        # fresh stats: mean 0 var 1 -> identity modulo epsilon scaling
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x) / np.sqrt(1 + 1e-3), rtol=1e-5
        )


class TestModel:
    def test_forward_shapes(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        model = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        variables = _init(model, x)
        logits = model.apply(variables, x, train=False, bn_momentum=0.9)
        assert logits.shape == (2, SMALL.num_point, 9)
        assert bool(jnp.isfinite(logits).all())

    def test_no_color_variant(self, rng):
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 3), jnp.float32)
        model = PointNet2SemSeg(num_classes=9, use_color=False, config=SMALL)
        variables = _init(model, x)
        logits = model.apply(variables, x, train=False, bn_momentum=0.9)
        assert logits.shape == (1, SMALL.num_point, 9)

    def test_dropout_only_in_train(self, rng):
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        model = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        variables = _init(model, x)
        a = model.apply(variables, x, train=False, bn_momentum=0.9)
        b = model.apply(variables, x, train=False, bn_momentum=0.9)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        t1, _ = model.apply(
            variables,
            x,
            train=True,
            bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        t2, _ = model.apply(
            variables,
            x,
            train=True,
            bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(8)},
            mutable=["batch_stats"],
        )
        assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0

    def test_input_is_leaf_flag_controls_input_gradients(self, rng):
        """input_is_leaf=False restores TRUE input-cloud gradients (saliency /
        adversarial use) with identical logits; the fast default drops SA1's
        grouping contribution (documented wrong-input-grad tradeoff)."""
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        fast = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        full = PointNet2SemSeg(
            num_classes=9, use_color=True, config=SMALL, input_is_leaf=False
        )
        variables = _init(fast, x)

        def loss(model, pts):
            return jnp.sum(model.apply(variables, pts, train=False, bn_momentum=0.9))

        np.testing.assert_allclose(
            np.asarray(fast.apply(variables, x, train=False, bn_momentum=0.9)),
            np.asarray(full.apply(variables, x, train=False, bn_momentum=0.9)),
            atol=1e-5,
        )
        g_fast = jax.grad(lambda p: loss(fast, p))(x)
        g_full = jax.grad(lambda p: loss(full, p))(x)
        # The full path's gradient is the truth: forward-mode JVP (which
        # cannot involve the custom_vjp shortcut) must agree with it along a
        # random direction.
        v = jnp.asarray(rng.randn(*x.shape), jnp.float32)
        _, jvp_val = jax.jvp(lambda p: loss(full, p), (x,), (v,))
        dir_full = float(jnp.vdot(g_full, v))
        assert float(jvp_val) == pytest.approx(dir_full, rel=1e-3)
        # The leaf shortcut measurably drops SA1's grouping term.
        dir_fast = float(jnp.vdot(g_fast, v))
        assert abs(dir_fast - dir_full) > 1e-6 * max(abs(dir_full), 1.0)

    def test_param_count_matches_reference_architecture(self, rng):
        # Channel plan is fixed by SA_MLPS/FP_MLPS; independent of npoint.
        x = jnp.asarray(rng.rand(1, SMALL.num_point, 6), jnp.float32)
        model = PointNet2SemSeg(num_classes=9, use_color=True, config=SMALL)
        variables = _init(model, x)
        n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
        # Computed by hand from SURVEY §3.4 channel plan (dense kernels +
        # biases + BN scale/bias): must stay stable.
        assert 900_000 < n_params < 1_100_000


class TestLoss:
    def test_sum_by_nonzero_weights(self, rng):
        logits = jnp.asarray(rng.randn(2, 8, 5), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 5, (2, 8)))
        w = np.ones((2, 8), np.float32)
        w[0, :4] = 0.0
        got = weighted_ce_loss(logits, labels, jnp.asarray(w))
        logp = jax.nn.log_softmax(logits, -1)
        ce = -np.take_along_axis(np.asarray(logp), np.asarray(labels)[..., None], -1)[
            ..., 0
        ]
        want = (ce * w).sum() / (w != 0).sum()
        np.testing.assert_allclose(float(got), want, rtol=1e-6)

    def test_all_zero_weights_gives_zero(self, rng):
        logits = jnp.asarray(rng.randn(1, 4, 3), jnp.float32)
        labels = jnp.zeros((1, 4), jnp.int32)
        loss = weighted_ce_loss(logits, labels, jnp.zeros((1, 4)))
        assert float(loss) == 0.0


class TestMSGModel:
    """MSG segmentation variant (exercises pointnet_sa_module_msg parity,
    util/pointnet_util.py:219-282 — module present but unused in the
    reference model)."""

    def _cfg(self):
        return Config(num_point=256, l1_npoint=64, l2_npoint=32,
                      l3_npoint=16, l4_npoint=8,
                      l1_nsample=8, l2_nsample=8, l3_nsample=8, l4_nsample=8)

    def test_forward_shape_and_finiteness(self, rng):
        from pointnet2_tpu.models import PointNet2SemSegMSG

        model = PointNet2SemSegMSG(num_classes=9, use_color=True,
                                   config=self._cfg())
        x = rng.randn(2, 256, 6).astype(np.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 256, 9)
        assert np.isfinite(np.asarray(logits)).all()
        # MSG levels concatenate two scales: params exist for both scale
        # branches (pre-projected SetAbstraction submodules; the literal
        # grouped-first-layer layout keeps the mlp_{i} names under
        # pre_project=False — tests/test_preproject.py pins equivalence)
        assert "scale0" in variables["params"]["sa1"]
        assert "scale1" in variables["params"]["sa1"]

    def test_train_step_decreases_loss(self, rng):
        from pointnet2_tpu.models import PointNet2SemSegMSG, weighted_ce_loss
        import optax

        model = PointNet2SemSegMSG(num_classes=9, use_color=True,
                                   config=self._cfg())
        x = rng.randn(2, 256, 6).astype(np.float32)
        labels = (x[..., 2] > 0).astype(np.int32) + 1
        weights = np.ones_like(labels, np.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, rng):
            def loss_fn(p):
                logits, mutated = model.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    bn_momentum=0.9, rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return weighted_ce_loss(logits, labels, weights), mutated
            (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), mutated["batch_stats"], opt_state, loss

        losses = []
        key = jax.random.PRNGKey(2)
        for i in range(15):
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jax.random.fold_in(key, i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestBf16InferenceMode:
    """compute_dtype=bfloat16: same params, f32 geometry, bf16 MLP path."""

    def test_param_tree_and_logits_close(self, rng):
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        m32 = PointNet2SemSeg(config=SMALL)
        m16 = PointNet2SemSeg(config=SMALL, compute_dtype=jnp.bfloat16)
        v = _init(m32, x)
        # identical param structure AND identical init (params stay f32)
        v16 = _init(m16, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            v["params"],
            v16["params"],
        )
        l32 = m32.apply(v, x, train=False, bn_momentum=0.9)
        l16 = m16.apply(v, x, train=False, bn_momentum=0.9)
        assert l16.dtype == jnp.float32  # head keeps f32 logits
        # bf16 has ~3 decimal digits; normalized activations keep the
        # accumulated error small relative to the logit scale.
        scale = float(jnp.abs(l32).max())
        assert float(jnp.abs(l32 - l16).max()) < 0.05 * max(scale, 1.0)

    def test_bn_fold_is_equivalent_in_f32(self, rng):
        """fold_batch_norm: folded eval forward == unfolded (f32)."""
        from pointnet2_tpu.nn.fold import fold_batch_norm
        from pointnet2_tpu.train.trainer import Trainer

        cfg = SMALL.replace(batch_size=4)
        tr = Trainer(cfg=cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        pts = rng.rand(4, cfg.num_point, 6).astype(np.float32)
        labels = 1 + (pts[:, :, 2] > 0.5).astype(np.int32)
        batch = {
            "points": jnp.asarray(pts),
            "labels": jnp.asarray(labels),
            "weights": jnp.ones((4, cfg.num_point), jnp.float32),
        }
        drng = jax.random.PRNGKey(3)
        for _ in range(3):  # move BN stats off their init values
            state, _ = tr.train_step(state, dict(batch), drng)

        l_plain = tr.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"], train=False, bn_momentum=0.9,
        )
        fp, fs = fold_batch_norm(state.params, state.batch_stats)
        l_fold = tr.model.apply(
            {"params": fp, "batch_stats": fs},
            batch["points"], train=False, bn_momentum=0.9,
        )
        np.testing.assert_allclose(
            np.asarray(l_fold), np.asarray(l_plain), atol=2e-3, rtol=1e-3
        )

        # after training a bit, bf16 inference still lands on mostly the
        # same labels (margins at 3 toy steps are weak; the production
        # accuracy measurement is tools/bf16_bench.py on hardware)
        tr16 = Trainer(cfg=cfg, infer_dtype="bfloat16")
        p32 = np.asarray(tr.predict_step(state, batch["points"]))
        p16 = np.asarray(tr16.predict_step(state, batch["points"]))
        assert float(np.mean(p32 == p16)) > 0.8

    def test_unknown_infer_dtype_rejected(self):
        from pointnet2_tpu.train.trainer import Trainer

        with pytest.raises(ValueError, match="infer_dtype"):
            Trainer(cfg=SMALL, infer_dtype="float16")


class TestSelectiveBf16:
    """compute_dtype_min_width: per-stage precision selection (stages
    narrower than the threshold stay f32 — Trainer.bf16_min_width)."""

    def test_threshold_above_all_widths_is_exact_f32(self, rng):
        """min_width larger than every MLP width must reproduce the f32
        model bit-for-bit (every stage dtype resolves to None)."""
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        m32 = PointNet2SemSeg(config=SMALL)
        msel = PointNet2SemSeg(
            config=SMALL, compute_dtype=jnp.bfloat16,
            compute_dtype_min_width=10_000,
        )
        v = _init(m32, x)
        l32 = m32.apply(v, x, train=False, bn_momentum=0.9)
        lsel = msel.apply(v, x, train=False, bn_momentum=0.9)
        np.testing.assert_array_equal(np.asarray(l32), np.asarray(lsel))

    def test_threshold_zero_is_uniform_bf16(self, rng):
        """min_width 0 must reproduce the uniform-bf16 clone bit-for-bit."""
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        m16 = PointNet2SemSeg(config=SMALL, compute_dtype=jnp.bfloat16)
        msel = PointNet2SemSeg(
            config=SMALL, compute_dtype=jnp.bfloat16,
            compute_dtype_min_width=0,
        )
        v = _init(m16, x)
        l16 = m16.apply(v, x, train=False, bn_momentum=0.9)
        lsel = msel.apply(v, x, train=False, bn_momentum=0.9)
        np.testing.assert_array_equal(np.asarray(l16), np.asarray(lsel))

    def test_selective_128_between_f32_and_bf16(self, rng):
        """The production threshold (128): narrow SA1/SA2 run f32, the wide
        stack bf16 — logits differ from BOTH endpoints (the mode is real)
        and the selective error vs f32 is no worse than uniform bf16's."""
        x = jnp.asarray(rng.rand(2, SMALL.num_point, 6), jnp.float32)
        m32 = PointNet2SemSeg(config=SMALL)
        m16 = PointNet2SemSeg(config=SMALL, compute_dtype=jnp.bfloat16)
        msel = PointNet2SemSeg(
            config=SMALL, compute_dtype=jnp.bfloat16,
            compute_dtype_min_width=128,
        )
        v = _init(m32, x)
        l32 = np.asarray(m32.apply(v, x, train=False, bn_momentum=0.9))
        l16 = np.asarray(m16.apply(v, x, train=False, bn_momentum=0.9))
        lsel = np.asarray(msel.apply(v, x, train=False, bn_momentum=0.9))
        assert not np.array_equal(lsel, l32)
        assert not np.array_equal(lsel, l16)
        err_sel = float(np.abs(lsel - l32).max())
        err_16 = float(np.abs(l16 - l32).max())
        assert err_sel <= err_16 * 1.5  # selective never much worse at init

    def test_trainer_wiring_and_validation(self, rng):
        from pointnet2_tpu.train.trainer import Trainer

        cfg = SMALL.replace(batch_size=4)
        tr = Trainer(cfg=cfg, train_dtype="bfloat16", bf16_min_width=128)
        assert tr.train_model.compute_dtype_min_width == 128
        state = tr.init_state(jax.random.PRNGKey(0))
        # params stay f32 (master weights)
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        batch = {
            "points": jnp.asarray(
                rng.rand(4, cfg.num_point, 6).astype(np.float32)
            ),
            "labels": jnp.asarray(
                rng.randint(1, 9, (4, cfg.num_point)).astype(np.int32)
            ),
            "weights": jnp.ones((4, cfg.num_point), jnp.float32),
        }
        losses = []
        for _ in range(8):
            state, metrics = tr.train_step(
                state, dict(batch), jax.random.PRNGKey(1)
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        with pytest.raises(ValueError, match="bf16_min_width"):
            Trainer(cfg=cfg, bf16_min_width=128)  # both dtypes f32

    def test_infer_side_selective_wiring(self, rng):
        """--dtype bfloat16 --bf16_min_width on the inference path: the
        infer model gets the threshold; predictions match the bare
        selective model's argmax (predict.py / export_model wiring)."""
        from pointnet2_tpu.train.trainer import Trainer

        cfg = SMALL.replace(batch_size=2)
        tr = Trainer(cfg=cfg, infer_dtype="bfloat16", bf16_min_width=128)
        assert tr.infer_model.compute_dtype_min_width == 128
        assert tr.train_model.compute_dtype_min_width is None
        state = tr.init_state(jax.random.PRNGKey(0))
        pts = jnp.asarray(rng.rand(2, cfg.num_point, 6), jnp.float32)
        labels = tr.predict_step(state, pts)
        assert labels.shape == (2, cfg.num_point)
        assert bool(jnp.all((labels >= 0) & (labels < 9)))
