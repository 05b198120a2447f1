"""Training smoke tests: loss decreases on synthetic data, schedules match
the reference formulas, checkpoint round-trip, multi-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.parallel import create_mesh, shard_batch
from pointnet2_tpu.train.trainer import (
    Trainer,
    bn_momentum_schedule,
    learning_rate_schedule,
    restore_checkpoint,
    save_checkpoint,
)

TINY = Config(
    num_point=128,
    batch_size=8,
    l1_npoint=32,
    l2_npoint=16,
    l3_npoint=8,
    l4_npoint=4,
    l1_radius=0.3,
    l2_radius=0.6,
    l3_radius=1.2,
    l4_radius=2.4,
    l1_nsample=8,
    l2_nsample=8,
    l3_nsample=4,
    l4_nsample=4,
)


def _synthetic_batch(rng, cfg, b=8):
    """Separable toy task: class depends on z-height."""
    pts = rng.rand(b, cfg.num_point, 6).astype(np.float32)
    labels = 1 + (pts[:, :, 2] > 0.5).astype(np.int32)  # classes 1, 2
    return {
        "points": jnp.asarray(pts),
        "labels": jnp.asarray(labels),
        "weights": jnp.ones((b, cfg.num_point), jnp.float32),
    }


class TestSchedules:
    def test_learning_rate_staircase_and_floor(self):
        cfg = Config(learning_rate=0.001, batch_size=16, decay_step=200000,
                     learning_rate_decay_rate=0.7)
        sched = learning_rate_schedule(cfg)
        assert float(sched(jnp.int32(0))) == pytest.approx(0.001)
        # one staircase drop at step*bs >= decay_step
        step = 200000 // 16
        assert float(sched(jnp.int32(step))) == pytest.approx(0.0007, rel=1e-5)
        assert float(sched(jnp.int32(step - 1))) == pytest.approx(0.001)
        # floor
        assert float(sched(jnp.int32(10**9))) == pytest.approx(1e-5)

    def test_bn_momentum_schedule(self):
        cfg = Config(bn_init_decay=0.5, bn_decay_decay_rate=0.5,
                     bn_decay_clip=0.99, batch_size=16, decay_step=200000)
        sched = bn_momentum_schedule(cfg)
        assert float(sched(0)) == pytest.approx(0.5)  # 1 - 0.5
        step = 200000 // 16
        assert float(sched(step)) == pytest.approx(0.75)  # 1 - 0.25
        assert float(sched(10**8)) == pytest.approx(0.99)  # clip


class TestTrainStep:
    def test_loss_decreases(self, rng):
        trainer = Trainer(cfg=TINY)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)
        assert int(state.step) == 12

    def test_metrics_shapes(self, rng):
        trainer = Trainer(cfg=TINY)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        state, m = trainer.train_step(state, dict(batch), jax.random.PRNGKey(0))
        assert m["confusion"].shape == (9, 9)
        assert int(m["confusion"].sum()) == TINY.batch_size * TINY.num_point
        assert 0.0 <= float(m["accuracy"]) <= 1.0

    def test_eval_deterministic(self, rng):
        trainer = Trainer(cfg=TINY)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        a = trainer.eval_step(state, batch)
        b = trainer.eval_step(state, batch)
        np.testing.assert_array_equal(np.asarray(a["preds"]), np.asarray(b["preds"]))


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        trainer = Trainer(cfg=TINY)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        state, _ = trainer.train_step(state, dict(batch), jax.random.PRNGKey(0))
        path = tmp_path / "ckpt"
        save_checkpoint(path, state)
        template = trainer.init_state(jax.random.PRNGKey(1))
        restored = restore_checkpoint(path, template)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )
        assert int(restored.step) == 1


class TestBF16Train:
    """Mixed-precision training mode (Trainer.train_dtype='bfloat16'):
    bf16 MLP compute, f32 master weights/Adam moments/BN stats/loss."""

    def test_loss_decreases_and_master_state_stays_f32(self, rng):
        trainer = Trainer(cfg=TINY, train_dtype="bfloat16")
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.opt_state):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_first_step_tracks_f32(self, rng):
        """One optimizer step from identical init: the bf16 step must move
        the parameters in the same direction/magnitude as the f32 step
        (loose bound — bf16 has ~3 decimal digits)."""
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(7)
        states = {}
        losses = {}
        for dt in ("float32", "bfloat16"):
            tr = Trainer(cfg=TINY, train_dtype=dt)
            st = tr.init_state(jax.random.PRNGKey(0))
            st, m = tr.train_step(st, dict(batch), drng)
            states[dt], losses[dt] = st, float(m["loss"])
        assert losses["bfloat16"] == pytest.approx(losses["float32"], rel=0.05)
        diffs, norms = [], []
        for a, b in zip(
            jax.tree.leaves(states["float32"].params),
            jax.tree.leaves(states["bfloat16"].params),
        ):
            diffs.append(float(jnp.sum((a - b) ** 2)))
            norms.append(float(jnp.sum(a**2)))
        rel = np.sqrt(sum(diffs) / max(sum(norms), 1e-30))
        assert rel < 0.05, f"bf16 first-step params diverge: rel {rel:.4f}"

    def test_accum_path_runs_bf16(self, rng):
        trainer = Trainer(cfg=TINY, train_dtype="bfloat16", accum_steps=4)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        state, m = trainer.train_step(state, dict(batch), jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        assert int(m["confusion"].sum()) == TINY.batch_size * TINY.num_point

    def test_invalid_dtype_rejected(self):
        with pytest.raises(ValueError, match="train_dtype"):
            Trainer(cfg=TINY, train_dtype="float16")


def _assert_cm_near_equal(cm_a, cm_b):
    """Confusion matrices from sharded vs single-device executions of the
    SAME step. SPMD compilation reassociates reductions (BN batch-moment
    psum across devices); ~1-ulp logit deltas can flip argmax near-ties for
    a handful of points (observed: 1 of 1024). A real sharding bug (wrong
    slice, dropped shard, wrong collective) shifts whole rows — orders of
    magnitude above this bound."""
    cm_a = np.asarray(cm_a)
    cm_b = np.asarray(cm_b)
    assert cm_a.sum() == cm_b.sum()  # every point counted exactly once
    total = int(cm_b.sum())
    l1 = int(np.abs(cm_a - cm_b).sum())
    assert l1 <= max(2, total // 100), f"confusion L1 diff {l1} of {total}"


class TestSharding:
    def test_data_parallel_train_step(self, rng):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        mesh = create_mesh()
        trainer = Trainer(cfg=TINY)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = shard_batch(_synthetic_batch(rng, TINY, b=8), mesh)
        assert len(batch["points"].sharding.device_set) == 8
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after the step
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_matches_single_device(self, rng):
        mesh = create_mesh()
        trainer = Trainer(cfg=TINY)
        state0 = trainer.init_state(jax.random.PRNGKey(0))
        host = _synthetic_batch(rng, TINY, b=8)
        dev_batch = shard_batch(host, mesh)
        _, m_sharded = trainer.train_step(state0, dev_batch, jax.random.PRNGKey(0))
        state1 = trainer.init_state(jax.random.PRNGKey(0))
        _, m_single = trainer.train_step(state1, dict(host), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4
        )
        _assert_cm_near_equal(m_sharded["confusion"], m_single["confusion"])


class TestGradientAccumulation:
    """Trainer(accum_steps=G): one optimizer update from G microbatches."""

    def test_matches_manual_accumulation_oracle(self, rng):
        """Independent recomposition: per-microbatch unnormalized grads,
        summed, normalized by the global nonzero count, one optax update.

        The oracle runs jitted (a plain unrolled Python loop, no scan):
        an EAGER oracle differs by ~3% in update norm purely from
        compilation differences (1-ulp fusion deltas flip ReLU masks /
        ball-query membership at boundaries), which was measured to be
        noise, not semantics — jitted-unrolled vs the trainer's scan is
        bit-exact on this backend. Tolerances are kept tight but nonzero so
        the test survives legitimate ulp-level divergence on other
        backends; a semantic error (wrong normalization, dropped
        microbatch, wrong rng stream) registers at O(0.5..1) relative.
        """
        import optax
        from pointnet2_tpu.models import weighted_ce_sum

        g = 2
        trainer = Trainer(cfg=TINY.replace(optimizer="momentum"), accum_steps=g)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY, b=8)
        drng = jax.random.PRNGKey(7)

        # --- oracle: unrolled-loop recomputation of the documented
        # semantics: strided microbatches, per-microbatch dropout rng
        # fold, sequential ghost-BN stat updates, one global normalization.
        bn_momentum = bn_momentum_schedule(TINY)(state.step)
        rng0 = jax.random.fold_in(drng, state.step)

        @jax.jit
        def oracle(params, stats, opt_state, batch):
            grad_sum = jax.tree.map(jnp.zeros_like, params)
            ce_total = nz_total = 0.0
            for j in range(g):
                pts = batch["points"][j::g]
                labels = batch["labels"][j::g]
                weights = batch["weights"][j::g]

                def f(p, stats=stats, pts=pts, labels=labels,
                      weights=weights, j=j):
                    logits, mut = trainer.model.apply(
                        {"params": p, "batch_stats": stats},
                        pts, train=True, bn_momentum=bn_momentum,
                        rngs={"dropout": jax.random.fold_in(rng0, j)},
                        mutable=["batch_stats"],
                    )
                    s, nz = weighted_ce_sum(logits, labels, weights)
                    return s, (nz, mut["batch_stats"])

                (s, (nz, stats)), grads = jax.value_and_grad(
                    f, has_aux=True
                )(params)
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                ce_total = ce_total + s
                nz_total = nz_total + nz
            denom = jnp.maximum(nz_total, 1.0)
            gn = jax.tree.map(lambda x: x / denom, grad_sum)
            updates, _ = trainer.tx.update(gn, opt_state, params)
            return optax.apply_updates(params, updates), stats, ce_total / denom

        want_params, want_stats, want_loss = oracle(
            state.params, state.batch_stats, state.opt_state, batch
        )
        want_params = jax.tree.map(np.asarray, want_params)
        want_stats = jax.tree.map(np.asarray, want_stats)
        want_loss = float(want_loss)
        p0 = jax.tree.map(np.asarray, state.params)

        # --- the trainer's fused step ---
        new_state, metrics = trainer.train_step(state, dict(batch), drng)
        assert float(metrics["loss"]) == pytest.approx(want_loss, rel=1e-6)

        got_u = np.concatenate(
            [
                (np.asarray(a) - b).ravel()
                for a, b in zip(
                    jax.tree.leaves(new_state.params), jax.tree.leaves(p0)
                )
            ]
        )
        want_u = np.concatenate(
            [
                (a - b).ravel()
                for a, b in zip(jax.tree.leaves(want_params), jax.tree.leaves(p0))
            ]
        )
        norm = np.linalg.norm(want_u)
        assert norm > 0  # the step actually moved the params
        assert np.linalg.norm(got_u - want_u) / norm < 1e-4
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            new_state.batch_stats,
            want_stats,
        )
        assert int(metrics["confusion"].sum()) == 8 * TINY.num_point

    def test_loss_decreases(self, rng):
        trainer = Trainer(cfg=TINY, accum_steps=4)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)

    def test_non_divisible_accum_is_rejected_loudly(self, rng):
        # Misconfiguration must NOT silently fall back to the monolithic
        # step (that would reintroduce the large-batch HBM working set).
        with pytest.raises(ValueError, match="accum_steps"):
            Trainer(cfg=TINY, accum_steps=3)  # 8 % 3 != 0 at construction
        acc = Trainer(cfg=TINY, accum_steps=2)
        batch = _synthetic_batch(rng, TINY, b=5)  # 5 % 2 != 0 at runtime
        s0 = acc.init_state(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="accum_steps"):
            acc.train_step(s0, dict(batch), jax.random.PRNGKey(0))

    def test_bn_accum_rescale_matches_monolithic_on_equal_microbatches(self, rng):
        """bn_accum_rescale=True: momentum**(1/G) per microbatch == momentum
        per optimizer step. With a batch whose G strided microbatches are
        IDENTICAL (duplicated samples), per-microbatch BN moments equal the
        whole-batch moments, so the accum-rescaled stats must land where the
        monolithic step lands (same EMA endpoint)."""
        half = _synthetic_batch(rng, TINY, b=4)
        # strided split ([j::2]) of an interleave-duplicated batch yields two
        # identical microbatches
        dup = {k: jnp.repeat(v, 2, axis=0) for k, v in half.items()}
        acc = Trainer(cfg=TINY, accum_steps=2, bn_accum_rescale=True)
        mono = Trainer(cfg=TINY)
        s_acc = acc.init_state(jax.random.PRNGKey(0))
        s_mono = mono.init_state(jax.random.PRNGKey(0))
        new_acc, _ = acc.train_step(s_acc, dict(dup), jax.random.PRNGKey(3))
        new_mono, _ = mono.train_step(s_mono, dict(dup), jax.random.PRNGKey(3))
        # tolerance: reduction-order ulp noise lands ~1e-5 (different batch
        # shapes); the no-rescale semantic error would be O(0.1) (momentum
        # 0.5 vs 0.25 at step 0), so 1e-4 still discriminates sharply.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            new_acc.batch_stats,
            new_mono.batch_stats,
        )

    def test_sharded_matches_single_device(self, rng):
        mesh = create_mesh()
        trainer = Trainer(cfg=TINY, accum_steps=2)
        state0 = trainer.init_state(jax.random.PRNGKey(0))
        host = _synthetic_batch(rng, TINY, b=8)
        dev_batch = shard_batch(host, mesh)
        _, m_sharded = trainer.train_step(state0, dev_batch, jax.random.PRNGKey(0))
        state1 = trainer.init_state(jax.random.PRNGKey(0))
        _, m_single = trainer.train_step(state1, dict(host), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4
        )
        _assert_cm_near_equal(m_sharded["confusion"], m_single["confusion"])


def test_chunked_inference_matches_unchunked(rng):
    """infer_chunk batches via lax.map must be numerically identical."""
    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer

    cfg = Config(num_point=256, batch_size=8,
                 l1_npoint=64, l2_npoint=32, l3_npoint=16, l4_npoint=8)
    chunked = Trainer(cfg=cfg, infer_chunk=2)
    mono = Trainer(cfg=cfg, infer_chunk=0)
    state = chunked.init_state(jax.random.PRNGKey(0))

    x = rng.randn(8, cfg.num_point, cfg.point_dim).astype(np.float32)
    a = np.asarray(chunked.predict_step(state, x))
    b = np.asarray(mono.predict_step(state, x))
    np.testing.assert_array_equal(a, b)

    la = np.asarray(chunked._infer_logits(state, jnp.asarray(x)))
    lb = np.asarray(mono._infer_logits(state, jnp.asarray(x)))
    np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-6)

    # non-divisible batch falls back to the monolithic forward
    x5 = rng.randn(5, cfg.num_point, cfg.point_dim).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(chunked.predict_step(state, x5)),
        np.asarray(mono.predict_step(state, x5)),
    )


class TestGeometryHoisting:
    """Trainer(hoist_geometry=True, default): full-width neighbor ops
    before the microbatch scan (models.precompute_geometry)."""

    def test_precompute_matches_inline_ops_chain(self, rng):
        """Centroids/indices bit-equal to the per-level inline chain;
        dist2 equal up to XLA-fusion ulp noise (the documented caveat)."""
        from pointnet2_tpu import ops
        from pointnet2_tpu.models import precompute_geometry

        pts = jnp.asarray(rng.rand(4, TINY.num_point, 6).astype(np.float32))
        geom, ok = jax.jit(
            lambda p: precompute_geometry(p, config=TINY)
        )(pts)
        assert bool(ok)  # constant True without windows

        xyz = pts[..., :3]
        for lvl, spec in enumerate(TINY.sa_layers):
            _, new_xyz = ops.fps_centroids(xyz, spec.npoint)
            idx, _ = ops.ball_query(xyz, new_xyz, spec.radius, spec.nsample)
            g = geom["sa"][lvl]
            np.testing.assert_array_equal(
                np.asarray(g["new_xyz"]), np.asarray(new_xyz)
            )
            np.testing.assert_array_equal(np.asarray(g["idx"]), np.asarray(idx))
            xyz = new_xyz

        # FP levels: idx bit-exact, dist2 to the documented ulp tolerance
        # (XLA fuses the hoisted subgraph differently from the inline one).
        xyzs = [pts[..., :3]] + [np.asarray(g["new_xyz"]) for g in geom["sa"]]
        for i in range(4):
            lvl = 3 - i  # target level order matches the FP decoder
            dist2, idx = ops.three_nn(
                jnp.asarray(xyzs[lvl]), jnp.asarray(xyzs[lvl + 1])
            )
            g = geom["fp"][i]
            np.testing.assert_array_equal(np.asarray(g["idx"]), np.asarray(idx))
            np.testing.assert_allclose(
                np.asarray(g["dist2"]), np.asarray(dist2), rtol=1e-6, atol=1e-6
            )

    def test_hoisted_step_matches_unhoisted(self, rng):
        """Same accum step with/without the hoist: loss and BN stats track
        to reassociation tolerance; the momentum update direction agrees
        (momentum is linear in the grads, so 1e-6 grad noise stays 1e-6 —
        a semantic difference registers at O(0.1..1))."""
        cfg = TINY.replace(optimizer="momentum")
        hoisted = Trainer(cfg=cfg, accum_steps=2, hoist_geometry=True)
        inline = Trainer(cfg=cfg, accum_steps=2, hoist_geometry=False)
        s_h = hoisted.init_state(jax.random.PRNGKey(0))
        s_i = inline.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, cfg, b=8)
        p0 = jax.tree.map(np.asarray, s_i.params)

        n_h, m_h = hoisted.train_step(s_h, dict(batch), jax.random.PRNGKey(3))
        n_i, m_i = inline.train_step(s_i, dict(batch), jax.random.PRNGKey(3))

        assert float(m_h["loss"]) == pytest.approx(float(m_i["loss"]), rel=1e-6)
        np.testing.assert_array_equal(
            np.asarray(m_h["confusion"]), np.asarray(m_i["confusion"])
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            n_h.batch_stats,
            n_i.batch_stats,
        )
        got = np.concatenate(
            [(np.asarray(a) - b).ravel()
             for a, b in zip(jax.tree.leaves(n_h.params), jax.tree.leaves(p0))]
        )
        want = np.concatenate(
            [(np.asarray(a) - b).ravel()
             for a, b in zip(jax.tree.leaves(n_i.params), jax.tree.leaves(p0))]
        )
        norm = np.linalg.norm(want)
        assert norm > 0
        assert np.linalg.norm(got - want) / norm < 1e-4

    def test_hoisted_windows_carry_certificates(self, rng):
        """With calibrated windows the hoisted ops produce the exactness
        certificates (the in-model sows are skipped); window_ok must still
        reach the metrics and be True for window >= cloud width."""
        trainer = Trainer(
            cfg=TINY, accum_steps=2, hoist_geometry=True,
            bq_window=4 * TINY.num_point, fp_window=4 * TINY.num_point,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY, b=8)
        _, metrics = trainer.train_step(state, dict(batch), jax.random.PRNGKey(1))
        assert "window_ok" in metrics
        assert bool(metrics["window_ok"])
        assert np.isfinite(float(metrics["loss"]))

    def test_hoist_loss_decreases_bf16(self, rng):
        trainer = Trainer(
            cfg=TINY, accum_steps=4, hoist_geometry=True,
            train_dtype="bfloat16",
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)


class TestMSGArch:
    """Trainer(arch='msg'): the MSG variant as a first-class end-to-end
    choice (the reference ships the MSG module, util/pointnet_util.py:
    219-282, but never trains it)."""

    def test_unknown_arch_rejected(self):
        with pytest.raises(ValueError, match="arch"):
            Trainer(cfg=TINY, arch="ssg2")

    def test_msg_loss_decreases(self, rng):
        trainer = Trainer(cfg=TINY, arch="msg")
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, TINY)
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)

    def test_msg_accum_trains(self, rng):
        """MSG + gradient accumulation with the default hoisted geometry
        (precompute_geometry(arch='msg')): the scan path must accept the
        per-scale geometry pytree and train. Ghost-BN moments +
        per-microbatch dropout folds make the loss legitimately differ
        from the monolithic step (~0.5% at init), so the assertion is
        convergence, not equality — the SSG accumulation oracle tests
        already pin the accumulation math itself."""
        batch = _synthetic_batch(rng, TINY)
        trainer = Trainer(cfg=TINY, arch="msg", accum_steps=2)
        assert trainer.hoist_geometry is True
        state = trainer.init_state(jax.random.PRNGKey(0))
        drng = jax.random.PRNGKey(42)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, dict(batch), drng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.9, (first, last)
        assert int(state.step) == 12

    def test_msg_precompute_matches_inline_ops_chain(self, rng):
        """precompute_geometry(arch='msg'): dense levels carry one
        bit-exact ball-query index set per msg_scales scale; coarse
        levels and FP match the SSG chain."""
        from pointnet2_tpu import ops
        from pointnet2_tpu.models import precompute_geometry
        from pointnet2_tpu.models.pointnet2_seg import msg_scales

        pts = jnp.asarray(rng.rand(4, TINY.num_point, 6).astype(np.float32))
        geom, ok = jax.jit(
            lambda p: precompute_geometry(p, config=TINY, arch="msg")
        )(pts)
        assert bool(ok)

        xyz = pts[..., :3]
        for lvl, spec in enumerate(TINY.sa_layers):
            _, new_xyz = ops.fps_centroids(xyz, spec.npoint)
            g = geom["sa"][lvl]
            np.testing.assert_array_equal(
                np.asarray(g["new_xyz"]), np.asarray(new_xyz)
            )
            if lvl < 2:
                assert isinstance(g["idx"], tuple) and len(g["idx"]) == 2
                for (r, k), got in zip(msg_scales(spec), g["idx"]):
                    idx, _ = ops.ball_query(xyz, new_xyz, r, k)
                    np.testing.assert_array_equal(
                        np.asarray(got), np.asarray(idx)
                    )
            else:
                idx, _ = ops.ball_query(
                    xyz, new_xyz, spec.radius, spec.nsample
                )
                np.testing.assert_array_equal(
                    np.asarray(g["idx"]), np.asarray(idx)
                )
            xyz = new_xyz

    def test_msg_hoisted_step_matches_unhoisted(self, rng):
        """MSG accum step with/without the hoist: loss equal to
        reassociation tolerance, confusion identical, BN stats track."""
        cfg = TINY.replace(optimizer="momentum")
        hoisted = Trainer(cfg=cfg, arch="msg", accum_steps=2,
                          hoist_geometry=True)
        inline = Trainer(cfg=cfg, arch="msg", accum_steps=2,
                         hoist_geometry=False)
        s_h = hoisted.init_state(jax.random.PRNGKey(0))
        s_i = inline.init_state(jax.random.PRNGKey(0))
        batch = _synthetic_batch(rng, cfg, b=8)

        n_h, m_h = hoisted.train_step(s_h, dict(batch), jax.random.PRNGKey(3))
        n_i, m_i = inline.train_step(s_i, dict(batch), jax.random.PRNGKey(3))

        assert float(m_h["loss"]) == pytest.approx(float(m_i["loss"]), rel=1e-6)
        np.testing.assert_array_equal(
            np.asarray(m_h["confusion"]), np.asarray(m_i["confusion"])
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            n_h.batch_stats,
            n_i.batch_stats,
        )

    def test_msg_selective_bf16_infer(self, rng):
        """MSG + selective precision: eval forward (BN-folded bf16) runs
        and the threshold reaches the infer model."""
        trainer = Trainer(
            cfg=TINY, arch="msg", infer_dtype="bfloat16", bf16_min_width=128
        )
        assert trainer.infer_model.compute_dtype_min_width == 128
        state = trainer.init_state(jax.random.PRNGKey(0))
        pts = _synthetic_batch(rng, TINY)["points"]
        labels = trainer.predict_step(state, pts)
        assert labels.shape == (TINY.batch_size, TINY.num_point)
        assert bool(jnp.all((labels >= 0) & (labels < 9)))

    def test_msg_sharded_accum_step_on_mesh(self, rng):
        """MSG production shape under SPMD: accum + hoisted per-scale
        geometry over a batch-sharded 8-device mesh — finite loss,
        params replicated."""
        mesh = create_mesh()
        trainer = Trainer(cfg=TINY, arch="msg", accum_steps=2)
        assert trainer.hoist_geometry is True
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = shard_batch(_synthetic_batch(rng, TINY, b=8), mesh)
        state, metrics = trainer.train_step(
            state, batch, jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(metrics["loss"]))
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_msg_scale_count_mismatch_rejected(self, rng):
        """SetAbstractionMSG validates the per-scale index count of a
        precomputed geometry entry (a silently-dropped scale would change
        the math)."""
        from pointnet2_tpu.nn.pointnet import SetAbstractionMSG

        sa = SetAbstractionMSG(
            npoint=16, radius_list=(0.2, 0.4), nsample_list=(4, 8),
            mlp_list=([8], [8]),
        )
        xyz = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
        v = sa.init({"params": jax.random.PRNGKey(0)}, xyz, None,
                    train=False, bn_momentum=0.9)
        bad = {
            "new_xyz": xyz[:, :16],
            "idx": (jnp.zeros((2, 16, 4), jnp.int32),),  # one set, two scales
        }
        with pytest.raises(ValueError, match="grouping scales"):
            sa.apply(v, xyz, None, train=False, bn_momentum=0.9,
                     geometry=bad)
