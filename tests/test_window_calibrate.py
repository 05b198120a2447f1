"""Window self-calibration: ops/calibrate.py + the --bq_window/--fp_window
'auto' CLI modes.

calibrate_model_windows picks ONE width per op that is safe at every level
it engages (a window engages only when it is smaller than that level's
dataset cloud); the runtime certificates (Trainer.check_bq_window) then
guard the choice on real batches. These tests pin the chooser's level
logic, prove the chosen widths certify on the calibration batches via the
real sliced kernels (interpret mode), and drive train.py's 'auto' mode
through the actual CLI.
"""

import sys

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops.calibrate import (
    calibrate_model_windows,
    choose_window,
    required_bq_window,
    required_fp_window,
)


class TestChooseWindow:
    def test_single_level_margin_and_alignment(self):
        # need = ceil(300 * 1.25 / 128) * 128 = 384
        assert choose_window([300], [8192], margin=1.25) == 384

    def test_never_engaging_returns_none(self):
        # No width below the (only) cloud certifies -> disengage everywhere
        assert choose_window([1024], [1024]) is None

    def test_deeper_level_disengaged_by_shallow_choice(self):
        # level0 needs 384; 384 >= 256 so level1 never engages: its (huge)
        # requirement must not inflate the choice
        assert choose_window([300, 10_000], [8192, 256], margin=1.25) == 384

    def test_deeper_engaged_level_raises_choice(self):
        # level0 satisfied at 128, but 128 < 1024 engages level1 (need 256)
        assert choose_window([100, 200], [8192, 1024], margin=1.0) == 256

    def test_uncertifiable_deeper_level_forced_to_fallback(self):
        # level1 cannot certify below its cloud: the choice is raised to the
        # cloud size (disengaging it — exact) while still engaging level0
        assert choose_window([100, 1024], [8192, 1024], margin=1.0) == 1024


def _box(rng, b, n):
    x = np.zeros((b, n, 3), np.float32)
    x[..., :3] = rng.rand(b, n, 3) * [8.0, 1.0, 1.0]
    return x


class TestCalibrateModelWindows:
    def test_chosen_windows_certify_on_calibration_batches(self, rng):
        from pointnet2_tpu import ops
        from pointnet2_tpu.ops.pallas import ball_query_sliced, knn_sliced

        # 512 queries at level 0 = four 128-query tiles: each tile spans only
        # ~a quarter of the x-sorted cloud, so a sub-cloud window can engage
        # (one 128-query tile would always need the full cloud), and the
        # coarse cloud (512) is big enough that the margin-scaled 3-NN
        # window stays below it.
        sa_specs = [(512, 0.3), (64, 0.6)]
        num_point = 2048
        batches = [_box(rng, 1, num_point) for _ in range(3)]
        it = iter(batches)
        bq_w, fp_w = calibrate_model_windows(
            sa_specs=sa_specs,
            num_point=num_point,
            sample_xyz=lambda: next(it),
            num_batches=len(batches),
            margin=1.25,
        )
        # On this regime both ops must actually engage — the test is not
        # allowed to pass vacuously.
        assert bq_w is not None and bq_w % 128 == 0 and bq_w < num_point
        assert fp_w is not None and fp_w % 128 == 0 and fp_w < 512

        # The margin-scaled choice must certify on the very batches it was
        # calibrated from, at every level it engages, via the real kernels.
        import jax

        fps = jax.jit(ops.fps_centroids, static_argnums=1)
        for cloud in batches:
            for npoint, radius in sa_specs:
                _, cent = jax.tree.map(np.asarray, fps(cloud, npoint))
                m = cloud.shape[1]
                if bq_w is not None and bq_w < m:
                    with pltpu.force_tpu_interpret_mode():
                        _, _, ok = ball_query_sliced(
                            cloud, cent, radius, 8, bq_w
                        )
                    assert bool(ok), f"bq_window={bq_w} failed at cloud {m}"
                if fp_w is not None and fp_w < npoint:
                    with pltpu.force_tpu_interpret_mode():
                        _, _, ok = knn_sliced(cent, cloud, 3, fp_w)
                    assert bool(ok), f"fp_window={fp_w} failed at M={npoint}"
                cloud = cent

    def test_flat_x_data_returns_none(self, rng):
        # All-equal x: no x-window can bound 3D distances, every level's
        # requirement is its full cloud -> both slots disengage to None.
        def sample():
            x = rng.rand(1, 512, 3).astype(np.float32)
            x[..., 0] = 0.5
            return x

        bq_w, fp_w = calibrate_model_windows(
            sa_specs=[(128, 0.3)],
            num_point=512,
            sample_xyz=sample,
            num_batches=2,
        )
        assert fp_w is None
        # ball query CAN still window flat-x data if the radius covers the
        # whole span; with x constant every query needs all columns, so the
        # requirement equals the cloud and the slot disengages too
        assert bq_w is None

    def test_required_helpers_are_reexported(self, rng):
        # tools/bq_window_calibrate.py now imports these from the package;
        # keep the signatures stable.
        data = _box(rng, 1, 256)
        queries = _box(rng, 1, 128)
        assert required_bq_window(data, queries, 0.3) > 0
        assert required_fp_window(queries, data) % 128 == 0


class TestBenchSelection:
    """bench.py's production-config pick: only PROVEN-exact configs may be
    timed; anything that changes the logits must fall through."""

    def _setup(self, rng):
        import jax
        import jax.numpy as jnp

        from pointnet2_tpu.config import Config
        from pointnet2_tpu.train.trainer import Trainer

        cfg = Config(
            num_point=512,
            l1_npoint=128,
            l2_npoint=64,
            l3_npoint=32,
            l4_npoint=16,
        )
        trainer = Trainer(cfg=cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.rand(2, cfg.num_point, 6), jnp.float32)
        return cfg, trainer, state, x

    def test_exact_candidate_is_picked(self, rng):
        import bench

        cfg, trainer, state, x = self._setup(rng)
        picked = bench.pick_production_trainer(
            cfg, trainer, state, x, candidates=({"bq_window": 256},)
        )
        assert picked is not trainer and picked.bq_window == 256

    def test_logit_changing_candidate_falls_through(self, rng):
        import bench

        cfg, trainer, state, x = self._setup(rng)
        # bf16 inference changes the logits -> must NOT be picked even
        # though every window certificate trivially holds
        picked = bench.pick_production_trainer(
            cfg, trainer, state, x,
            candidates=({"infer_dtype": "bfloat16"}, {"fp_window": 64}),
        )
        assert picked.infer_dtype == "float32" and picked.fp_window == 64


class TestAutoCLI:
    @pytest.mark.timeout(600)
    def test_train_cli_auto_windows(self, tmp_path):
        from pointnet2_tpu.config import Config
        from pointnet2_tpu.data.io import write_labels, write_pcd
        from pointnet2_tpu.data.semantic3d import (
            train_file_prefixes,
            validation_file_prefixes,
        )

        rng = np.random.RandomState(0)
        data_dir = tmp_path / "scenes"
        data_dir.mkdir()
        for prefix in train_file_prefixes + validation_file_prefixes:
            pts = rng.rand(2000, 3) * [20.0, 20.0, 4.0]
            labels = np.where(pts[:, 2] < 2.0, 1, 5).astype(np.int32)
            write_pcd(str(data_dir / f"{prefix}.pcd"), pts, rng.rand(2000, 3))
            write_labels(str(data_dir / f"{prefix}.labels"), labels)

        cfg = Config(
            num_point=256,
            batch_size=8,
            max_epoch=1,
            data_path=str(data_dir),
            logdir=str(tmp_path / "log"),
            l1_npoint=64,
            l2_npoint=32,
            l3_npoint=16,
            l4_npoint=8,
        )
        cfg_path = tmp_path / "cfg.json"
        cfg.to_json(cfg_path)

        argv = [
            "train.py", "--config_file", str(cfg_path), "--seed", "0",
            "--bq_window", "auto", "--fp_window", "auto",
        ]
        old = sys.argv
        sys.argv = argv
        try:
            import train

            train.main()
        finally:
            sys.argv = old

        text = (tmp_path / "log" / "log_train.txt").read_text()
        assert "auto window calibration" in text
        assert "EPOCH 000" in text and "mean loss" in text
