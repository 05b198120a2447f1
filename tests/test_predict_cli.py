"""End-to-end predict.py + interpolate.py CLI tests on synthetic scenes.

Covers the two inference drivers the reference anchors on
(/root/reference/predict.py:108-205, /root/reference/interpolate.py:47-127):
multi-sample sparse inference with padded final batches, sparse artifact
writing, KNN densification, and the per-scene/global confusion matrices.
"""

import sys

import jax
import numpy as np

from pointnet2_tpu.config import Config
from pointnet2_tpu.data.io import load_labels, read_pcd, write_labels, write_pcd
from pointnet2_tpu.data.semantic3d import validation_file_prefixes
from pointnet2_tpu.train.trainer import Trainer, save_checkpoint


def _fabricate_validation_scenes(data_dir, rng, n=20_000):
    for prefix in validation_file_prefixes:
        pts = rng.rand(n, 3) * [20.0, 20.0, 4.0]
        labels = np.where(pts[:, 2] < 2.0, 1, 5).astype(np.int32)
        colors = rng.rand(n, 3)
        write_pcd(str(data_dir / f"{prefix}.pcd"), pts, colors)
        write_labels(str(data_dir / f"{prefix}.labels"), labels)


def test_predict_cli_bfloat16_mode(rng, tmp_path, monkeypatch):
    """predict.py --dtype bfloat16 threads the production inference mode
    through to the Trainer and still writes valid sparse artifacts."""
    data_dir = tmp_path / "scenes"
    data_dir.mkdir()
    _fabricate_validation_scenes(data_dir, rng, n=5_000)

    cfg = Config(
        num_point=512,
        batch_size=2,
        data_path=str(data_dir),
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    sparse_dir = tmp_path / "sparse16"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "predict.py",
            "--ckpt", str(ckpt),
            "--set", "validation",
            "--config_file", str(cfg_path),
            "--num_samples", "1",
            "--batch_size", "2",
            "--dtype", "bfloat16",
            "--output_dir", str(sparse_dir),
        ],
    )
    import predict

    predict.main()

    prefix = validation_file_prefixes[0]
    labels = load_labels(sparse_dir / f"{prefix}.labels")
    assert len(labels) == cfg.num_point
    assert labels.min() >= 0 and labels.max() < 9


def test_predict_cli_auto_windows(rng, tmp_path, monkeypatch, capsys):
    """predict.py --bq_window/--fp_window auto self-calibrates from scene
    samples at startup (ops/calibrate.py) and still writes valid artifacts;
    on the CPU XLA path the windows are advisory so outputs are exact."""
    data_dir = tmp_path / "scenes"
    data_dir.mkdir()
    _fabricate_validation_scenes(data_dir, rng, n=5_000)

    cfg = Config(
        num_point=512,
        batch_size=2,
        data_path=str(data_dir),
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    sparse_dir = tmp_path / "sparse_auto"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "predict.py",
            "--ckpt", str(ckpt),
            "--set", "validation",
            "--config_file", str(cfg_path),
            "--num_samples", "1",
            "--batch_size", "2",
            "--bq_window", "auto",
            "--fp_window", "auto",
            "--output_dir", str(sparse_dir),
        ],
    )
    import predict

    predict.main()

    assert "auto window calibration" in capsys.readouterr().out
    prefix = validation_file_prefixes[0]
    labels = load_labels(sparse_dir / f"{prefix}.labels")
    assert len(labels) == cfg.num_point
    assert labels.min() >= 0 and labels.max() < 9


def test_predict_cli_window_certificate_abort(rng, tmp_path, monkeypatch):
    """A failed per-batch window exactness certificate aborts the run with
    an actionable error naming the batch, instead of writing wrong labels.
    The certificate is forced False at the trainer seam (on the CPU XLA
    path the real windows are advisory and always certify)."""
    import jax.numpy as jnp
    import pytest

    data_dir = tmp_path / "scenes"
    data_dir.mkdir()
    _fabricate_validation_scenes(data_dir, rng, n=4_000)

    cfg = Config(
        num_point=512,
        batch_size=2,
        data_path=str(data_dir),
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    orig = Trainer._predict_step_checked

    def failing(self, state, points):
        labels, _ = orig(self, state, points)
        return labels, jnp.zeros((), jnp.bool_)

    monkeypatch.setattr(Trainer, "_predict_step_checked", failing)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "predict.py",
            "--ckpt", str(ckpt),
            "--set", "validation",
            "--config_file", str(cfg_path),
            "--num_samples", "1",
            "--batch_size", "2",
            "--bq_window", "256",
            "--output_dir", str(tmp_path / "sparse_abort"),
        ],
    )
    import predict

    with pytest.raises(ValueError, match="exactness certificate failed on batch"):
        predict.main()


def test_predict_then_interpolate_cli(rng, tmp_path, monkeypatch):
    data_dir = tmp_path / "scenes"
    data_dir.mkdir()
    _fabricate_validation_scenes(data_dir, rng)

    cfg = Config(
        num_point=512,
        batch_size=2,
        data_path=str(data_dir),
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    sparse_dir = tmp_path / "sparse"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "predict.py",
            "--ckpt", str(ckpt),
            "--set", "validation",
            "--config_file", str(cfg_path),
            "--num_samples", "3",   # NOT divisible by batch -> padded last batch
            "--batch_size", "2",
            "--output_dir", str(sparse_dir),
        ],
    )
    import predict

    predict.main()

    for prefix in validation_file_prefixes:
        pcd = read_pcd(sparse_dir / f"{prefix}.pcd")
        labels = load_labels(sparse_dir / f"{prefix}.labels")
        assert len(pcd) == 3 * cfg.num_point  # num_samples * num_point
        assert len(labels) == len(pcd)
        assert labels.min() >= 0 and labels.max() < 9

    dense_dir = tmp_path / "dense"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "interpolate.py",
            "--set", "validation",
            "--sparse_dir", str(sparse_dir),
            "--dense_dir", str(dense_dir),
            "--gt_dir", str(data_dir),
            "--knn", "3",
        ],
    )
    import interpolate

    interpolate.main()

    for prefix in validation_file_prefixes:
        dense_labels = load_labels(dense_dir / f"{prefix}.labels")
        gt = load_labels(data_dir / f"{prefix}.labels")
        assert len(dense_labels) == len(gt)  # one label per dense point
        colored = read_pcd(dense_dir / f"{prefix}_colored.pcd")
        assert len(colored) == len(gt) and colored.colors is not None


def test_predict_cli_sharded_matches_single_device(rng, tmp_path, monkeypatch):
    """--sharded (batch-parallel over the 8-device virtual mesh) writes the
    same labels as the single-device run (modulo argmax near-ties at SPMD
    reduction-order noise)."""
    data_dir = tmp_path / "scenes"
    data_dir.mkdir()
    _fabricate_validation_scenes(data_dir, rng, n=5_000)

    cfg = Config(
        num_point=512,
        batch_size=8,
        data_path=str(data_dir),
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    import predict

    outs = {}
    for mode, extra in (("single", []), ("sharded", ["--sharded"])):
        out_dir = tmp_path / f"sparse_{mode}"
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "predict.py",
                "--ckpt", str(ckpt),
                "--set", "validation",
                "--config_file", str(cfg_path),
                "--num_samples", "8",
                "--batch_size", "8",
                "--output_dir", str(out_dir),
            ] + extra,
        )
        predict.main()
        outs[mode] = np.concatenate([
            load_labels(out_dir / f"{p}.labels")
            for p in validation_file_prefixes
        ])

    agreement = (outs["single"] == outs["sharded"]).mean()
    assert agreement >= 0.995, agreement
