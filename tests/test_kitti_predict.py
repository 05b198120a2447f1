"""End-to-end kitti_predict.py CLI smoke test on a synthetic drive.

Covers the fused predict+densify path, --save outputs, and the --render PNG
sequence (the headless equivalent of the reference's live visualizer,
/root/reference/kitti_predict.py:107-227)."""

import json
import os
import sys

import jax
import numpy as np

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer, save_checkpoint

from test_kitti import _write_drive


def test_kitti_predict_cli(rng, tmp_path, monkeypatch):
    root = _write_drive(tmp_path, rng, frames=2, n=8000)

    cfg = Config(
        num_point=512,
        use_color=0,
        box_size_x=60.0,
        box_size_y=20.0,
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    config_path = tmp_path / "config.json"
    cfg.to_json(config_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    workdir = tmp_path / "run"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "kitti_predict.py",
            "--ckpt", str(ckpt),
            "--kitti_root", str(root),
            "--config_file", str(config_path),
            "--save",
            "--render",
        ],
    )
    import kitti_predict

    kitti_predict.main()

    dense = sorted((workdir / "result" / "dense").iterdir())
    names = {p.name for p in dense}
    assert {"0000.pcd", "0000.labels", "0001.pcd", "0001.labels"} <= names
    frames = sorted((workdir / "result" / "frames").glob("*.png"))
    assert len(frames) == 2
    assert frames[0].stat().st_size > 10_000  # a real rendered image

    from pointnet2_tpu.data.io import load_labels

    labels = load_labels(str(workdir / "result" / "dense" / "0000.labels"))
    assert labels.ndim == 1 and len(labels) > 0
    assert labels.min() >= 0 and labels.max() < 9


def test_kitti_predict_cli_auto_windows(rng, tmp_path, monkeypatch, capsys):
    """--bq_window/--fp_window auto: self-calibration from frame samples,
    one-time certificate check, and identical output contract."""
    root = _write_drive(tmp_path, rng, frames=1, n=6000)

    cfg = Config(
        num_point=512,
        use_color=0,
        box_size_x=60.0,
        box_size_y=20.0,
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    config_path = tmp_path / "config.json"
    cfg.to_json(config_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    workdir = tmp_path / "run"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "kitti_predict.py",
            "--ckpt", str(ckpt),
            "--kitti_root", str(root),
            "--config_file", str(config_path),
            "--save",
            "--bq_window", "auto",
            "--fp_window", "auto",
        ],
    )
    import kitti_predict

    kitti_predict.main()

    out = capsys.readouterr().out
    assert "auto window calibration" in out
    names = {p.name for p in (workdir / "result" / "dense").iterdir()}
    assert {"0000.pcd", "0000.labels"} <= names


def test_kitti_predict_cli_window_certificate_abort(rng, tmp_path, monkeypatch):
    """A failed per-frame window exactness certificate aborts the run with
    an error naming the offending frame (the certificate is forced False at
    the trainer seam — on the CPU XLA path the real windows are advisory)."""
    import jax.numpy as jnp
    import pytest

    root = _write_drive(tmp_path, rng, frames=1, n=6000)

    cfg = Config(
        num_point=512,
        use_color=0,
        box_size_x=60.0,
        box_size_y=20.0,
        l1_npoint=128,
        l2_npoint=64,
        l3_npoint=16,
        l4_npoint=8,
    )
    config_path = tmp_path / "config.json"
    cfg.to_json(config_path)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    orig = Trainer._predict_step_checked

    def failing(self, state, points):
        labels, _ = orig(self, state, points)
        return labels, jnp.zeros((), jnp.bool_)

    monkeypatch.setattr(Trainer, "_predict_step_checked", failing)

    workdir = tmp_path / "run"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "kitti_predict.py",
            "--ckpt", str(ckpt),
            "--kitti_root", str(root),
            "--config_file", str(config_path),
            "--bq_window", "512",
        ],
    )
    import kitti_predict

    with pytest.raises(ValueError, match="certificate failed on frame"):
        kitti_predict.main()
