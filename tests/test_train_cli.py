"""End-to-end train.py CLI test: epochs, eval, checkpoints, autosave, resume.

Covers the full reference train-loop surface (/root/reference/train.py:333-465)
through the real CLI: prefetched batches, per-epoch metrics + per-class IoU,
eval every 5 epochs, best/rolling/autosave orbax checkpoints, --resume.
"""

import json
import sys

import numpy as np
import pytest

from pointnet2_tpu.config import Config
from pointnet2_tpu.data.io import write_labels, write_pcd
from pointnet2_tpu.data.semantic3d import (
    train_file_prefixes,
    validation_file_prefixes,
)


def _fabricate(data_dir, rng, n=3000):
    for prefix in train_file_prefixes + validation_file_prefixes:
        pts = rng.rand(n, 3) * [20.0, 20.0, 4.0]
        labels = np.where(pts[:, 2] < 2.0, 1, 5).astype(np.int32)
        write_pcd(str(data_dir / f"{prefix}.pcd"), pts, rng.rand(n, 3))
        write_labels(str(data_dir / f"{prefix}.labels"), labels)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    rng = np.random.RandomState(0)
    base = tmp_path_factory.mktemp("traincli")
    data_dir = base / "scenes"
    data_dir.mkdir()
    _fabricate(data_dir, rng)

    cfg = Config(
        num_point=256,
        batch_size=8,
        max_epoch=1,
        data_path=str(data_dir),
        logdir=str(base / "log"),
        l1_npoint=64,
        l2_npoint=32,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = base / "cfg.json"
    cfg.to_json(cfg_path)

    argv = ["train.py", "--config_file", str(cfg_path), "--seed", "0"]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        train.main()
    finally:
        sys.argv = old
    return base, cfg_path


def test_train_cli_artifacts(trained):
    base, _ = trained
    log = base / "log"
    text = (log / "log_train.txt").read_text()
    assert "EPOCH 000" in text
    assert "mean loss" in text and "Average IoU" in text
    assert "eval accuracy" in text  # epoch 0 evaluates
    assert "eval IoU of" in text  # per-class validation IoU
    assert "Autosaved state" in text

    records = [
        json.loads(line)
        for line in (log / "scalars.jsonl").read_text().splitlines()
        if line
    ]
    tags = {r["tag"] for r in records}
    assert tags == {"train", "validation"}
    train_rec = next(r for r in records if r["tag"] == "train")
    assert {"loss", "accuracy", "learning_rate", "bn_decay"} <= set(train_rec)

    names = {p.name for p in log.iterdir()}
    assert "model" in names  # rolling (epoch % 10 == 0)
    assert "model_autosave" in names
    assert any(n.startswith("best_model_epoch_") for n in names)


def test_train_cli_resume_continues_step(trained):
    base, cfg_path = trained
    autosave = base / "log" / "model_autosave"

    import jax

    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint

    cfg = Config.from_json(cfg_path)
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    restored = restore_checkpoint(str(autosave), state)
    steps_done = int(restored.step)
    assert steps_done > 0

    # resume via the CLI for one more epoch; the step counter must advance
    argv = [
        "train.py", "--config_file", str(cfg_path), "--seed", "1",
        "--resume", str(autosave), "--max_epoch", "1",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        train.main()
    finally:
        sys.argv = old
    resumed = restore_checkpoint(str(base / "log" / "model_autosave"), state)
    assert int(resumed.step) > steps_done


def test_train_cli_auto_windows(trained):
    """--bq_window auto / --fp_window auto: startup self-calibration runs,
    the chosen widths are logged, and the per-epoch certificate check
    passes (the windowed train path reports window_ok every step)."""
    base, cfg_path = trained
    logdir = str(base / "log_autowin")
    cfg = Config.from_json(cfg_path).replace(logdir=logdir)
    cfg_path2 = base / "cfg_autowin.json"
    cfg.to_json(cfg_path2)

    argv = [
        "train.py", "--config_file", str(cfg_path2), "--seed", "0",
        "--max_epoch", "1", "--bq_window", "auto", "--fp_window", "auto",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        train.main()
    finally:
        sys.argv = old
    text = (base / "log_autowin" / "log_train.txt").read_text()
    assert "auto window calibration" in text
    # a completed epoch means no certificate abort was raised
    assert "mean loss" in text


def test_train_cli_train_batch_certificate_abort(trained, monkeypatch):
    """A failed train-batch window certificate (AND-ed on device across the
    epoch) aborts at the epoch boundary with an actionable error. Forced
    False at the trainer seam — on the CPU XLA path real windows always
    certify."""
    import jax.numpy as jnp

    from pointnet2_tpu.train.trainer import Trainer

    base, cfg_path = trained
    cfg = Config.from_json(cfg_path).replace(logdir=str(base / "log_tabort"))
    cfg_path2 = base / "cfg_tabort.json"
    cfg.to_json(cfg_path2)

    orig = Trainer._train_step

    def failing(self, state, batch, rng):
        new_state, metrics = orig(self, state, batch, rng)
        metrics["window_ok"] = jnp.zeros((), jnp.bool_)
        return new_state, metrics

    monkeypatch.setattr(Trainer, "_train_step", failing)
    argv = [
        "train.py", "--config_file", str(cfg_path2), "--seed", "0",
        "--max_epoch", "1", "--bq_window", "256",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        with pytest.raises(ValueError, match="failed on a training batch"):
            train.main()
    finally:
        sys.argv = old


def test_train_cli_msg_arch_then_predict(trained, tmp_path):
    """--arch msg end-to-end: the MSG variant trains through the real CLI
    (checkpoints written, eval runs) and predict.py --arch msg restores
    its checkpoint and writes sparse artifacts (a mismatched arch would
    fail the orbax restore on tree structure)."""
    base, cfg_path = trained
    logdir = str(base / "log_msg")
    cfg = Config.from_json(cfg_path).replace(logdir=logdir)
    cfg_path2 = base / "cfg_msg.json"
    cfg.to_json(cfg_path2)

    argv = [
        "train.py", "--config_file", str(cfg_path2), "--seed", "0",
        "--max_epoch", "1", "--arch", "msg",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        train.main()
    finally:
        sys.argv = old
    text = (base / "log_msg" / "log_train.txt").read_text()
    assert "mean loss" in text and "eval accuracy" in text

    sparse_dir = tmp_path / "sparse_msg"
    argv = [
        "predict.py",
        "--ckpt", str(base / "log_msg" / "model_autosave"),
        "--set", "validation",
        "--config_file", str(cfg_path2),
        "--num_samples", "1",
        "--batch_size", "4",
        "--arch", "msg",
        "--output_dir", str(sparse_dir),
    ]
    sys.argv = argv
    try:
        import predict

        predict.main()
    finally:
        sys.argv = old
    from pointnet2_tpu.data.semantic3d import validation_file_prefixes

    for prefix in validation_file_prefixes:
        assert (sparse_dir / f"{prefix}.labels").exists()


def test_train_cli_eval_certificate_abort(trained, monkeypatch):
    """A failed validation-batch window certificate aborts the eval epoch
    with an actionable error (certificates AND-ed on device across eval
    batches)."""
    import jax.numpy as jnp

    from pointnet2_tpu.train.trainer import Trainer

    base, cfg_path = trained
    cfg = Config.from_json(cfg_path).replace(logdir=str(base / "log_eabort"))
    cfg_path2 = base / "cfg_eabort.json"
    cfg.to_json(cfg_path2)

    orig = Trainer._eval_step

    def failing(self, state, batch):
        metrics = orig(self, state, batch)
        metrics["window_ok"] = jnp.zeros((), jnp.bool_)
        return metrics

    monkeypatch.setattr(Trainer, "_eval_step", failing)
    argv = [
        "train.py", "--config_file", str(cfg_path2), "--seed", "0",
        "--max_epoch", "1", "--bq_window", "256",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        with pytest.raises(ValueError, match="failed on a validation batch"):
            train.main()
    finally:
        sys.argv = old
