"""RunLogger + progress bar tests."""

import json

from pointnet2_tpu.utils.logging import RunLogger, update_progress


def test_run_logger_text_and_scalars(tmp_path, capsys):
    logger = RunLogger(tmp_path)
    logger.log("hello world")
    logger.scalars(5, "train", loss=1.5, accuracy=0.25)
    logger.scalars(10, "validation", miou=0.4)
    logger.close()

    assert "hello world" in (tmp_path / "log_train.txt").read_text()
    assert "hello world" in capsys.readouterr().out
    lines = [
        json.loads(line)
        for line in (tmp_path / "scalars.jsonl").read_text().splitlines()
    ]
    assert lines[0]["step"] == 5 and lines[0]["tag"] == "train"
    assert lines[0]["loss"] == 1.5
    assert lines[1]["miou"] == 0.4


def test_run_logger_appends(tmp_path):
    a = RunLogger(tmp_path)
    a.log("first")
    a.close()
    b = RunLogger(tmp_path)
    b.log("second")
    b.close()
    text = (tmp_path / "log_train.txt").read_text()
    assert "first" in text and "second" in text


def test_update_progress_bounds(capsys):
    update_progress(-1)
    update_progress(0.5)
    update_progress(2)
    update_progress("bogus")  # non-float -> treated as 0
    out = capsys.readouterr().out
    assert "100.0%" in out or "100%" in out


def test_export_tensorboard_round_trip(tmp_path):
    pytest = __import__("pytest")
    pytest.importorskip("tensorboardX")
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )

    logger = RunLogger(tmp_path)
    logger.scalars(10, "train", loss=1.5, accuracy=0.25)
    logger.scalars(20, "train", loss=1.0, accuracy=0.5)
    logger.scalars(20, "validation", accuracy=0.4, miou=0.2)
    logger.close()

    from pointnet2_tpu.utils.logging import export_tensorboard

    runs = export_tensorboard(tmp_path)
    assert sorted(r.name for r in runs) == ["train", "validation"]

    acc = ea_mod.EventAccumulator(str(tmp_path / "tb" / "train"))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"loss", "accuracy"}
    loss_events = acc.Scalars("loss")
    assert [(e.step, e.value) for e in loss_events] == [(10, 1.5), (20, 1.0)]

    vacc = ea_mod.EventAccumulator(str(tmp_path / "tb" / "validation"))
    vacc.Reload()
    assert vacc.Scalars("miou")[0].value == pytest.approx(0.2)


def test_export_tensorboard_missing_file(tmp_path):
    pytest = __import__("pytest")
    from pointnet2_tpu.utils.logging import export_tensorboard

    with pytest.raises(FileNotFoundError):
        export_tensorboard(tmp_path)
