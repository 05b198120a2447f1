"""Run logging: text log + progress bar + JSONL scalar history.

Replaces the reference's log_string/update_progress (train.py:45-77) and its
TensorBoard FileWriters (train.py:400-407) — scalars go to a JSONL file that
any dashboard can tail; no TF dependency.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time



class RunLogger:
    def __init__(self, logdir: str | pathlib.Path, filename: str = "log_train.txt"):
        self.logdir = pathlib.Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._fout = open(self.logdir / filename, "a")
        self._scalars = open(self.logdir / "scalars.jsonl", "a")

    def log(self, msg: str) -> None:
        self._fout.write(msg + "\n")
        self._fout.flush()
        print(msg)

    def scalars(self, step: int, tag: str, **values) -> None:
        rec = {"step": int(step), "tag": tag, "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._scalars.write(json.dumps(rec) + "\n")
        self._scalars.flush()

    def close(self) -> None:
        self._fout.close()
        self._scalars.close()


class NullLogger:
    """RunLogger stand-in for non-primary processes in multi-process runs.

    train.py gives every process with jax.process_index() != 0 one of these
    so only process 0 writes log_train.txt / scalars.jsonl (a multi-process
    launch must not double-write run artifacts); messages still go to that
    process's stdout prefixed with its index, for debuggability.
    """

    def __init__(self, process_index: int = 0):
        self._prefix = f"[proc {process_index}] "

    def log(self, msg: str) -> None:
        print(self._prefix + msg)

    def scalars(self, step: int, tag: str, **values) -> None:
        pass

    def close(self) -> None:
        pass


def update_progress(progress, bar_length: int = 10) -> None:
    """In-place console progress bar (role of the reference's train.py:55-77).

    Accepts any real number; values outside [0, 1] (or non-numbers) clamp.
    """
    try:
        frac = min(max(float(progress), 0.0), 1.0)
    except (TypeError, ValueError):
        frac = 0.0
    filled = round(frac * bar_length)
    sys.stdout.write(
        f"\rProgress: [{'#' * filled}{'-' * (bar_length - filled)}] {frac * 100:g}%"
    )
    sys.stdout.flush()


def export_tensorboard(
    logdir: str | pathlib.Path, out_dir: str | pathlib.Path | None = None
) -> list[pathlib.Path]:
    """Convert scalars.jsonl into TensorBoard event files, one run per tag.

    The reference writes per-split FileWriters (train.py:400-407); this
    produces the same layout (<out>/<tag>/events.*) from the JSONL history,
    so `tensorboard --logdir <logdir>/tb` works. Uses tensorboardX (baked in);
    raises ImportError with a hint if unavailable.
    """
    from tensorboardX import SummaryWriter

    logdir = pathlib.Path(logdir)
    out = pathlib.Path(out_dir) if out_dir else logdir / "tb"
    scalars_path = logdir / "scalars.jsonl"
    if not scalars_path.is_file():
        raise FileNotFoundError(scalars_path)
    writers: dict[str, SummaryWriter] = {}
    written: list[pathlib.Path] = []
    with open(scalars_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            tag = rec.pop("tag", "default")
            step = int(rec.pop("step", 0))
            walltime = rec.pop("time", None)
            if tag not in writers:
                run_dir = out / tag
                run_dir.mkdir(parents=True, exist_ok=True)
                writers[tag] = SummaryWriter(logdir=str(run_dir))
                written.append(run_dir)
            for key, value in rec.items():
                writers[tag].add_scalar(key, float(value), step, walltime=walltime)
    for w in writers.values():
        w.close()
    return written
