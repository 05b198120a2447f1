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


def update_progress(progress: float, bar_length: int = 10) -> None:
    """Console progress bar (train.py:55-77)."""
    if isinstance(progress, int):
        progress = float(progress)
    if not isinstance(progress, float):
        progress = 0.0
    progress = min(max(progress, 0.0), 1.0)
    block = int(round(bar_length * progress))
    text = "\rProgress: [{}] {}%".format(
        "#" * block + "-" * (bar_length - block), progress * 100
    )
    sys.stdout.write(text)
    sys.stdout.flush()
