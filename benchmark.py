#!/usr/bin/env python3
"""Inference benchmark + profiler harness.

Parity with the reference's benchmark.py: a timed batch-64 inference with a
full profiler trace written to disk, then a warmed batch-size sweep
2^0..2^7 printing batch_time / sample_time (benchmark.py:17-72). TF's
tf.profiler is replaced by jax.profiler traces (viewable in XProf /
TensorBoard), and block_until_ready provides honest wall-clock timing.

Runs on random weights by default (no checkpoint needed, suitable for op/
compile benchmarking) or restores --ckpt like the reference.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="", help="optional checkpoint dir")
    parser.add_argument("--config_file", default="semantic.json")
    parser.add_argument("--trace_dir", default="result/jax-trace")
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument(
        "--bq_window",
        type=int,
        default=None,
        help="profile the PRODUCTION config: calibrated ball-query window "
        "(with the fused SA1 wingather on the eval path). Ints only — "
        "data here is synthetic box-regime, certified before profiling",
    )
    parser.add_argument(
        "--fp_window",
        type=int,
        default=None,
        help="calibrated 3-NN window for the FP decoder (see --bq_window)",
    )
    flags = parser.parse_args()

    import jax

    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint

    cfg = Config.from_json(flags.config_file)
    trainer = Trainer(
        cfg=cfg, bq_window=flags.bq_window, fp_window=flags.fp_window
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    if flags.ckpt:
        state = restore_checkpoint(os.path.abspath(flags.ckpt), state)

    import jax.numpy as jnp

    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    windowed = flags.bq_window is not None or flags.fp_window is not None

    def data(batch):
        if windowed:
            # Box-regime positions (bench.py): the calibrated windows'
            # exactness certificates need representative geometry.
            x = np.zeros((batch, cfg.num_point, cfg.point_dim), np.float32)
            x[..., :3] = rng.rand(batch, cfg.num_point, 3) * [8.0, 8.0, 4.9]
            x[..., 3:] = rng.rand(batch, cfg.num_point, cfg.point_dim - 3)
            return jnp.asarray(x)
        return jnp.asarray(
            rng.randn(batch, cfg.num_point, cfg.point_dim), jnp.float32
        )

    def timed_forward(x, K0=2, K1=8):
        """K-slope timing of the production (chunked) inference forward."""
        return slope_time(
            lambda c: trainer._infer_logits(state, c), x, K0=K0, K1=K1
        )

    # Profile trace at batch 64 (reference benchmark.py:17-54).
    batch_size = 64
    x = data(batch_size)
    if windowed:
        assert bool(trainer.check_bq_window(state, x)), (
            "window certificate failed on the benchmark data — refusing "
            "to profile an unverified fast path"
        )
        print(
            f"window certificate OK (bq={flags.bq_window}, "
            f"fp={flags.fp_window})"
        )
    trainer.predict_step(state, x).block_until_ready()  # compile
    os.makedirs(flags.trace_dir, exist_ok=True)
    with jax.profiler.trace(flags.trace_dir):
        np.asarray(trainer.predict_step(state, x))
    print(f"Profiler trace written to {flags.trace_dir}")

    # Per-op report, the tf-profile.txt equivalent (reference benchmark.py:44-54).
    from pointnet2_tpu.utils import xplane

    report_path = os.path.join(flags.trace_dir, "tpu-profile.txt")
    try:
        rows = xplane.write_op_report(flags.trace_dir, report_path)
        print(f"Per-op profile ({len(rows)} ops) written to {report_path}")
        sys.stdout.write(xplane.format_report(rows, top=15, title="top ops"))
    except FileNotFoundError as e:  # pragma: no cover - trace layout changed
        print(f"per-op report skipped: {e}")

    batch_time = timed_forward(x)
    print(
        f"Batch size: {batch_size}, batch_time: {batch_time}, "
        f"sample_time: {batch_time / batch_size}"
    )

    # Batch sweep (reference benchmark.py:56-72).
    for batch_size in [2**n for n in range(8)]:
        x = data(batch_size)
        batch_time = timed_forward(x)
        print(
            f"Batch size: {batch_size}, batch_time: {batch_time}, "
            f"sample_time: {batch_time / batch_size}, "
            f"points_per_sec: {batch_size * cfg.num_point / batch_time:.0f}"
        )


if __name__ == "__main__":
    main()
