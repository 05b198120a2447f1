#!/usr/bin/env python3
"""Calibrate the ball-query x-window (--bq_window) for a dataset.

Samples training batches exactly like train.py, runs FPS to get the real
query centroids, and computes — with the same 128-query-tile x-span math as
ops.ball_query_calibrated — the window width each SA level would need for
the windowed query to be bit-exact. Prints per-level span statistics and a
suggested window (max over sampled batches x a safety margin, rounded up to
128 lanes).

The suggestion applies to the FIRST SA level only in practice: deeper
levels' clouds are already <= any useful window, so ball_query_calibrated
statically falls back to the full exact kernel there.

Usage:
    python tools/bq_window_calibrate.py --data_path dataset/semantic_raw \
        [--config_file semantic.json] [--num_batches 16] [--margin 1.25]

The runtime certificate (Trainer.check_bq_window, sown "bq_window_ok")
still guards the chosen window on every eval — calibration picks a good
value, the certificate proves it.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LANES = 128


def required_window(xyz: np.ndarray, queries: np.ndarray, radius: float) -> int:
    """Max columns any 128-query tile must sweep (ballquery.py tile math)."""
    b, n, _ = xyz.shape
    m = queries.shape[1]
    tm = min(_LANES, m)
    t = max(m // tm, 1)
    worst = 0
    for bi in range(b):
        xs = np.sort(xyz[bi, :, 0])
        qs = np.sort(queries[bi, :, 0])[: t * tm].reshape(t, tm)
        lo = np.searchsorted(xs, qs.min(axis=1) - radius)
        hi = np.searchsorted(xs, qs.max(axis=1) + radius)
        lo_aligned = (lo // _LANES) * _LANES
        worst = max(worst, int((hi - lo_aligned).max()))
    return worst


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--config_file", default="semantic.json")
    parser.add_argument("--train_set", default="train")
    parser.add_argument("--num_batches", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--margin", type=float, default=1.25,
                        help="safety factor on the observed max span")
    parser.add_argument("--seed", type=int, default=0)
    flags = parser.parse_args()

    import jax

    from pointnet2_tpu import ops
    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.semantic3d import SemanticDataset

    cfg = Config.from_json(flags.config_file)
    batch_size = flags.batch_size or cfg.batch_size
    ds = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split=flags.train_set,
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=flags.data_path,
        seed=flags.seed,
    )

    levels = [(i + 1, spec.npoint, spec.radius) for i, spec in enumerate(cfg.sa_layers)]
    spans = {lvl: [] for lvl, _, _ in levels}
    fps = jax.jit(ops.fps_centroids, static_argnums=1)

    for _ in range(flags.num_batches):
        data, _, _ = ds.sample_batch_in_all_files(batch_size)
        xyz = np.ascontiguousarray(data[..., :3], np.float32)
        cloud = xyz
        for lvl, npoint, radius in levels:
            _, centroids = jax.tree.map(np.asarray, fps(cloud, npoint))
            spans[lvl].append(required_window(cloud, centroids, radius))
            cloud = centroids

    print(f"{'level':>5} {'cloud N':>8} {'p50':>6} {'p95':>6} {'max':>6} "
          f"{'suggested':>10}")
    n = cfg.num_point
    for lvl, npoint, radius in levels:
        s = np.array(spans[lvl])
        suggested = int(np.ceil(s.max() * flags.margin / _LANES) * _LANES)
        note = ""
        if suggested >= n:
            note = "  (>= cloud size: full exact kernel runs regardless)"
        print(f"{lvl:>5} {n:>8} {int(np.percentile(s, 50)):>6} "
              f"{int(np.percentile(s, 95)):>6} {int(s.max()):>6} "
              f"{suggested:>10}{note}")
        n = npoint

    s1 = np.array(spans[1])
    w = int(np.ceil(s1.max() * flags.margin / _LANES) * _LANES)
    if w < cfg.num_point:
        print(f"\n--bq_window {w}")
    else:
        print("\nwindowing would not engage at SA1 on this data; "
              "omit --bq_window")


if __name__ == "__main__":
    main()
