#!/usr/bin/env python3
"""Calibrate the ball-query (--bq_window) AND 3-NN (--fp_window) x-windows.

Samples training batches exactly like train.py, runs FPS to get the real
query centroids, and computes — with the same 128-query-tile x-span math as
ops.ball_query_calibrated / ops.three_nn_calibrated — the window width each
SA level's ball query and each FP level's 3-NN would need to be bit-exact.
Prints per-level span statistics and suggested windows (max over sampled
batches x a safety margin, rounded up to 128 lanes).

The suggestions bind the LARGEST engaged level in practice (SA1's cloud for
--bq_window, FP1's coarse cloud for --fp_window): deeper levels' clouds are
already <= any useful window, so the calibrated ops statically fall back to
the full exact kernels there.

Usage:
    python tools/bq_window_calibrate.py --data_path dataset/semantic_raw \
        [--config_file semantic.json] [--num_batches 16] [--margin 1.25]

The runtime certificates (Trainer.check_bq_window: sown "bq_window_ok" +
"fp_window_ok") still guard the chosen windows on every eval — calibration
picks good values, the certificates prove them.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnet2_tpu.ops.calibrate import (  # noqa: E402
    choose_window,
    required_bq_window,
    required_fp_window,
)

_LANES = 128

# Back-compat alias (tools/fp_window_probe.py docstring references)
required_window = required_bq_window


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
    fp_spans = {lvl: [] for lvl, _, _ in levels}
    fps = jax.jit(ops.fps_centroids, static_argnums=1)

    for _ in range(flags.num_batches):
        data, _, _ = ds.sample_batch_in_all_files(batch_size)
        xyz = np.ascontiguousarray(data[..., :3], np.float32)
        cloud = xyz
        for lvl, npoint, radius in levels:
            _, centroids = jax.tree.map(np.asarray, fps(cloud, npoint))
            spans[lvl].append(required_window(cloud, centroids, radius))
            # FP level `lvl` interpolates the centroids' features back onto
            # `cloud` via exact 3-NN: dataset = centroids, queries = cloud.
            fp_spans[lvl].append(required_fp_window(centroids, cloud))
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

    print(f"\nFP 3-NN (dataset = the level's centroids, queries = the "
          f"level-above cloud):")
    print(f"{'level':>5} {'cloud M':>8} {'p50':>6} {'p95':>6} {'max':>6} "
          f"{'suggested':>10}")
    for lvl, npoint, _ in levels:
        s = np.array(fp_spans[lvl])
        # the margin scales the certified width; alignment keeps it a
        # 128-multiple
        suggested = int(np.ceil(s.max() * flags.margin / _LANES) * _LANES)
        note = ""
        if suggested >= npoint:
            note = "  (>= cloud size: full exact kernel runs regardless)"
        print(f"{lvl:>5} {npoint:>8} {int(np.percentile(s, 50)):>6} "
              f"{int(np.percentile(s, 95)):>6} {int(s.max()):>6} "
              f"{suggested:>10}{note}")

    # One width per op, safe at every level it engages (ops/calibrate.py)
    clouds = [cfg.num_point] + [npoint for _, npoint, _ in levels[:-1]]
    fp_clouds = [npoint for _, npoint, _ in levels]
    bq = choose_window(
        [max(spans[lvl]) for lvl, _, _ in levels], clouds, flags.margin
    )
    fp = choose_window(
        [max(fp_spans[lvl]) for lvl, _, _ in levels], fp_clouds, flags.margin
    )
    if bq:
        print(f"\n--bq_window {bq}")
    else:
        print("\nwindowing would not engage at SA1 on this data; "
              "omit --bq_window")
    if fp:
        print(f"--fp_window {fp}")
    else:
        print("3-NN windowing would not engage at any FP level on this "
              "data; omit --fp_window")


if __name__ == "__main__":
    main()
