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


def required_fp_window(dataset: np.ndarray, queries: np.ndarray, k: int = 3) -> int:
    """Smallest 128-multiple window certifying exact kNN (knn.py placement).

    Simulates ops.pallas.knn_sliced's centered window placement and its
    strict certificate (k-th pick < squared x-distance to the nearest
    excluded column) per candidate width; returns the smallest width that
    certifies for every query, or the dataset size when none does (the op
    then statically falls back to the full exact kernel).
    """
    b, m, _ = dataset.shape
    nq = queries.shape[1]
    tq = min(_LANES, nq)
    t = max(nq // tq, 1)
    mpad = int(np.ceil(m / _LANES) * _LANES)
    worst = _LANES
    for bi in range(b):
        order = np.argsort(dataset[bi, :, 0], kind="stable")
        xsx = dataset[bi, order, 0]
        qorder = np.argsort(queries[bi, :, 0], kind="stable")
        qs = queries[bi][qorder][: t * tq].reshape(t, tq, 3)
        # exact k-th NN squared distance per (sorted) query
        d2 = ((qs.reshape(-1, 1, 3) - dataset[bi][None]) ** 2).sum(-1)
        kth = np.sort(d2, axis=1)[:, k - 1].reshape(t, tq)
        qx = qs[..., 0]
        mid = (
            np.searchsorted(xsx, qx.min(axis=1))
            + np.searchsorted(xsx, qx.max(axis=1))
        ) // 2
        need = mpad  # fallback: no width below the cloud size certifies
        for w in range(_LANES, mpad, _LANES):
            lo = ((mid - w // 2 + _LANES // 2) // _LANES) * _LANES
            lo = np.clip(lo, 0, max(mpad - w, 0))
            xl = xsx[np.clip(lo - 1, 0, m - 1)]
            xr = xsx[np.clip(lo + w, 0, m - 1)]
            bl = np.where(
                (lo > 0)[:, None],
                np.maximum(qx - xl[:, None], 0.0) ** 2,
                np.inf,
            )
            br = np.where(
                (lo + w < m)[:, None],
                np.maximum(xr[:, None] - qx, 0.0) ** 2,
                np.inf,
            )
            if (kth < np.minimum(bl, br)).all():
                need = w
                break
        worst = max(worst, need)
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
    fp_suggest = 0
    for lvl, npoint, _ in levels:
        s = np.array(fp_spans[lvl])
        # the margin scales the certified width; alignment keeps it a
        # 128-multiple
        suggested = int(np.ceil(s.max() * flags.margin / _LANES) * _LANES)
        note = ""
        if suggested >= npoint:
            note = "  (>= cloud size: full exact kernel runs regardless)"
        elif suggested > fp_suggest:
            fp_suggest = suggested
        print(f"{lvl:>5} {npoint:>8} {int(np.percentile(s, 50)):>6} "
              f"{int(np.percentile(s, 95)):>6} {int(s.max()):>6} "
              f"{suggested:>10}{note}")

    s1 = np.array(spans[1])
    w = int(np.ceil(s1.max() * flags.margin / _LANES) * _LANES)
    if w < cfg.num_point:
        print(f"\n--bq_window {w}")
    else:
        print("\nwindowing would not engage at SA1 on this data; "
              "omit --bq_window")
    if fp_suggest:
        print(f"--fp_window {fp_suggest}")
    else:
        print("3-NN windowing would not engage at any FP level on this "
              "data; omit --fp_window")


if __name__ == "__main__":
    main()
