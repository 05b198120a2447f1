"""Scene-level end-to-end parity: this framework vs the ACTUAL reference code.

Pipeline (shared fixture, flagship 8192-point config):
  1. synthesize labeled scenes -> pcd/labels -> voxel downsample (our ETL)
  2. train PointNet2SemSeg briefly on the TPU (or CPU) so weights are
     non-trivial and class-informative
  3. export the trained flax weights into the reference's TF graph
     (convert.flax_to_tf_vars + refbridge.ReferenceModel.load_var_dict) —
     the exact inverse of the trained-checkpoint import path
  4. sample each scene num_samples times (our predict.py sampling path) and
     run BOTH models on the identical input arrays
  5. compare: logits max|diff|, sparse argmax agreement, per-side acc/mIoU
  6. densify both sides' sparse predictions to the full dense cloud with the
     native grid-KNN engine (oracle-exact, tests/test_densify.py) and compare
     dense labels; plus an in-run oracle-vs-native spot check
  7. write PARITY_E2E.md

Usage: python tools/parity_e2e.py [--steps 250] [--num_samples 64]
Run from the repo root. Requires tensorflow (CPU) for the reference side.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import refbridge
from pointnet2_tpu import convert
from pointnet2_tpu.config import Config
from pointnet2_tpu.data.io import load_labels, read_pcd, write_labels, write_pcd
from pointnet2_tpu.data.semantic3d import SemanticFileData
from pointnet2_tpu.data.voxel import majority_vote_labels, voxel_downsample_with_trace
from pointnet2_tpu.ops.densify import densify_labels
from pointnet2_tpu.ops.reference import densify_labels_np
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.metrics import ConfusionMatrix


def make_scene(kind: str, n: int, rng: np.random.RandomState):
    """Synthetic scene with geometry-separable labels (classes 1..8)."""
    pts = rng.rand(n, 3) * [30.0, 30.0, 4.0]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    if kind == "strata":
        labels = np.where(z < 1.3, 1, np.where(z < 2.6, 4, 6)).astype(np.int32)
        ball = (x - 20) ** 2 + (y - 10) ** 2 + (z - 2) ** 2 < 9.0
        labels[ball] = 8
    elif kind == "rings":
        r = np.hypot(x - 15, y - 15)
        labels = np.where(r < 6, 2, np.where(r < 12, 5, 7)).astype(np.int32)
        labels[z > 3.2] = 3
    else:
        raise ValueError(kind)
    colors = rng.rand(n, 3)
    return pts.astype(np.float32), colors.astype(np.float32), labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--num_samples", type=int, default=64)
    ap.add_argument("--num_dense", type=int, default=300_000)
    ap.add_argument("--out", default="PARITY_E2E.md")
    ap.add_argument(
        "--matmul_precision",
        default="highest",
        choices=["default", "high", "highest"],
        help="matmul precision for the COMPARISON forwards (TPU MXU uses "
        "bf16 inputs at 'default', which injects ~1e-2 per-layer noise vs "
        "the f32 TF reference; 'highest' makes the comparison apples-to-apples)",
    )
    args = ap.parse_args()

    t0 = time.time()
    print("jax backend:", jax.default_backend())
    cfg = Config.from_json("semantic.json").replace(batch_size=16)
    hyper = {
        "use_color": cfg.use_color,
        **{
            f"l{i}_{f}": getattr(cfg, f"l{i}_{f}")
            for i in (1, 2, 3, 4)
            for f in ("npoint", "radius", "nsample")
        },
    }

    # -- 1. scenes + ETL ----------------------------------------------------
    tmp = tempfile.mkdtemp(prefix="parity_e2e_")
    scenes = {}
    for i, kind in enumerate(("strata", "rings")):
        rng = np.random.RandomState(100 + i)
        pts, cols, labels = make_scene(kind, args.num_dense, rng)
        base = os.path.join(tmp, kind)
        write_pcd(base + ".pcd", pts, cols)
        write_labels(base + ".labels", labels)
        cloud = read_pcd(base + ".pcd")
        ds_pts, ds_cols, inverse, _ = voxel_downsample_with_trace(
            cloud.points, 0.35, cloud.colors
        )
        ds_labels = majority_vote_labels(
            inverse, load_labels(base + ".labels"), len(ds_pts)
        )
        write_pcd(base + "_ds.pcd", ds_pts, ds_cols)
        write_labels(base + "_ds.labels", ds_labels)
        scenes[kind] = dict(
            dense_pts=pts, dense_labels=labels, ds=base + "_ds", n_ds=len(ds_pts)
        )
        print(f"[etl] {kind}: {args.num_dense} -> {len(ds_pts)} downsampled pts")

    # -- 2. brief training (our framework) ----------------------------------
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    fds = {
        kind: SemanticFileData(
            s["ds"], has_label=True, use_color=True,
            box_size_x=cfg.box_size_x, box_size_y=cfg.box_size_y,
            rng=np.random.RandomState(7),
        )
        for kind, s in scenes.items()
    }

    def make_batch(rng):
        data, lab = [], []
        for _ in range(cfg.batch_size):
            fd = fds["strata"] if rng.rand() < 0.5 else fds["rings"]
            c, r, l, col = fd.sample(cfg.num_point)
            data.append(np.hstack([c, col]).astype(np.float32))
            lab.append(l)
        return {
            "points": np.stack(data),
            "labels": np.stack(lab).astype(np.int32),
            "weights": np.ones((cfg.batch_size, cfg.num_point), np.float32),
        }

    brng = np.random.RandomState(3)
    drng = jax.random.PRNGKey(1)
    t = time.time()
    first = last = float("nan")
    for i in range(args.steps):
        state, m = trainer.train_step(state, make_batch(brng), drng)
        if i == 0:
            first = float(m["loss"])
        if i == args.steps - 1:
            last = float(m["loss"])
    print(f"[train] {args.steps} steps: loss {first:.3f} -> {last:.3f} "
          f"({time.time() - t:.1f}s incl. compile)")

    # logits fn for diff stats (precision-pinned for the comparison)
    @jax.jit
    def logits_fn(params, batch_stats, points):
        with jax.default_matmul_precision(args.matmul_precision):
            return trainer.model.apply(
                {"params": params, "batch_stats": batch_stats}, points, train=False
            )

    # attribution check: neighbor ops on this backend vs the NumPy oracle
    from pointnet2_tpu import ops
    from pointnet2_tpu.ops import reference as oracle

    probe = np.stack(
        [
            np.hstack(fds["strata"].sample(cfg.num_point)[0:1]).astype(np.float32)
            for _ in range(2)
        ]
    )
    fps_dev = np.asarray(ops.farthest_point_sample(jnp.asarray(probe), cfg.l1_npoint))
    fps_ora = oracle.farthest_point_sample_np(probe, cfg.l1_npoint)
    ctr = np.stack([probe[i, fps_ora[i]] for i in range(len(probe))])
    bq_dev, _ = ops.ball_query(jnp.asarray(probe), jnp.asarray(ctr), cfg.l1_radius,
                               cfg.l1_nsample)
    bq_ora, _ = oracle.ball_query_np(probe, ctr, cfg.l1_radius, cfg.l1_nsample)
    op_agreement = dict(
        fps=float((fps_dev == fps_ora).mean()),
        ball_query=float((np.asarray(bq_dev) == bq_ora).mean()),
    )
    print(f"[ops] device-vs-oracle index agreement: {op_agreement}")

    # -- 3. export trained weights into the reference graph ------------------
    params_np = jax.tree.map(np.asarray, jax.device_get(state.params))
    stats_np = jax.tree.map(np.asarray, jax.device_get(state.batch_stats))
    tf_vars = convert.flax_to_tf_vars({"params": params_np, "batch_stats": stats_np})
    ref = refbridge.ReferenceModel(hyper, cfg.num_point, cfg.batch_size, seed=0)
    ref.load_var_dict(tf_vars)
    print(f"[export] {len(tf_vars)} variables loaded into the reference graph")

    # -- 4/5. shared-fixture inference comparison ----------------------------
    rows = []
    dense_rows = []
    for kind, s in scenes.items():
        fd = fds[kind]
        fd.rng = np.random.RandomState(11)  # shared fixture sampling seed
        n_batches = max(1, args.num_samples // cfg.batch_size)
        agree = 0
        total = 0
        max_logit_diff = 0.0
        cm_mine, cm_ref = ConfusionMatrix(9), ConfusionMatrix(9)
        sparse_pts, sparse_mine, sparse_ref = [], [], []
        for bi in range(n_batches):
            centered, raw, gt, col = fd.sample_batch(cfg.batch_size, cfg.num_point)
            inp = np.concatenate([centered, col], -1).astype(np.float32)
            mine_logits = np.asarray(logits_fn(state.params, state.batch_stats, inp))
            mine = mine_logits.argmax(-1).astype(np.int32)
            t_ref = time.time()
            ref_logits = ref.run_logits(inp, training=False)
            refl = ref_logits.argmax(-1).astype(np.int32)
            max_logit_diff = max(
                max_logit_diff, float(np.abs(mine_logits - ref_logits).max())
            )
            agree += int((mine == refl).sum())
            total += mine.size
            cm_mine.increment_from_list(gt.ravel(), mine.ravel())
            cm_ref.increment_from_list(gt.ravel(), refl.ravel())
            sparse_pts.append(raw.reshape(-1, 3))
            sparse_mine.append(mine.reshape(-1))
            sparse_ref.append(refl.reshape(-1))
            print(f"[predict] {kind} batch {bi + 1}/{n_batches} "
                  f"(ref fwd {time.time() - t_ref:.1f}s)")
        rows.append(
            dict(
                scene=kind,
                samples=n_batches * cfg.batch_size,
                agreement=agree / total,
                max_logit_diff=max_logit_diff,
                acc_mine=cm_mine.get_accuracy(),
                acc_ref=cm_ref.get_accuracy(),
                miou_mine=cm_mine.get_mean_iou(),
                miou_ref=cm_ref.get_mean_iou(),
            )
        )

        # -- 6. densification comparison ------------------------------------
        sp = np.concatenate(sparse_pts)
        lm = np.concatenate(sparse_mine).astype(np.int32)
        lr_ = np.concatenate(sparse_ref).astype(np.int32)
        t = time.time()
        dense_mine, _ = densify_labels(sp, lm, s["dense_pts"], knn=3)
        dense_ref, _ = densify_labels(sp, lr_, s["dense_pts"], knn=3)
        dt = time.time() - t
        # oracle spot check of the densify engine at scene scale
        sub = np.random.RandomState(5).choice(len(s["dense_pts"]), 2000, replace=False)
        oracle = densify_labels_np(sp, lr_, s["dense_pts"][sub], k=3)
        oracle_match = float((oracle == dense_ref[sub]).mean())
        dense_rows.append(
            dict(
                scene=kind,
                agreement=float((dense_mine == dense_ref).mean()),
                acc_mine=float((dense_mine == s["dense_labels"]).mean()),
                acc_ref=float((dense_ref == s["dense_labels"]).mean()),
                oracle_match=oracle_match,
                densify_s=dt,
            )
        )
        print(f"[densify] {kind}: agreement "
              f"{dense_rows[-1]['agreement']:.6f}, oracle spot {oracle_match:.4f}")

    # -- 7. report ------------------------------------------------------------
    lines = [
        "# PARITY_E2E — end-to-end agreement with the reference pipeline",
        "",
        "Generated by `tools/parity_e2e.py`. The **reference side is the actual",
        "reference code** (`/root/reference/model.py` + `util/` imported at",
        "runtime via `tools/refbridge.py`, TF compat.v1, CUDA ops replaced by",
        "this repo's oracle-exact NumPy kernels). Both sides run the **same",
        "trained weights** (trained here, exported through the inverse of the",
        "checkpoint converter) on the **same sampled batches** (shared fixture,",
        f"flagship config: {cfg.num_point} points/sample, batch {cfg.batch_size}).",
        "",
        f"- jax backend: {jax.default_backend()}",
        f"- comparison matmul precision: {args.matmul_precision} (at 'default' "
        "the TPU MXU takes bf16 inputs — fast production mode but ~1e-2 "
        "per-layer noise vs the f32 TF reference)",
        f"- neighbor-op index agreement device-vs-oracle (flagship shapes): "
        f"fps {op_agreement['fps']:.4f}, ball_query {op_agreement['ball_query']:.4f}",
        f"- training: {args.steps} steps, loss {first:.3f} -> {last:.3f}",
        f"- scenes: 2 synthetic ({args.num_dense:,} dense pts each; real",
        "  Semantic3D data is not downloadable in this environment — zero egress)",
        "",
        "## Sparse inference (model forward + argmax, predict.py path)",
        "",
        "| scene | samples | label agreement | max \\|Δlogit\\| | acc ours | acc ref | mIoU ours | mIoU ref |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['scene']} | {r['samples']} | {r['agreement']:.6f} | "
            f"{r['max_logit_diff']:.2e} | {r['acc_mine']:.4f} | {r['acc_ref']:.4f} | "
            f"{r['miou_mine']:.4f} | {r['miou_ref']:.4f} |"
        )
    lines += [
        "",
        "## Dense labels (interpolate.py path, KNN=3 majority densification)",
        "",
        "Both sides densified with the native grid-KNN engine (oracle-exact —",
        "`tests/test_densify.py`); `oracle spot` re-checks 2,000 dense points",
        "against the pure-NumPy reference-semantics oracle in this very run.",
        "",
        "| scene | dense agreement | dense acc ours | dense acc ref | oracle spot | densify time |",
        "|---|---|---|---|---|---|",
    ]
    for r in dense_rows:
        lines.append(
            f"| {r['scene']} | {r['agreement']:.6f} | {r['acc_mine']:.4f} | "
            f"{r['acc_ref']:.4f} | {r['oracle_match']:.4f} | {r['densify_s']:.2f}s |"
        )
    lines += [
        "",
        "## What this proves / does not prove",
        "",
        "- Proves: the converter maps every variable correctly in both",
        "  directions; the two networks compute the same function (logit-level",
        "  agreement) through the full predict->densify pipeline at flagship",
        "  shapes; loss/gradient/BN-update parity is covered separately in",
        "  `tests/test_ref_parity.py`.",
        "- Does not prove: leaderboard-number reproduction — that requires the",
        "  real Semantic3D data and the reference's trained checkpoint, neither",
        "  of which is available in this offline environment. The mechanical",
        "  path for both is in place (`pointnet2_tpu/convert.py`).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"[done] wrote {args.out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
