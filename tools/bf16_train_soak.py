#!/usr/bin/env python3
"""f32 vs bf16 mixed-precision TRAINING convergence soak.

Trains the same small flagship configuration twice — once with
``Trainer(train_dtype="float32")`` and once with ``"bfloat16"`` — from the
same init and the SAME pre-sampled batch stream, then overlays the loss
curves and compares final validation accuracy/mIoU. This is the
convergence evidence for the mixed-precision train mode (bf16 activations
and MLP matmuls; f32 master weights, Adam moments, BN stats, geometry ops,
logits, and loss — see Trainer.train_dtype). The reference has no
equivalent mode (TF1 f32-only, /root/reference/train.py:333-339); this is
a TPU-native capability beyond parity.

Batches are pre-sampled into memory once (seeded, single-thread —
bit-reproducible per data/rng.py) so both runs consume identical data and
any divergence is purely the compute dtype.

Usage: python tools/bf16_train_soak.py [--steps 300] [--eval_batches 12]
       [--min_width 128]
--min_width W adds a third run: SELECTIVE mixed precision
(Trainer(train_dtype="bfloat16", bf16_min_width=W)) — stages narrower than
W stay f32 (the round-5 probe into the uniform-bf16 convergence gap: the
hypothesis is the narrow SA1/SA2 encoders, not the wide stack, carry it).
Writes the overlay table to stdout (redirect to artifacts/).
"""

import argparse
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")


def run(dtype, cfg, batches, val_batches, num_classes, min_width=None):
    import jax

    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.metrics import ConfusionMatrix
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    trainer = Trainer(cfg=cfg, train_dtype=dtype, bf16_min_width=min_width)
    state = trainer.init_state(jax.random.PRNGKey(0))
    drng = jax.random.PRNGKey(1)
    losses = []
    for batch in batches:
        state, metrics = trainer.train_step(state, batch, drng)
        losses.append(float(metrics["loss"]))
    cm = ConfusionMatrix(num_classes)
    for batch in val_batches:
        m = trainer.eval_step(state, batch)
        cm.increment_from_matrix(np.asarray(m["confusion"]))
    return losses, cm.get_accuracy(), cm.get_mean_iou()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval_batches", type=int, default=12)
    ap.add_argument(
        "--min_width", type=int, default=None,
        help="also run selective bf16 (Trainer.bf16_min_width)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.semantic3d import (
        NUM_CLASSES,
        SemanticDataset,
        train_file_prefixes,
        validation_file_prefixes,
    )
    from tools.train_soak import make_scene

    print("backend:", jax.default_backend())

    data_dir = tempfile.mkdtemp(prefix="bf16_soak_")
    rng = np.random.RandomState(0)
    for prefix in train_file_prefixes + validation_file_prefixes:
        make_scene(prefix, data_dir, rng, n=80_000)

    cfg = Config(
        num_point=2048,
        batch_size=16,
        l1_npoint=512,
        l2_npoint=128,
        l3_npoint=32,
        l4_npoint=8,
        decay_step=20000,
        data_path=data_dir,
    )
    train_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point, split="train",
        use_color=bool(cfg.use_color), box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y, path=data_dir, seed=0,
    )
    val_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point, split="validation",
        use_color=bool(cfg.use_color), box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y, path=data_dir, seed=1,
    )

    def to_batch(tup, weights=None):
        data, labels, w = tup
        return {
            "points": jnp.asarray(data),
            "labels": jnp.asarray(labels),
            # validation weights are the reference's all-zero quirk; for a
            # meaningful val loss a caller would feed real weights — here
            # eval quality is judged from the confusion matrix only.
            "weights": jnp.asarray(w if weights is None else weights),
        }

    print(f"pre-sampling {args.steps} train + {args.eval_batches} val batches")
    batches = [
        to_batch(train_ds.sample_batch_in_all_files(cfg.batch_size, True))
        for _ in range(args.steps)
    ]
    val_batches = [
        to_batch(val_ds.sample_batch_in_all_files(cfg.batch_size, False))
        for _ in range(args.eval_batches)
    ]

    variants = [("f32", "float32", None), ("bf16", "bfloat16", None)]
    if args.min_width is not None:
        variants.append(
            (f"bf16_sel{args.min_width}", "bfloat16", args.min_width)
        )
    results = {}
    for name, dtype, mw in variants:
        print(f"training {args.steps} steps in {name} ...", flush=True)
        results[name] = run(
            dtype, cfg, batches, val_batches, NUM_CLASSES, min_width=mw
        )

    names = [v[0] for v in variants]
    print("\nloss-curve overlay (mean over 20-step windows):")
    hdr = " ".join(f"{n:>12}" for n in names)
    dhdr = " ".join(f"{n + '-f32':>12}" for n in names[1:])
    print(f"{'steps':>10} {hdr} {dhdr}")
    for s in range(0, args.steps, 20):
        means = [float(np.mean(results[n][0][s:s + 20])) for n in names]
        vals = " ".join(f"{m:>12.4f}" for m in means)
        deltas = " ".join(f"{m - means[0]:>+12.4f}" for m in means[1:])
        print(f"{s:>5}-{min(s + 20, args.steps):<4} {vals} {deltas}")

    l32, acc32, miou32 = results["f32"]
    print("\nfinal train loss: " + "  ".join(
        f"{n} {results[n][0][-1]:.4f}" for n in names))
    print("val accuracy:     " + "  ".join(
        f"{n} {results[n][1]:.4f} ({results[n][1] - acc32:+.4f})"
        for n in names))
    print("val mIoU:         " + "  ".join(
        f"{n} {results[n][2]:.4f} ({results[n][2] - miou32:+.4f})"
        for n in names))
    for n in names[1:]:
        _, acc, miou = results[n]
        ok = abs(acc - acc32) < 0.02 and abs(miou - miou32) < 0.04
        print(f"CONVERGENCE[{n}]", "OK" if ok else "DIVERGED",
              "(tolerance: |d acc| < 0.02, |d mIoU| < 0.04)")


if __name__ == "__main__":
    main()
