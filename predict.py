#!/usr/bin/env python3
"""Sparse multi-sample inference on Semantic3D scenes (TPU).

CLI parity with the reference's predict.py: restores a checkpoint, samples
each scene --num_samples times in batches, argmaxes logits, writes
result/sparse/<scene>.pcd + .labels, and prints a confusion matrix over the
ground-truth labels of the sampled points (predict.py:108-205).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    np.random.seed(0)
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--num_samples",
        type=int,
        default=8,
        help="# samples, each contains num_point points_centered",
    )
    parser.add_argument("--ckpt", default="", help="Checkpoint dir", required=True)
    parser.add_argument("--set", default="validation", help="train, validation, test")
    parser.add_argument("--config_file", default="semantic.json")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--output_dir", default=os.path.join("result", "sparse"))
    parser.add_argument(
        "--dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="inference compute dtype (bfloat16: production mode, ~99.6%% "
        "label agreement with float32 — see PERFORMANCE.md)",
    )
    parser.add_argument(
        "--bf16_min_width",
        type=int,
        default=None,
        help="selective mixed precision: with --dtype bfloat16, stages "
        "whose narrowest MLP width is below this stay f32 (128 keeps the "
        "narrow SA1/SA2 encoders f32 — PERFORMANCE.md 'Round 5: "
        "selective bf16'). Default: uniform bfloat16",
    )
    parser.add_argument(
        "--arch",
        default="ssg",
        choices=["ssg", "msg"],
        help="model architecture — must match the checkpoint's "
        "(train.py --arch)",
    )
    from pointnet2_tpu.ops.calibrate import parse_window_arg as window_arg

    parser.add_argument(
        "--bq_window",
        type=window_arg,
        default=None,
        help="calibrated ball-query x-window: an int from "
        "tools/bq_window_calibrate.py, or 'auto' to self-calibrate from "
        "scene samples at startup; the exactness certificate is verified "
        "on every predicted batch and the run aborts if the window is too "
        "small for this data",
    )
    parser.add_argument(
        "--fp_window",
        type=window_arg,
        default=None,
        help="calibrated 3-NN x-window for the FP decoder levels (int or "
        "'auto', tools/bq_window_calibrate.py); verified like --bq_window",
    )
    parser.add_argument(
        "--sharded",
        action="store_true",
        help="batch-parallel inference over all LOCAL devices (1-D ICI "
        "mesh; batch_size must divide by the device count). The forward "
        "is sharded by XLA SPMD — params replicated, batch split.",
    )
    parser.add_argument(
        "--dist_coordinator",
        default=None,
        help="host:port of process 0 for jax.distributed; enables "
        "multi-process inference — scenes are partitioned round-robin "
        "across processes (each writes its own scenes' outputs; the "
        "final confusion matrix is all-gathered and printed by process 0)",
    )
    parser.add_argument(
        "--dist_num_processes",
        type=int,
        default=None,
        help="total process count for jax.distributed",
    )
    parser.add_argument(
        "--dist_process_id",
        type=int,
        default=None,
        help="this process's index in [0, dist_num_processes)",
    )
    flags = parser.parse_args()

    import jax

    from pointnet2_tpu.parallel.multihost import maybe_initialize_distributed

    # Must precede any device access (including the compilation-cache setup).
    maybe_initialize_distributed(
        flags.dist_coordinator, flags.dist_num_processes, flags.dist_process_id
    )
    nproc = jax.process_count()
    pid = jax.process_index()

    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.io import write_labels, write_pcd
    from pointnet2_tpu.data.semantic3d import SemanticDataset
    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint
    from pointnet2_tpu.utils.metrics import ConfusionMatrix

    cfg = Config.from_json(flags.config_file)
    os.makedirs(flags.output_dir, exist_ok=True)

    dataset = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split=flags.set,
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=cfg.data_path,
        seed=0,
    )
    if flags.bq_window == "auto" or flags.fp_window == "auto":
        from pointnet2_tpu.ops.calibrate import calibrate_model_windows

        crng = np.random.RandomState(0)

        def sample_xyz() -> np.ndarray:
            fd = dataset.list_file_data[crng.randint(len(dataset.list_file_data))]
            centered, _, _, _ = fd.sample_batch(
                batch_size=8, num_points_per_sample=cfg.num_point
            )
            return centered

        auto_bq, auto_fp = calibrate_model_windows(
            sa_specs=[(s.npoint, s.radius) for s in cfg.sa_layers],
            num_point=cfg.num_point,
            sample_xyz=sample_xyz,
            num_batches=8,
        )
        if flags.bq_window == "auto":
            flags.bq_window = auto_bq
        if flags.fp_window == "auto":
            flags.fp_window = auto_fp
        print(
            f"auto window calibration: bq_window={flags.bq_window}, "
            f"fp_window={flags.fp_window} (None = windowing would not "
            "engage; full exact kernels run)"
        )

    mesh = None
    if flags.sharded:
        from pointnet2_tpu.parallel import create_mesh

        # LOCAL devices only: each process predicts a different scene subset
        # (divergent per-process dispatch), so the SPMD programs must never
        # span processes; cross-process work meets only at the final
        # confusion-matrix all-gather.
        mesh = create_mesh(jax.local_devices())
        if flags.batch_size % len(mesh.devices.flat):
            parser.error(
                f"--sharded: batch_size {flags.batch_size} must divide by "
                f"the device count {len(mesh.devices.flat)}"
            )

    trainer = Trainer(
        cfg=cfg,
        num_classes=dataset.num_classes,
        infer_dtype=flags.dtype,
        # Sharded mode: each device already holds only batch/n rows, so
        # the HBM-locality chunk loop would just serialize the devices.
        infer_chunk=0 if flags.sharded else 8,
        arch=flags.arch,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
        bf16_min_width=flags.bf16_min_width,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_checkpoint(os.path.abspath(flags.ckpt), state)
    if mesh is not None:
        from pointnet2_tpu.parallel import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))
        print(f"Model restored (sharded over {len(mesh.devices.flat)} devices)")
    else:
        print("Model restored")

    batch_size = flags.batch_size
    cm = ConfusionMatrix(dataset.num_classes)

    # Multi-process: round-robin scene partition; distinct output filenames
    # per scene make the shared output_dir write-conflict-free.
    my_scenes = (
        dataset.list_file_data[pid::nproc] if nproc > 1
        else dataset.list_file_data
    )
    for file_data in my_scenes:
        print(f"Processing {file_data.file_path_without_ext}"
              + (f" (process {pid})" if nproc > 1 else ""))
        points_collector: list[np.ndarray] = []
        pd_labels_collector: list[np.ndarray] = []

        for batch_index in range(int(np.ceil(flags.num_samples / batch_size))):
            current = min(batch_size, flags.num_samples - batch_index * batch_size)
            centered, raw, gt_labels, colors = file_data.sample_batch(
                batch_size=current, num_points_per_sample=cfg.num_point
            )
            if cfg.use_color:
                inputs = np.concatenate((centered, colors), axis=-1)
            else:
                inputs = centered
            # pad to full batch for a single compiled shape
            pad = batch_size - current
            if pad:
                inputs = np.concatenate([inputs, np.zeros((pad,) + inputs.shape[1:])])
            s = time.time()
            device_inputs = inputs.astype(np.float32)
            if mesh is not None:
                from pointnet2_tpu.parallel import shard_batch

                device_inputs = shard_batch(device_inputs, mesh)
            if flags.bq_window is not None or flags.fp_window is not None:
                # Per-batch exactness certificate (free — the windowed
                # kernels compute it regardless): a too-small window
                # silently drops neighbors, so abort on the exact batch
                # that violated it rather than write wrong labels.
                pred_dev, ok = trainer.predict_step_checked(
                    state, device_inputs
                )
                if not bool(ok):
                    raise ValueError(
                        f"--bq_window={flags.bq_window} / "
                        f"--fp_window={flags.fp_window} is too small for "
                        "this dataset (exactness certificate failed on "
                        f"batch {batch_index} of "
                        f"{file_data.file_path_without_ext}); recalibrate "
                        "with tools/bq_window_calibrate.py"
                    )
                pred = np.asarray(pred_dev)[:current]
            else:
                pred = np.asarray(
                    trainer.predict_step(state, device_inputs)
                )[:current]
            print(f"Batch size: {current}, time: {time.time() - s}")

            points_collector.extend(raw)
            pd_labels_collector.extend(pred)
            if flags.set != "test":
                cm.increment_from_list(gt_labels.flatten(), pred.flatten())

        prefix = os.path.basename(file_data.file_path_without_ext)
        sparse_points = np.array(points_collector).reshape((-1, 3))
        pcd_path = os.path.join(flags.output_dir, prefix + ".pcd")
        write_pcd(pcd_path, sparse_points)
        print(f"Exported sparse pcd to {pcd_path}")
        labels_path = os.path.join(flags.output_dir, prefix + ".labels")
        write_labels(labels_path, np.array(pd_labels_collector).flatten())
        print(f"Exported sparse labels to {labels_path}")

    if flags.set != "test":
        if nproc > 1:
            # One synchronized collective at the very end: every process
            # contributes its scenes' confusion matrix; process 0 prints
            # the global metrics (identical to a single-process run over
            # all scenes — the matrix is a sum over points).
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                np.asarray(cm.confusion_matrix, np.int64)
            )
            if pid == 0:
                total = ConfusionMatrix(dataset.num_classes)
                total.increment_from_matrix(gathered.sum(axis=0))
                total.print_metrics()
        else:
            cm.print_metrics()


if __name__ == "__main__":
    main()
