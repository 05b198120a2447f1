#!/usr/bin/env python3
"""Train PointNet++ on Semantic3D (TPU).

CLI parity with the reference's train.py: --train_set {train,train_full},
--config_file semantic.json. Differences are TPU-native: jitted fused train
step on a data-parallel mesh, async host prefetch instead of mp.Queue
(train.py:134-196), device-side confusion matrices instead of the per-point
Python loop (train.py:249-251), orbax checkpoints instead of tf.train.Saver.

Extra flags (not in the reference): --resume to continue from a checkpoint,
--max_epoch / --data_path overrides, --seed.
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_set", default="train", help="train, train_full")
    parser.add_argument("--config_file", default="semantic.json", help="config path")
    parser.add_argument("--resume", default="", help="checkpoint dir to resume from")
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--accum_steps",
        type=int,
        default=1,
        help="split each batch into this many microbatches and accumulate "
        "gradients (one optimizer update per batch; ghost-BN moments)",
    )
    def window_arg(v: str):
        return v if v == "auto" else int(v)

    parser.add_argument(
        "--bq_window",
        type=window_arg,
        default=None,
        help="calibrated ball-query x-window: an int from "
        "tools/bq_window_calibrate.py, or 'auto' to self-calibrate from "
        "sampled training batches at startup; the sown exactness "
        "certificate is AND-ed across every train batch (checked at each "
        "epoch boundary) and verified on a validation batch at every eval "
        "epoch — the run aborts if the window is ever too small",
    )
    parser.add_argument(
        "--fp_window",
        type=window_arg,
        default=None,
        help="calibrated 3-NN x-window for the FP decoder levels (int or "
        "'auto', tools/bq_window_calibrate.py); verified like --bq_window",
    )
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.data.pipeline import BatchProducer, device_prefetch
    from pointnet2_tpu.data.semantic3d import SemanticDataset
    from pointnet2_tpu.parallel import (
        batch_sharding,
        create_mesh,
        replicated_sharding,
    )
    from pointnet2_tpu.train.trainer import (
        Trainer,
        restore_checkpoint,
        save_checkpoint,
    )
    from pointnet2_tpu.utils.logging import RunLogger, update_progress
    from pointnet2_tpu.utils.metrics import ConfusionMatrix

    cfg = Config.from_json(flags.config_file)
    if flags.max_epoch is not None:
        cfg = cfg.replace(max_epoch=flags.max_epoch)
    if flags.data_path is not None:
        cfg = cfg.replace(data_path=flags.data_path)

    logger = RunLogger(cfg.logdir)
    logger.log(f"devices: {jax.devices()}")

    train_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split=flags.train_set,
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=cfg.data_path,
        seed=flags.seed,
    )
    val_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split="validation",
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=cfg.data_path,
        seed=flags.seed,
    )

    if flags.bq_window == "auto" or flags.fp_window == "auto":
        from pointnet2_tpu.ops.calibrate import calibrate_model_windows

        auto_bq, auto_fp = calibrate_model_windows(
            sa_specs=[(s.npoint, s.radius) for s in cfg.sa_layers],
            num_point=cfg.num_point,
            sample_xyz=lambda: train_ds.sample_batch_in_all_files(
                cfg.batch_size
            )[0][..., :3],
            num_batches=8,
        )
        if flags.bq_window == "auto":
            flags.bq_window = auto_bq
        if flags.fp_window == "auto":
            flags.fp_window = auto_fp
        logger.log(
            f"auto window calibration: bq_window={flags.bq_window}, "
            f"fp_window={flags.fp_window} (None = windowing would not "
            "engage; full exact kernels run)"
        )

    mesh = create_mesh()
    trainer = Trainer(
        cfg=cfg,
        num_classes=train_ds.num_classes,
        accum_steps=flags.accum_steps,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
    )
    state = trainer.init_state(jax.random.PRNGKey(flags.seed or 0))
    if flags.resume:
        state = restore_checkpoint(os.path.abspath(flags.resume), state)
        # orbax restores arrays COMMITTED to one device; re-place them
        # replicated over the mesh or the jitted step rejects the mix with
        # the mesh-sharded batches
        state = jax.device_put(state, replicated_sharding(mesh))
        logger.log(f"resumed from {flags.resume} at step {int(state.step)}")
    dropout_rng = jax.random.PRNGKey((flags.seed or 0) + 1)

    def to_named(batch_tuple):
        data, labels, weights = batch_tuple
        return {"points": data, "labels": labels, "weights": weights}

    num_train_batches = train_ds.get_num_batches(cfg.batch_size)
    num_val_batches = val_ds.get_num_batches(cfg.batch_size)
    logger.log(
        f"train batches/epoch: {num_train_batches}, val batches: {num_val_batches}"
    )
    if num_train_batches == 0:
        # Without this guard the epoch loop runs zero batches and the metric
        # logging dereferences an unbound `metrics` (a real NameError bug).
        raise ValueError(
            f"train split '{flags.train_set}' has {train_ds.get_total_num_points()}"
            f" points across {len(train_ds.list_file_data)} scenes — that is 0"
            f" batches of batch_size={cfg.batch_size} x num_point={cfg.num_point};"
            " reduce batch_size/num_point or provide more data"
        )
    if num_val_batches == 0:
        logger.log("validation split yields 0 batches; skipping eval epochs")

    train_producer = BatchProducer(
        lambda: to_named(train_ds.sample_batch_in_all_files(cfg.batch_size, True)),
        max_queue=16,
        num_workers=max(os.cpu_count() or 1, 2),
    )
    val_producer = BatchProducer(
        lambda: to_named(val_ds.sample_batch_in_all_files(cfg.batch_size, False)),
        max_queue=8,
        num_workers=2,
    )
    # H2D overlap: batches are transferred to HBM (sharded over the mesh)
    # while the previous step computes, so the TPU never waits on the host
    # (replaces the reference's feed_dict transfer inside the hot loop,
    # train.py:225-244).
    sharding = batch_sharding(mesh)
    train_iter = device_prefetch(train_producer, sharding=sharding, depth=2)
    val_iter = device_prefetch(val_producer, sharding=sharding, depth=2)

    best_acc = 0.0
    try:
        for epoch in range(cfg.max_epoch):
            logger.log(f"**** EPOCH {epoch:03d} ****  {datetime.now()}")
            cm = ConfusionMatrix(train_ds.num_classes)
            # Accumulate metrics ON DEVICE; one host transfer per epoch. A
            # per-step float() sync costs 30-50 ms through a tunneled TPU and
            # serializes the pipeline.
            dev_losses = []
            dev_cm = None
            dev_wok = None
            for i in range(num_train_batches):
                update_progress(i / max(num_train_batches, 1))
                batch = next(train_iter)
                state, metrics = trainer.train_step(state, batch, dropout_rng)
                dev_losses.append(metrics["loss"])
                dev_cm = (
                    metrics["confusion"]
                    if dev_cm is None
                    else dev_cm + metrics["confusion"]
                )
                if "window_ok" in metrics:
                    dev_wok = (
                        metrics["window_ok"]
                        if dev_wok is None
                        else jnp.logical_and(dev_wok, metrics["window_ok"])
                    )
                last_metrics = metrics
            update_progress(1.0)
            print()
            losses = np.asarray(jnp.stack(dev_losses)) if dev_losses else np.zeros(1)
            if dev_cm is not None:
                cm.increment_from_matrix(dev_cm)
            if dev_wok is not None and not bool(dev_wok):
                # The kernels' sown exactness certificates are AND-ed across
                # every train batch of the epoch on device (free — they are
                # computed regardless); a failure means some batch's windowed
                # neighbor query dropped candidates and its gradients were
                # wrong, so abort rather than keep training on bad groupings.
                raise ValueError(
                    f"--bq_window={flags.bq_window} / "
                    f"--fp_window={flags.fp_window} exactness certificate "
                    f"failed on a training batch during epoch {epoch}; the "
                    "window is too small for this data — recalibrate with "
                    "tools/bq_window_calibrate.py or --bq_window auto"
                )
            logger.log(f"mean loss: {float(losses.mean()):f}")
            logger.log(f"Overall accuracy : {cm.get_accuracy():f}")
            logger.log(f"Average IoU : {cm.get_mean_iou():f}")
            logger.scalars(
                int(state.step),
                "train",
                loss=float(losses.mean()),
                accuracy=cm.get_accuracy(),
                learning_rate=last_metrics["learning_rate"],
                bn_decay=last_metrics["bn_decay"],
            )
            ious = [0.0] + cm.get_per_class_ious()
            for c in range(1, train_ds.num_classes):
                logger.log(f"IoU of {train_ds.labels_names[c]} : {ious[c]:f}")

            acc = best_acc
            if epoch % 5 == 0 and num_val_batches > 0:
                vcm = ConfusionMatrix(val_ds.num_classes)
                dev_vcm = None
                vlosses = []
                dev_vwok = None
                for i in range(num_val_batches):
                    batch = next(val_iter)
                    metrics = trainer.eval_step(state, batch)
                    vlosses.append(metrics["loss"])
                    dev_vcm = (
                        metrics["confusion"]
                        if dev_vcm is None
                        else dev_vcm + metrics["confusion"]
                    )
                    if "window_ok" in metrics:
                        dev_vwok = (
                            metrics["window_ok"]
                            if dev_vwok is None
                            else jnp.logical_and(dev_vwok, metrics["window_ok"])
                        )
                if dev_vwok is not None and not bool(dev_vwok):
                    # Every eval batch's sown exactness certificates are
                    # AND-ed on device (free — the windowed kernels compute
                    # them regardless); a too-small window silently drops
                    # neighbors, so abort rather than validate on wrong
                    # groupings.
                    raise ValueError(
                        f"--bq_window={flags.bq_window} / "
                        f"--fp_window={flags.fp_window} is too small "
                        "for this dataset (exactness certificate "
                        "failed on a validation batch); recalibrate "
                        "with tools/bq_window_calibrate.py"
                    )
                if dev_vcm is not None:
                    vcm.increment_from_matrix(dev_vcm)
                acc = vcm.get_accuracy()
                logger.log(f"---- EPOCH {epoch:03d} EVALUATION ----")
                logger.log(f"eval accuracy: {acc:f}  mIoU: {vcm.get_mean_iou():f}")
                vious = [0.0] + vcm.get_per_class_ious()
                for c in range(1, val_ds.num_classes):
                    logger.log(
                        f"eval IoU of {val_ds.labels_names[c]} : {vious[c]:f}"
                    )
                logger.scalars(
                    int(state.step), "validation", accuracy=acc,
                    miou=vcm.get_mean_iou(),
                    **{
                        f"iou_{val_ds.labels_names[c]}": vious[c]
                        for c in range(1, val_ds.num_classes)
                    },
                )

            if acc > best_acc:
                best_acc = acc
                path = os.path.abspath(
                    os.path.join(cfg.logdir, f"best_model_epoch_{epoch:03d}")
                )
                save_checkpoint(path, state)
                logger.log(f"Model saved in file: {path}")
            if epoch % 10 == 0:
                path = os.path.abspath(os.path.join(cfg.logdir, "model"))
                save_checkpoint(path, state)
                logger.log(f"Model saved in file: {path}")
    finally:
        # Crash/interrupt-safe autosave: whatever stopped the loop (SIGINT,
        # preemption-raised exception, normal completion), the latest state is
        # recoverable via --resume. The reference loses everything since the
        # last periodic save (train.py:455-460).
        try:
            if int(state.step) > 0:
                path = os.path.abspath(os.path.join(cfg.logdir, "model_autosave"))
                save_checkpoint(path, state)
                logger.log(f"Autosaved state at step {int(state.step)}: {path}")
        except Exception as e:  # never mask the original exception
            logger.log(f"autosave failed: {e}")
        train_producer.stop()
        val_producer.stop()
        logger.close()


if __name__ == "__main__":
    main()
