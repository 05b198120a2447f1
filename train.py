#!/usr/bin/env python3
"""Train PointNet++ on Semantic3D (TPU).

CLI parity with the reference's train.py: --train_set {train,train_full},
--config_file semantic.json. Differences are TPU-native: jitted fused train
step on a data-parallel mesh, async host prefetch instead of mp.Queue
(train.py:134-196), device-side confusion matrices instead of the per-point
Python loop (train.py:249-251), orbax checkpoints instead of tf.train.Saver.

Extra flags (not in the reference): --resume to continue from a checkpoint,
--max_epoch / --data_path overrides, --seed, and multi-process scale-out via
--dist_coordinator/--dist_num_processes/--dist_process_id (the reference is
single-GPU, train.py:333-339; here N processes x M local devices form one
global data-parallel mesh — each process feeds its shard of the global
batch, XLA all-reduces gradients, and only process 0 writes logs while
checkpoints are written collectively through orbax's multi-process path).
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
    parser.add_argument(
        "--hoist_geometry",
        type=int,
        default=1,
        choices=(0, 1),
        help="with --accum_steps > 1: compute FPS/ball-query/3-NN once at "
        "full batch width before the microbatch scan (full kernel "
        "occupancy; Trainer.hoist_geometry). 0 = per-microbatch geometry",
    )
    from pointnet2_tpu.ops.calibrate import parse_window_arg as window_arg

    parser.add_argument(
        "--bq_window",
        type=window_arg,
        default=None,
        help="calibrated ball-query x-window: an int from "
        "tools/bq_window_calibrate.py, a per-SA-level comma list like "
        "'3072,768,-,-' ('-' = exact at that level), or 'auto' to "
        "self-calibrate from "
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
    parser.add_argument(
        "--train_dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="training compute dtype: bfloat16 = mixed precision (bf16 "
        "MLP matmuls/activations; f32 master weights, BN stats, geometry "
        "ops, logits, loss — see Trainer.train_dtype); checkpoints stay "
        "f32 either way",
    )
    parser.add_argument(
        "--bf16_min_width",
        type=int,
        default=None,
        help="selective mixed precision: with --train_dtype bfloat16, "
        "stages whose narrowest MLP width is below this stay f32 (128 "
        "keeps the narrow SA1/SA2 encoders f32 — see "
        "Trainer.bf16_min_width and PERFORMANCE.md 'Round 5: selective "
        "bf16'). Default: uniform bf16",
    )
    parser.add_argument(
        "--arch",
        default="ssg",
        choices=["ssg", "msg"],
        help="model architecture: 'ssg' (the reference flagship) or 'msg' "
        "(multi-scale grouping — the reference ships the module, "
        "util/pointnet_util.py:219-282, but never trains it; here it is "
        "end-to-end trainable, incl. hoisted geometry and calibrated "
        "windows)",
    )
    parser.add_argument(
        "--dist_coordinator",
        default=None,
        help="host:port of process 0 for jax.distributed; enables "
        "multi-process training (all processes form ONE global "
        "data-parallel mesh over their combined devices)",
    )
    parser.add_argument(
        "--dist_num_processes",
        type=int,
        default=None,
        help="total process count for jax.distributed (with "
        "--dist_coordinator/--dist_process_id)",
    )
    parser.add_argument(
        "--dist_process_id",
        type=int,
        default=None,
        help="this process's index in [0, dist_num_processes)",
    )
    parser.add_argument(
        "--dist_sampling",
        choices=["sharded", "replicated"],
        default="sharded",
        help="multi-process batch assembly: 'sharded' (default) = each "
        "process samples only its batch_size/num_processes shard with a "
        "process-decorrelated seed (host sampling cost scales out); "
        "'replicated' = every process draws the SAME global batch from an "
        "identically-seeded deterministic sampler and contributes only its "
        "rows — bit-identical batches to a single-process run with the "
        "same seed (requires --seed; forces --num_workers 1 so the batch "
        "order is deterministic across processes)",
    )
    parser.add_argument(
        "--num_workers",
        type=int,
        default=None,
        help="batch-producer sampler threads (default: cpu count; forced "
        "to 1 by --dist_sampling replicated)",
    )
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.parallel.multihost import (
        barrier,
        global_batch_from_local,
        local_rows,
        maybe_initialize_distributed,
        replicate_state_on_mesh,
    )

    # Must precede any device access (including the compilation-cache setup).
    maybe_initialize_distributed(
        flags.dist_coordinator, flags.dist_num_processes, flags.dist_process_id
    )
    nproc = jax.process_count()
    is_main = jax.process_index() == 0
    if flags.dist_sampling == "replicated" and nproc > 1:
        if flags.seed is None:
            parser.error("--dist_sampling replicated requires --seed (every "
                         "process must draw the same global batches)")
        # One sampler thread per producer keeps the batch ORDER deterministic
        # across processes; with several threads each process would assemble
        # its slice from a differently-ordered stream — silently inconsistent
        # global batches.
        flags.num_workers = 1

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
    from pointnet2_tpu.utils.logging import (
        NullLogger,
        RunLogger,
        update_progress,
    )
    from pointnet2_tpu.utils.metrics import ConfusionMatrix

    cfg = Config.from_json(flags.config_file)
    if flags.max_epoch is not None:
        cfg = cfg.replace(max_epoch=flags.max_epoch)
    if flags.data_path is not None:
        cfg = cfg.replace(data_path=flags.data_path)
    if cfg.batch_size % nproc:
        parser.error(
            f"batch_size {cfg.batch_size} must divide by the process count "
            f"{nproc} (each process feeds batch_size/num_processes samples)"
        )

    # Only process 0 writes log_train.txt / scalars.jsonl / TensorBoard
    # exports; a multi-process launch must not double-write run artifacts.
    logger = (
        RunLogger(cfg.logdir) if is_main else NullLogger(jax.process_index())
    )
    logger.log(
        f"devices: {jax.devices()}"
        + (f" ({nproc} processes)" if nproc > 1 else "")
    )

    # "sharded" distributed sampling: decorrelate each process's draw stream
    # (its shard is an independent sample of the same distribution);
    # "replicated": identical seeds so every process draws the same batches.
    ds_seed = flags.seed
    if nproc > 1 and flags.dist_sampling == "sharded" and flags.seed is not None:
        ds_seed = flags.seed + 9973 * jax.process_index()
    train_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split=flags.train_set,
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=cfg.data_path,
        seed=ds_seed,
    )
    val_ds = SemanticDataset(
        num_points_per_sample=cfg.num_point,
        split="validation",
        box_size_x=cfg.box_size_x,
        box_size_y=cfg.box_size_y,
        use_color=bool(cfg.use_color),
        path=cfg.data_path,
        seed=ds_seed,
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
        if nproc > 1:
            # Every process must trace the SAME program: take the max
            # calibrated window across processes (a larger window is a
            # superset — anything the smaller certifies, it certifies).
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                np.array([
                    -1 if auto_bq is None else auto_bq,
                    -1 if auto_fp is None else auto_fp,
                ], np.int64)
            )
            auto_bq = int(gathered[:, 0].max())
            auto_fp = int(gathered[:, 1].max())
            auto_bq = None if auto_bq < 0 else auto_bq
            auto_fp = None if auto_fp < 0 else auto_fp
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
        arch=flags.arch,
        accum_steps=flags.accum_steps,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
        train_dtype=flags.train_dtype,
        bf16_min_width=flags.bf16_min_width,
        hoist_geometry=bool(flags.hoist_geometry),
    )
    state = trainer.init_state(jax.random.PRNGKey(flags.seed or 0))
    if flags.resume:
        state = restore_checkpoint(os.path.abspath(flags.resume), state)
        # orbax restores arrays COMMITTED to one device; re-place them
        # replicated over the mesh or the jitted step rejects the mix with
        # the mesh-sharded batches. Multi-process: device_put cannot target
        # non-addressable devices, so each process contributes its full
        # local copy (identical checkpoint bytes on every process).
        if nproc > 1:
            state = replicate_state_on_mesh(state, mesh)
        else:
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

    # Per-process sampler size: "replicated" draws the full global batch on
    # every process (and contributes only its rows at put time); "sharded"
    # draws just this process's shard.
    if nproc > 1 and flags.dist_sampling == "sharded":
        sample_bs = cfg.batch_size // nproc
    else:
        sample_bs = cfg.batch_size
    train_workers = (
        flags.num_workers
        if flags.num_workers is not None
        else max(os.cpu_count() or 1, 2)
    )
    val_workers = min(2, train_workers)
    train_producer = BatchProducer(
        lambda: to_named(train_ds.sample_batch_in_all_files(sample_bs, True)),
        max_queue=16,
        num_workers=train_workers,
    )
    val_producer = BatchProducer(
        lambda: to_named(val_ds.sample_batch_in_all_files(sample_bs, False)),
        max_queue=8,
        num_workers=val_workers,
    )
    # H2D overlap: batches are transferred to HBM (sharded over the mesh)
    # while the previous step computes, so the TPU never waits on the host
    # (replaces the reference's feed_dict transfer inside the hot loop,
    # train.py:225-244).
    sharding = batch_sharding(mesh)
    if nproc > 1:
        # Multi-process assembly: each process contributes its rows of the
        # global batch (make_array_from_process_local_data under the hood).
        if flags.dist_sampling == "replicated":
            put_fn = lambda b: global_batch_from_local(local_rows(b), mesh)
        else:
            put_fn = lambda b: global_batch_from_local(b, mesh)
        train_iter = device_prefetch(train_producer, put_fn=put_fn, depth=2)
        val_iter = device_prefetch(val_producer, put_fn=put_fn, depth=2)
    else:
        train_iter = device_prefetch(train_producer, sharding=sharding, depth=2)
        val_iter = device_prefetch(val_producer, sharding=sharding, depth=2)

    if nproc > 1:
        # Prime the collective contexts while the processes are aligned:
        # Gloo's context handshake has a hard 30 s timeout, and the jitted
        # steps dispatch asynchronously — without this, a fast process
        # enqueues a whole epoch and opens the handshake while a slow
        # process is still in a cold-cache compile (observed: the first
        # multi-process CLI run died exactly this way). Rendezvous on the
        # coordination-service barrier (10 min timeout), run ONE throwaway
        # train + eval step on a zero batch (compiles both programs AND
        # creates the Gloo contexts with every process in lockstep), then
        # re-align before the real loop.
        barrier("pn2:before_prime")
        local_bs = cfg.batch_size // nproc
        dummy = global_batch_from_local(
            {
                "points": np.zeros(
                    (local_bs, cfg.num_point, cfg.point_dim), np.float32
                ),
                "labels": np.zeros((local_bs, cfg.num_point), np.int32),
                "weights": np.zeros((local_bs, cfg.num_point), np.float32),
            },
            mesh,
        )
        # train_step donates its state arg: prime on a copy and discard.
        prime_state = jax.tree.map(jnp.copy, state)
        jax.block_until_ready(
            trainer.train_step(prime_state, dummy, dropout_rng)
        )
        if num_val_batches > 0:
            jax.block_until_ready(trainer.eval_step(state, dummy))
        del prime_state, dummy
        barrier("pn2:after_prime")
        logger.log("multi-process priming done (train/eval compiled, "
                   "collective contexts live)")

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
                if is_main:
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
            if is_main:
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
