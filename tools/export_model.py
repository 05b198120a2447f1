#!/usr/bin/env python3
"""Export a trained checkpoint as a self-contained serving artifact.

StableHLO via jax.export: weights baked in, loadable with jax alone (no
model code). See pointnet2_tpu/export.py. The reference has no serving
export — its predictions require rebuilding the TF1 graph from source
(/root/reference/predict.py:44-63).

Usage:
  python tools/export_model.py --ckpt log/best --out result/export \
      [--config_file semantic.json] [--batch 0] [--dtype bfloat16] \
      [--output labels|logits]

--batch 0 (default) exports a symbolic batch dimension (one artifact, any
batch, unchunked forward); a fixed --batch N exports the chunked forward.
Export on the platform you serve on (TPU exports carry the Pallas kernels).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config_file", default="semantic.json")
    ap.add_argument("--out", default=os.path.join("result", "export"))
    ap.add_argument("--batch", type=int, default=0, help="0 = symbolic batch")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--output", default="labels", choices=["labels", "logits"])
    from pointnet2_tpu.ops.calibrate import parse_window_arg

    ap.add_argument(
        "--bq_window",
        type=parse_window_arg,
        default=None,
        help="calibrated ball-query x-window (tools/bq_window_calibrate.py); "
        "an int, or a per-level comma list like '3072,768,-,-'; the "
        "exported callable then returns (output, ok) with the per-batch "
        "exactness certificate and the manifest records the width",
    )
    ap.add_argument(
        "--fp_window",
        type=parse_window_arg,
        default=None,
        help="calibrated 3-NN x-window for the FP decoder (see --bq_window)",
    )
    ap.add_argument(
        "--bf16_min_width",
        type=int,
        default=None,
        help="selective mixed precision threshold for --dtype bfloat16 "
        "(Trainer.bf16_min_width; 128 keeps the narrow SA1/SA2 encoders "
        "f32 — PERFORMANCE.md 'Round 5: selective bf16')",
    )
    ap.add_argument(
        "--calibration_set",
        default="train",
        help="dataset split sampled for --bq_window/--fp_window auto "
        "calibration (needs cfg.data_path scenes on disk)",
    )
    ap.add_argument(
        "--arch",
        default="ssg",
        choices=["ssg", "msg"],
        help="model architecture — must match the checkpoint's "
        "(train.py --arch)",
    )
    flags = ap.parse_args()

    import jax

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.export import export_model
    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint

    cfg = Config.from_json(flags.config_file)
    if flags.bq_window == "auto" or flags.fp_window == "auto":
        # Same self-calibration as predict.py/train.py: sample real batches
        # from the dataset named by the config and pick per-op-safe widths.
        # Serving exports bake the width into the artifact; the exported
        # callable still returns the per-batch exactness certificate.
        import numpy as np

        from pointnet2_tpu.data.semantic3d import SemanticDataset
        from pointnet2_tpu.ops.calibrate import calibrate_model_windows

        try:
            dataset = SemanticDataset(
                num_points_per_sample=cfg.num_point,
                split=flags.calibration_set,
                box_size_x=cfg.box_size_x,
                box_size_y=cfg.box_size_y,
                use_color=bool(cfg.use_color),
                path=cfg.data_path,
                seed=0,
            )
        except (OSError, ValueError) as e:
            ap.error(
                "--bq_window/--fp_window auto needs calibration data "
                f"(cfg.data_path={cfg.data_path!r}, split="
                f"{flags.calibration_set!r}: {e}); pass integer widths "
                "from tools/bq_window_calibrate.py instead"
            )
        crng = np.random.RandomState(0)

        def sample_xyz() -> "np.ndarray":
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
    trainer = Trainer(
        cfg=cfg,
        arch=flags.arch,
        infer_dtype=flags.dtype,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
        bf16_min_width=flags.bf16_min_width,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_checkpoint(os.path.abspath(flags.ckpt), state)

    manifest = export_model(
        trainer,
        state,
        flags.out,
        batch=flags.batch or None,
        output=flags.output,
    )
    print(
        f"exported {manifest['artifact_bytes']} bytes "
        f"({manifest['output']}, platforms {manifest['platforms']}) "
        f"-> {flags.out}"
    )


if __name__ == "__main__":
    main()
