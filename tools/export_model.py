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
    flags = ap.parse_args()

    import jax

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.export import export_model
    from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint

    cfg = Config.from_json(flags.config_file)
    trainer = Trainer(
        cfg=cfg,
        infer_dtype=flags.dtype,
        bq_window=flags.bq_window,
        fp_window=flags.fp_window,
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
