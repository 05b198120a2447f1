#!/usr/bin/env python3
"""Convert a reference TF checkpoint into an orbax checkpoint for this repo.

Usage:
    python tools/convert_checkpoint.py --tf_ckpt logs/.../best_model_epoch_275.ckpt \
        --out log/semantic/converted [--config_file semantic.json]

Accepts a TF V2 checkpoint prefix (needs tensorflow importable) or an .npz
export (`np.savez(out, **{v.op.name: sess.run(v) for v in tf.global_variables()})`
from any TF1 environment). Writes a full TrainState checkpoint (fresh
optimizer state) that train.py --resume / predict.py --ckpt consume.

Variable-name mapping and its tests: pointnet2_tpu/convert.py,
tests/test_ref_parity.py (logit/grad/BN parity against the actual reference
model code).
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tf_ckpt", required=True, help="TF ckpt prefix or .npz")
    ap.add_argument("--out", required=True, help="output orbax checkpoint dir")
    ap.add_argument("--config_file", default="semantic.json")
    args = ap.parse_args()

    import jax

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.convert import convert_checkpoint
    from pointnet2_tpu.train.trainer import Trainer, save_checkpoint

    cfg = Config.from_json(args.config_file)
    variables = convert_checkpoint(args.tf_ckpt)

    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    # shape-check against the model the config describes
    import numpy as np

    x = np.zeros((1, cfg.num_point, cfg.point_dim), np.float32)
    trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
    )
    save_checkpoint(os.path.abspath(args.out), state)
    print(f"wrote converted checkpoint to {args.out}")


if __name__ == "__main__":
    main()
