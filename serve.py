#!/usr/bin/env python3
"""Serve a trained model over HTTP with TPU micro-batching.

The production serving daemon around :mod:`pointnet2_tpu.serving`: loads a
self-contained StableHLO artifact (tools/export_model.py) — or exports one
in-process from a checkpoint — warms the compile, and serves
``POST /v1/predict`` with concurrent-request micro-batching, pad-to-batch,
and per-batch window-certificate rejection. The reference has no serving
path at all (predictions rebuild the TF1 graph in-process,
/root/reference/predict.py:44-63).

Usage:
  # from an exported artifact (no model code needed at the host):
  python serve.py --artifact result/export --port 8080

  # from a checkpoint (exports to a temp dir first; flags mirror
  # tools/export_model.py):
  python serve.py --ckpt log/best --config_file semantic.json \
      --batch 64 --dtype bfloat16 --bf16_min_width 128 --port 8080

Client:
  curl -s localhost:8080/healthz
  curl -s -X POST localhost:8080/v1/predict -H 'Content-Type: application/json' \
      -d '{"points": [[...num_point rows of point_dim floats...]]}'
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", help="export_model.py output directory")
    ap.add_argument("--ckpt", help="orbax checkpoint to export + serve")
    ap.add_argument("--config_file", default="semantic.json")
    ap.add_argument("--arch", default="ssg", choices=["ssg", "msg"])
    ap.add_argument("--batch", type=int, default=64,
                    help="compiled device batch (export batch for --ckpt)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--bf16_min_width", type=int, default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_delay_ms", type=float, default=5.0,
                    help="micro-batching coalescing window")
    ap.add_argument("--no_warmup", action="store_true")
    flags = ap.parse_args()
    if bool(flags.artifact) == bool(flags.ckpt):
        ap.error("exactly one of --artifact / --ckpt is required")

    artifact = flags.artifact
    if flags.ckpt:
        import jax

        from pointnet2_tpu.config import Config
        from pointnet2_tpu.export import export_model
        from pointnet2_tpu.train.trainer import Trainer, restore_checkpoint

        cfg = Config.from_json(flags.config_file)
        trainer = Trainer(
            cfg=cfg,
            arch=flags.arch,
            infer_dtype=flags.dtype,
            bf16_min_width=flags.bf16_min_width,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = restore_checkpoint(os.path.abspath(flags.ckpt), state)
        artifact = tempfile.mkdtemp(prefix="serve_export_")
        manifest = export_model(trainer, state, artifact, batch=flags.batch)
        print(f"exported {manifest['artifact_bytes'] / 1e6:.1f} MB -> {artifact}")

    from pointnet2_tpu.serving import PredictServer

    server = PredictServer(
        artifact,
        host=flags.host,
        port=flags.port,
        max_batch=flags.batch,
        max_delay_ms=flags.max_delay_ms,
        warmup=not flags.no_warmup,
    )
    m = server.model.manifest
    print(
        f"serving {m['arch']} ({m['infer_dtype']}"
        f"{', certified windows' if m.get('window_certificate') else ''}) "
        f"batch={server.model.max_batch} on http://{flags.host}:{server.port}"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
