#!/usr/bin/env python3
"""Serving-daemon throughput: micro-batching vs one-request-at-a-time.

Launches the real :class:`pointnet2_tpu.serving.PredictServer` in-process
(real HTTP over loopback) on a fixed-batch TPU artifact and measures
sustained predict throughput two ways:

- **sequential**: one client, one cloud per request — every request pays a
  full device dispatch (the tunneled-TPU ~26 ms sync dominates).
- **concurrent**: ``--clients`` threads, one cloud per request — the
  batcher coalesces them into shared device batches (watch
  ``/stats.batched_clouds``), amortizing the dispatch across the compiled
  batch.

This is a LATENCY-regime benchmark of the serving layer, not the kernel
headline (bench.py's slope-time throughput excludes dispatch overhead by
design; a network server cannot). The reference has no serving path to
compare against (/root/reference/predict.py:44-63 rebuilds the TF1 graph
in-process).

Usage: python tools/serve_bench.py [--batch 8] [--clients 8] [--reqs 32]
       [--out artifacts/serve-bench.txt]
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post_npy(port: int, body: bytes) -> np.ndarray:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict", data=body, method="POST"
    )
    req.add_header("Content-Type", "application/x-npy")
    req.add_header("Accept", "application/x-npy")
    with urllib.request.urlopen(req, timeout=300) as r:
        return np.load(io.BytesIO(r.read()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=32)
    ap.add_argument("--max_delay_ms", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    flags = ap.parse_args()

    import jax

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.export import export_model
    from pointnet2_tpu.serving import PredictServer
    from pointnet2_tpu.train.trainer import Trainer

    print("backend:", jax.default_backend())
    cfg = Config()
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    art = tempfile.mkdtemp(prefix="serve_bench_")
    export_model(trainer, state, art, batch=flags.batch)

    server = PredictServer(
        art, port=0, max_batch=flags.batch, max_delay_ms=flags.max_delay_ms
    )
    server.start_background()
    rng = np.random.RandomState(0)
    pts = rng.randn(1, cfg.num_point, cfg.point_dim).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pts)
    body = buf.getvalue()
    _post_npy(server.port, body)  # HTTP-path warmup

    lines = [f"serve_bench: batch={flags.batch} reqs={flags.reqs} "
             f"num_point={cfg.num_point} backend={jax.default_backend()}"]

    def run(n_clients: int, label: str) -> float:
        before = server.stats.snapshot()
        t0 = time.monotonic()
        with ThreadPoolExecutor(max_workers=n_clients) as ex:
            list(ex.map(lambda _: _post_npy(server.port, body), range(flags.reqs)))
        dt = time.monotonic() - t0
        after = server.stats.snapshot()
        batches = after["device_batches"] - before["device_batches"]
        coalesced = after["batched_clouds"] - before["batched_clouds"]
        pts_s = flags.reqs * cfg.num_point / dt
        line = (
            f"{label:>10}: {flags.reqs} reqs in {dt * 1e3:7.1f} ms = "
            f"{dt * 1e3 / flags.reqs:6.1f} ms/req, {pts_s / 1e6:.3f} M pts/s, "
            f"{batches} device batches ({coalesced} clouds coalesced)"
        )
        print(line)
        lines.append(line)
        return pts_s

    seq = run(1, "sequential")
    conc = run(flags.clients, f"{flags.clients} clients")
    lines.append(f"micro-batching speedup: {conc / seq:.2f}x")
    print(lines[-1])
    server.shutdown()

    if flags.out:
        os.makedirs(os.path.dirname(flags.out) or ".", exist_ok=True)
        with open(flags.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", flags.out)


if __name__ == "__main__":
    main()
