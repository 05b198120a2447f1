#!/usr/bin/env python3
"""Experiment: does chunking the batch-64 forward recover the batch-8 peak?

PERFORMANCE.md round 1: points/s peaks at batch 8 (7.4M) and halves by
batch 128 (3.1M) — hypothesis: the large-batch HBM working set (grouped
tensors are ~512MB at B=64) defeats scheduling. A lax.map over batch chunks
keeps the working set at the small-batch size with one compile.

Usage: python tools/batch_chunk_bench.py [--batch 64] [--chunks 0 8 16 32]
(chunk 0 = unchunked full batch). K-slope timing per PERFORMANCE.md.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunks", type=int, nargs="+", default=[0, 8, 16, 32])
    ap.add_argument("--extra_batches", type=int, nargs="+", default=[128])
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    cfg = Config()
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)

    def forward(c):
        return trainer.model.apply(variables, c, train=False, bn_momentum=0.9)

    def make_step(batch, chunk):
        def step(c):
            if chunk and chunk < batch:
                xs = c.reshape(batch // chunk, chunk, cfg.num_point, -1)
                return lax.map(forward, xs)
            return forward(c)

        return step

    rows = []
    for batch in [args.batch] + list(args.extra_batches):
        x = jnp.asarray(
            rng.randn(batch, cfg.num_point, cfg.point_dim), jnp.float32
        )
        for chunk in args.chunks:
            if chunk > batch:
                continue
            t = slope_time(make_step(batch, chunk), x)
            pps = batch * cfg.num_point / t
            rows.append((batch, chunk, t, pps))
            print(
                f"batch {batch:4d} chunk {chunk or batch:4d}: "
                f"{t * 1e3:8.2f} ms  {pps / 1e6:6.2f} M pts/s",
                flush=True,
            )
    best = max(rows, key=lambda r: r[3])
    print(f"best: batch {best[0]} chunk {best[1] or best[0]} -> "
          f"{best[3] / 1e6:.2f} M pts/s")


if __name__ == "__main__":
    main()
