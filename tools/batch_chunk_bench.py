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
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer


def slope_time(fn_k, x, K0=2, K1=10, reps=3):
    l0, l1 = fn_k(K0), fn_k(K1)
    float(l0(x))
    float(l1(x))
    t0s, t1s = [], []
    for i in range(reps):
        xi = x + jnp.float32(i + 1) * 1e-7
        s = time.time()
        float(l0(xi))
        t0s.append(time.time() - s)
        s = time.time()
        float(l1(xi))
        t1s.append(time.time() - s)
    return (float(np.median(t1s)) - float(np.median(t0s))) / (K1 - K0)


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

    def make_fn(batch, chunk):
        def fn_k(k):
            @jax.jit
            def loop(x):
                def body(c, _):
                    if chunk and chunk < batch:
                        xs = c.reshape(batch // chunk, chunk, cfg.num_point, -1)
                        logits = lax.map(forward, xs)
                    else:
                        logits = forward(c)
                    c = c + logits.sum().astype(jnp.float32) * jnp.float32(1e-38)
                    return c, ()

                c, _ = lax.scan(body, x, None, length=k)
                return c.sum()

            return loop

        return fn_k

    rows = []
    for batch in [args.batch] + list(args.extra_batches):
        x = jnp.asarray(
            rng.randn(batch, cfg.num_point, cfg.point_dim), jnp.float32
        )
        for chunk in args.chunks:
            if chunk > batch:
                continue
            t = slope_time(make_fn(batch, chunk), x)
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
