#!/usr/bin/env python3
"""Measure the train-loop step time with vs without device_prefetch.

Simulates the real loop: a BatchProducer with a (optionally throttled)
sampler feeding Trainer.train_step, either through a synchronous per-step
shard_batch transfer (round-1 behavior) or through device_prefetch (H2D
overlapped with compute). Reports steady-state wall-clock per step.

Usage: python tools/prefetch_bench.py [--steps 40] [--throttle_ms 10]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from pointnet2_tpu.config import Config
from pointnet2_tpu.data.pipeline import BatchProducer, device_prefetch
from pointnet2_tpu.parallel import batch_sharding, create_mesh, shard_batch
from pointnet2_tpu.train.trainer import Trainer


def run_loop(trainer, state, batch_iter, steps):
    drng = jax.random.PRNGKey(1)
    # warmup/compile
    state, m = trainer.train_step(state, next(batch_iter), drng)
    float(m["loss"])
    times = []
    t0 = time.time()
    for i in range(steps):
        state, m = trainer.train_step(state, next(batch_iter), drng)
    float(m["loss"])  # sync once at the end
    total = time.time() - t0
    return total / steps, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--throttle_ms", type=float, default=10.0)
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    cfg = Config().replace(batch_size=args.batch)
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = create_mesh()
    rng = np.random.RandomState(0)

    def sample():
        if args.throttle_ms:
            time.sleep(args.throttle_ms / 1e3)
        return {
            "points": rng.randn(args.batch, cfg.num_point, cfg.point_dim).astype(
                np.float32
            ),
            "labels": rng.randint(
                0, 9, size=(args.batch, cfg.num_point)
            ).astype(np.int32),
            "weights": np.ones((args.batch, cfg.num_point), np.float32),
        }

    results = {}
    for mode in ("sync", "prefetch"):
        producer = BatchProducer(sample, max_queue=8, num_workers=4)
        if mode == "prefetch":
            it = device_prefetch(producer, sharding=batch_sharding(mesh), depth=2)
        else:
            it = (shard_batch(producer.get(), mesh) for _ in iter(int, 1))
        dt, state = run_loop(trainer, state, it, args.steps)
        producer.stop()
        results[mode] = dt
        print(f"{mode:9s}: {dt * 1e3:8.2f} ms/step "
              f"({args.batch * cfg.num_point / dt / 1e6:.2f} M pts/s)", flush=True)
    speedup = results["sync"] / results["prefetch"]
    print(f"prefetch speedup: {speedup:.3f}x "
          f"(throttle {args.throttle_ms} ms, batch {args.batch})")


if __name__ == "__main__":
    main()
