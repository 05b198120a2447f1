#!/usr/bin/env python3
"""bf16 inference mode: throughput + accuracy delta on real hardware.

Trains the flagship model briefly on a separable synthetic task (so logit
margins are real, not random-init noise), then measures:
- chunked forward throughput, f32 mode vs bf16 mode (K-slope timer);
- label agreement and logit error between the modes on held-out batches.

Context for the accuracy numbers: the "f32" mode on TPU already feeds the
MXU bf16 inputs (JAX default matmul precision), so the marginal error of
bf16 mode comes from storing activations in bf16 between ops. The BN-fold
(nn/fold.py) keeps that storage rounding at normalized scale.

Usage: python tools/bf16_bench.py [train_steps=150] [B=64]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg = Config()
    tr32 = Trainer(cfg=cfg)
    tr16 = Trainer(cfg=cfg, infer_dtype="bfloat16")
    state = tr32.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    def make_batch(b):
        pts = rng.rand(b, cfg.num_point, 6).astype(np.float32)
        pts[:, :, :3] *= 10.0  # spread over the box like real scenes
        labels = 1 + (pts[:, :, 2] > 5.0).astype(np.int32) + (
            pts[:, :, 0] > 5.0
        ).astype(np.int32) * 2  # 4 separable classes
        return {
            "points": jnp.asarray(pts),
            "labels": jnp.asarray(labels),
            "weights": jnp.ones((b, cfg.num_point), jnp.float32),
        }

    drng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(steps):
        state, m = tr32.train_step(state, make_batch(cfg.batch_size), drng)
    loss, acc = float(m["loss"]), float(m["accuracy"])  # sync before clock
    print(
        f"trained {steps} steps in {time.time() - t0:.0f}s, "
        f"final loss {loss:.4f} acc {acc:.4f}"
    )

    # accuracy delta on held-out batches
    agree, n = 0, 0
    maxd, scale = 0.0, 0.0
    for _ in range(3):
        batch = make_batch(8)
        l32 = tr32._infer_logits(state, batch["points"])
        l16 = tr16._infer_logits(state, batch["points"])
        p32 = jnp.argmax(l32, -1)
        p16 = jnp.argmax(l16, -1)
        agree += int(jnp.sum((p32 == p16).astype(jnp.int32)))
        n += p32.size
        maxd = max(maxd, float(jnp.abs(l32 - l16.astype(jnp.float32)).max()))
        scale = max(scale, float(jnp.abs(l32).max()))
    print(
        f"label agreement bf16 vs f32: {agree}/{n} = {agree / n:.6f}; "
        f"max |dlogit| {maxd:.4f} on logit scale {scale:.2f}"
    )

    # throughput at batch B, production chunked forward
    x = jnp.asarray(rng.rand(B, cfg.num_point, 6).astype(np.float32))
    for name, tr in (("f32", tr32), ("bf16", tr16)):
        def fwd(c, tr=tr):
            return tr._infer_logits(state, c)
        t = slope_time(fwd, x, K0=2, K1=6)
        print(
            f"forward B={B} chunk={tr.infer_chunk} [{name}]: "
            f"{t * 1e3:.1f} ms  ({B * cfg.num_point / t / 1e6:.2f} M pts/s)"
        )


if __name__ == "__main__":
    main()
