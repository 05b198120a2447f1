#!/usr/bin/env python3
"""Honest train-step and stage-level timing at the flagship scale.

Slope method (see bench.py): per-step cost = (T(K1) - T(K0)) / (K1 - K0)
with scalar float() readbacks and distinct inputs per rep.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def slope_time(step_to_scalar, x, Ks=(2, 10), reps=3):
    loops = {}
    for K in Ks:
        @jax.jit
        def loop(x, K=K):
            def body(c, _):
                out = step_to_scalar(c)
                c = c + out.astype(jnp.float32) * jnp.float32(1e-38)
                return c, ()
            c, _ = lax.scan(body, x, None, length=K)
            return c.sum()
        float(loop(x))
        loops[K] = loop
    med = {}
    for K, loop in loops.items():
        ts = []
        for i in range(reps):
            xi = x + jnp.float32(i + 1) * 1e-7
            t = time.time()
            float(loop(xi))
            ts.append(time.time() - t)
        med[K] = float(np.median(ts))
    k0, k1 = Ks
    return (med[k1] - med[k0]) / (k1 - k0)


def main():
    from pointnet2_tpu.config import Config
    from pointnet2_tpu.models import weighted_ce_loss
    from pointnet2_tpu.train.trainer import Trainer

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = 16  # reference training batch (semantic.json:8)
    cfg = Config()
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, cfg.num_point, 6), jnp.float32)
    labels = jnp.asarray(rng.randint(1, 9, (B, cfg.num_point)), jnp.int32)
    weights = jnp.ones((B, cfg.num_point), jnp.float32)

    if which in ("all", "fwd"):
        def fwd(c):
            logits = trainer.model.apply(variables, c, train=False, bn_momentum=0.9)
            return logits.sum()

        t = slope_time(fwd, x)
        print(f"fwd B={B}: {t*1e3:.1f} ms  ({B*cfg.num_point/t/1e6:.2f} M pts/s)")

    if which in ("all", "train"):
        tx = trainer.tx
        def train_scalar(c):
            def loss_fn(params):
                logits, mutated = trainer.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    c, train=True, bn_momentum=0.9,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"],
                )
                return weighted_ce_loss(logits, labels, weights), mutated
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return loss + gsum

        t = slope_time(train_scalar, x, Ks=(2, 6))
        print(f"train(fwd+bwd) B={B}: {t*1e3:.1f} ms  ({B*cfg.num_point/t/1e6:.2f} M pts/s)")


if __name__ == "__main__":
    main()
