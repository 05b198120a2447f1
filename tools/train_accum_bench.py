#!/usr/bin/env python3
"""Train-step throughput: monolithic vs gradient-accumulated microbatches.

Measures the FULL train step (forward + backward + optimizer update +
device metrics, i.e. Trainer._train_step math) at several batch sizes and
accum_steps values with the canonical K-slope timer. The hypothesis under
test mirrors the inference finding (tools/batch_chunk_bench.py): the
grouped tensors' HBM working set grows ~8 MB/sample in the backward, so
splitting a large batch into microbatches should keep large-batch training
at the small-batch rate.

Usage: python tools/train_accum_bench.py [B[,B...]] [G[,G...]] [bq_window]
       [fp_window] [train_dtype] [hoist] [bf16_min_width]
Defaults: B=16,32,64  G=1,2,4  bq_window=None  fp_window=None (exact full
ball query / 3-NN)  train_dtype=float32 ('bfloat16' = mixed precision)
hoist=1 (geometry hoisting for G>1, Trainer.hoist_geometry; pass 0 to
measure the per-microbatch geometry baseline)  bf16_min_width=None
(selective mixed precision threshold, Trainer.bf16_min_width; only with
train_dtype=bfloat16)

Data is sampled in the Semantic3D box regime (8 x 8 x 4.9 m uniform) —
the default path's cost is data-independent (tools/bq_e2e_probe.py), and
the calibrated-window paths (bq_window/fp_window args) require
representative data for their exactness certificates (asserted before
timing). Windowed neighbor ops are gradient-exact when certified: the
indices are integral and the 3-NN distances carry stop_gradient
(nn/pointnet.py), so the training gradients are bitwise those of the
exact path.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time
from pointnet2_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def measure(cfg, B, accum, window=None, fp_window=None, train_dtype="float32",
            hoist=True, bf16_min_width=None):
    trainer = Trainer(
        cfg=cfg, accum_steps=accum, bq_window=window, fp_window=fp_window,
        train_dtype=train_dtype, hoist_geometry=hoist,
        bf16_min_width=bf16_min_width,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(1, 9, (B, cfg.num_point)), jnp.int32)
    weights = jnp.ones((B, cfg.num_point), jnp.float32)
    x = np.zeros((B, cfg.num_point, 6), np.float32)
    x[..., :3] = rng.rand(B, cfg.num_point, 3) * [8.0, 8.0, 4.9]
    x[..., 3:] = rng.rand(B, cfg.num_point, 3)
    x = jnp.asarray(x)
    if window is not None or fp_window is not None:
        assert trainer.check_bq_window(state, x), (
            f"bq_window={window} / fp_window={fp_window} does not fit this data"
        )
    drng = jax.random.PRNGKey(0)

    def step(c):
        batch = {"points": c, "labels": labels, "weights": weights}
        new_state, metrics = trainer._train_step(state, batch, drng)
        # keep the whole update live so nothing is DCE'd
        psum = sum(jnp.sum(l) for l in jax.tree.leaves(new_state.params))
        return psum + metrics["loss"]

    k1 = 6 if B <= 32 else 4
    return slope_time(step, x, K0=2, K1=k1)


def main():
    bs = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["16", "32", "64"])]
    gs = [int(g) for g in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "2", "4"])]
    def opt_int(v):
        return None if v in ("None", "none", "-") else int(v)

    window = opt_int(sys.argv[3]) if len(sys.argv) > 3 else None
    fp_window = opt_int(sys.argv[4]) if len(sys.argv) > 4 else None
    train_dtype = sys.argv[5] if len(sys.argv) > 5 else "float32"
    if len(sys.argv) > 6:
        try:
            hoist = {"0": False, "1": True}[sys.argv[6]]
        except KeyError:
            raise SystemExit(f"hoist must be 0 or 1, got {sys.argv[6]!r}")
    else:
        hoist = True
    min_width = opt_int(sys.argv[7]) if len(sys.argv) > 7 else None
    cfg = Config()
    print(f"train step (fwd+bwd+Adam+metrics), N={cfg.num_point}, "
          f"bq_window={window}, fp_window={fp_window}, dtype={train_dtype}, "
          f"hoist={hoist}, bf16_min_width={min_width}")
    print(f"{'batch':>6} {'accum':>6} {'micro':>6} {'ms/step':>9} {'M pts/s':>9}")
    for B in bs:
        for g in gs:
            if B % g:
                continue
            t = measure(cfg, B, g, window, fp_window, train_dtype, hoist,
                        min_width)
            rate = B * cfg.num_point / t / 1e6
            print(f"{B:>6} {g:>6} {B // g:>6} {t * 1e3:>9.1f} {rate:>9.2f}")


if __name__ == "__main__":
    main()
