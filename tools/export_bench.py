#!/usr/bin/env python3
"""Serving-artifact overhead: exported StableHLO vs the live forward.

Exports the flagship eval forward (fixed batch, chunked — the production
predict configuration) and K-slope-times the deserialized artifact against
the live `Trainer.predict_step` on the same inputs. Establishes that the
serving path costs nothing over the in-process path (both are one XLA
program after load).

Usage: python tools/export_bench.py [--batch 64]
"""

import argparse
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.config import Config
from pointnet2_tpu.export import export_model, load_exported
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.bench import slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    cfg = Config()
    trainer = Trainer(cfg=cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(args.batch, cfg.num_point, cfg.point_dim), jnp.float32
    )

    d = tempfile.mkdtemp(prefix="export_bench_")
    manifest = export_model(trainer, state, d, batch=args.batch)
    print(f"artifact: {manifest['artifact_bytes'] / 1e6:.1f} MB")
    fn, _ = load_exported(d)
    served = jax.jit(fn)

    # labels are int32 -> sum for the slope-time scalar dependency
    t_live = slope_time(
        lambda c: jnp.sum(trainer._predict_step(state, c)).astype(jnp.float32),
        x, K0=2, K1=6,
    )
    t_served = slope_time(
        lambda c: jnp.sum(served(c)).astype(jnp.float32), x, K0=2, K1=6
    )
    pps = args.batch * cfg.num_point
    print(f"live predict_step: {t_live * 1e3:.1f} ms ({pps / t_live / 1e6:.2f} M pts/s)")
    print(f"served artifact:   {t_served * 1e3:.1f} ms ({pps / t_served / 1e6:.2f} M pts/s)")
    print(f"overhead: {(t_served / t_live - 1) * 100:+.1f}%")

    same = np.mean(np.asarray(fn(x)) == np.asarray(trainer.predict_step(state, x)))
    print(f"label agreement: {same:.4f}")


if __name__ == "__main__":
    main()
