#!/usr/bin/env python3
"""Probe: how fast is a Pallas dynamic-row gather vs XLA take_along_axis?

Shape: SA1 grouping — points (B, N, C) gathered by idx (B, M*K) rows.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.train_bench import slope_time


def _gather_kernel(pts_ref, idx_ref, out_ref, *, rows_per_program: int):
    # pts_ref: (1, N, C); idx_ref: (1, 1, TR); out_ref: (1, TR, C)
    def body(r, _):
        i = idx_ref[0, 0, r]
        out_ref[0, pl.ds(r, 1), :] = pts_ref[0, pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, rows_per_program, body, 0)


@functools.partial(jax.jit, static_argnames=())
def gather_pallas(points, idx):
    b, n, c = points.shape
    r = idx.shape[1]
    tr = min(2048, r)
    kernel = functools.partial(_gather_kernel, rows_per_program=tr)
    return pl.pallas_call(
        kernel,
        grid=(b, r // tr),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr), lambda i, j: (i, 0, j), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, c), points.dtype),
    )(points, idx[:, None, :])


def main():
    rng = np.random.RandomState(0)
    B, N, C = 64, 8192, 64
    M, K = 1024, 32
    pts = jnp.asarray(rng.rand(B, N, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B, M * K)), jnp.int32)

    # correctness
    got = np.asarray(gather_pallas(pts, idx))
    want = np.take_along_axis(np.asarray(pts), np.asarray(idx)[..., None], axis=1)
    print("pallas gather correct:", np.allclose(got, want))

    def xla_gather(c):
        return jnp.take_along_axis(c, idx[..., None], axis=1).sum()

    def pl_gather(c):
        return gather_pallas(c, idx).sum()

    tx = slope_time(xla_gather, pts)
    tp = slope_time(pl_gather, pts)
    print(f"XLA take_along_axis: {tx*1e3:7.2f} ms   pallas row-loop: {tp*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
