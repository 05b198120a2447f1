#!/usr/bin/env python3
"""Probe: confusion-matrix forms on TPU.

A: shipped compare-and-reduce over C*C bins ((B*N, 169) compares).
B: one-hot MXU matmul  CM = onehot(labels)^T @ onehot(preds) — contraction
   over the point axis; 0/1 products summed in f32 are exact for counts
   < 2^24, so the result is bit-identical after int cast.

Interleaved A/B in one process (tunnel drift).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.utils.metrics import confusion_matrix_jax
from pointnet2_tpu.utils.bench import slope_time

C = 13


@jax.jit
def cm_compare(labels, preds):
    # labels arrive as f32 (scan-carry dtype in slope_time); cast back.
    return confusion_matrix_jax(labels.astype(jnp.int32), preds, C)


@jax.jit
def cm_matmul(labels, preds):
    lo = jax.nn.one_hot(labels.reshape(-1).astype(jnp.int32), C, dtype=jnp.float32)
    po = jax.nn.one_hot(preds.reshape(-1).astype(jnp.int32), C, dtype=jnp.float32)
    cm = jax.lax.dot_general(
        lo, po, (((0,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    return cm.astype(jnp.int32)


def main():
    rng = np.random.RandomState(0)
    B, N = 16, 8192
    labels = jnp.asarray(rng.randint(0, C, (B, N)), jnp.float32)
    preds = jnp.asarray(rng.randint(0, C, (B, N)), jnp.int32)
    a = np.asarray(cm_compare(labels, preds))
    b = np.asarray(cm_matmul(labels, preds))
    assert (a == b).all(), "matmul CM disagrees"
    print("bit-identical; timing (train regime B=16 x 8192):")
    for rep in range(3):
        ta = slope_time(lambda c: cm_compare(c, preds), labels)
        tb = slope_time(lambda c: cm_matmul(c, preds), labels)
        print(f"rep {rep}: compare {ta*1e3:7.3f} ms   matmul {tb*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
