"""Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (`npoint` dependent argmax-of-min iterations,
reference kernel: tf_ops/tf_sampling.cu:111-176). The CUDA version keeps a
running min-distance array in global memory with a shared-memory tree
reduction per step. The TPU design keeps the whole working set in VMEM for
the duration of the kernel and — unlike a one-batch-element-per-program
layout, which would leave 7 of 8 VPU sublanes idle on (1, N) rows — packs
**8 batch elements into the 8 sublanes**:

- each grid program owns 8 batch elements: coordinates live as three
  (8, Npad) planes, the running min-distance as one (8, Npad) scratch;
- every step is one fused (8, Npad) distance/min/argmax sweep with zero HBM
  traffic;
- selected coordinates come from a masked row-reduction (no dynamic scalar
  loads), and the output row is accumulated with one-hot blends (Mosaic has
  no dynamic-lane scalar stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops.pallas import common

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(xyz_ref, idx_ref, mind_ref, *, n: int, npoint: int):
    # xyz_ref: (8, 3, Npad); idx_ref: (8, Mpad); mind_ref: (8, Npad) scratch
    npad = xyz_ref.shape[-1]
    mpad = idx_ref.shape[-1]
    x = xyz_ref[:, 0, :]  # (8, Npad)
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]

    col = lax.broadcasted_iota(jnp.int32, (_SUBLANES, npad), 1)
    valid = col < n
    # Padded slots get min-dist -1 so argmax never selects them.
    mind_ref[:] = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    col_m = lax.broadcasted_iota(jnp.int32, (_SUBLANES, mpad), 1)

    def step(j, carry):
        old, row = carry  # old: (8, 1) selected index per batch row
        sel = (col == old).astype(jnp.float32)
        x1 = jnp.sum(x * sel, axis=1, keepdims=True)  # (8, 1)
        y1 = jnp.sum(y * sel, axis=1, keepdims=True)
        z1 = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        mind = jnp.minimum(mind_ref[:], jnp.where(valid, d, jnp.float32(-1.0)))
        mind_ref[:] = mind
        # First-index-of-max instead of jnp.argmax: identical semantics
        # (argmax returns the first occurrence), and Mosaic fails to legalize
        # argmax over a single (8, 128) vreg (npad == 128).
        rowmax = jnp.max(mind, axis=1, keepdims=True)  # (8, 1)
        new = jnp.min(
            jnp.where(mind == rowmax, col, npad), axis=1, keepdims=True
        ).astype(jnp.int32)  # (8, 1)
        # One-hot blend: Mosaic has no dynamic-lane scalar stores to VMEM.
        row = jnp.where(col_m == j, new, row)
        return new, row

    # Slot 0 is index 0 for every batch element (tf_sampling.cu:124).
    _, row = lax.fori_loop(
        1,
        npoint,
        step,
        (
            jnp.zeros((_SUBLANES, 1), jnp.int32),
            jnp.zeros((_SUBLANES, mpad), jnp.int32),
        ),
    )
    idx_ref[:, :] = row


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) float -> (B, npoint) int32 indices. Matches the XLA/NumPy FPS."""
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANES)
    mpad = _round_up(npoint, _LANES)
    bpad = _round_up(b, _SUBLANES)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if npad != n or bpad != b:
        xyz_t = jnp.pad(xyz_t, ((0, bpad - b), (0, 0), (0, npad - n)))

    kernel = functools.partial(_fps_kernel, n=n, npoint=npoint)
    idx = pl.pallas_call(
        kernel,
        grid=(bpad // _SUBLANES,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, 3, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_SUBLANES, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, mpad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, npad), jnp.float32)],
        cost_estimate=common.cost_estimate(
            flops=9 * bpad * npoint * npad,
            bytes_accessed=bpad * npad * 16,
            transcendentals=0,
        ),
    )(xyz_t)
    return idx[:b, :npoint]
