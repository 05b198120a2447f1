"""Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (`npoint` dependent argmax-of-min iterations,
reference kernel: tf_ops/tf_sampling.cu:111-176). The CUDA version keeps a
running min-distance array in global memory with a shared-memory tree
reduction per step. The TPU design instead keeps the whole working set in
VMEM for the duration of the kernel:

- one grid program per batch element;
- xyz stored transposed (3, Npad) so each coordinate is a contiguous lane
  vector;
- the running min-distance vector (1, Npad) lives in a VMEM scratch buffer;
- each of the `npoint` steps is pure VPU work: one fused
  distance/min/argmax sweep over N lanes, zero HBM traffic.

Selected-point coordinates are fetched with a masked reduction instead of a
dynamic scalar load (cheaper on the VPU than a gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(xyz_ref, idx_ref, mind_ref, *, n: int, npoint: int):
    npad = xyz_ref.shape[-1]
    mpad = idx_ref.shape[-1]
    x = xyz_ref[0, 0:1, :]  # (1, Npad)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]

    col = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    valid = col < n
    # Padded slots get min-dist -1 so argmax never selects them.
    mind_ref[:] = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    col_m = lax.broadcasted_iota(jnp.int32, (1, mpad), 1)

    def step(j, carry):
        old, row = carry
        sel = (col == old).astype(jnp.float32)
        x1 = jnp.sum(x * sel)
        y1 = jnp.sum(y * sel)
        z1 = jnp.sum(z * sel)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        mind = jnp.minimum(mind_ref[:], jnp.where(valid, d, jnp.float32(-1.0)))
        mind_ref[:] = mind
        new = jnp.argmax(mind, axis=1).astype(jnp.int32)[0]
        # One-hot vector accumulation: Mosaic has no dynamic-lane scalar
        # stores to VMEM, so the selected index is blended into the row.
        row = jnp.where(col_m == j, new, row)
        return new, row

    # Slot 0 is index 0 (tf_sampling.cu:124), already zero-initialized.
    _, row = lax.fori_loop(
        1, npoint, step, (jnp.int32(0), jnp.zeros((1, mpad), jnp.int32))
    )
    idx_ref[0] = row


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) float -> (B, npoint) int32 indices. Matches the XLA/NumPy FPS."""
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANES)
    mpad = _round_up(npoint, _LANES)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if npad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, npad - n)))

    kernel = functools.partial(_fps_kernel, n=n, npoint=npoint)
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        # 3D (B, 1, mpad) keeps the trailing block dims (1, mpad) aligned with
        # the array dims, which Mosaic requires for non-divisible blockings.
        out_specs=pl.BlockSpec(
            (1, 1, mpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, mpad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * npoint * npad, bytes_accessed=b * npad * 16, transcendentals=0
        ),
    )(xyz_t)
    return idx[:, 0, :npoint]
