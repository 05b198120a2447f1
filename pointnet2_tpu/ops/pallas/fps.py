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
        # Padded lanes start at -1 and d >= 0: the running minimum keeps
        # them at -1 without re-masking every step.
        mind = jnp.minimum(mind_ref[:], d)
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


def _fps_fused_kernel(xyz_ref, idx_ref, oxyz_ref, mind_ref, *, n: int, npoint: int):
    """FPS with centroid emission riding the selection loop for free.

    Same selection structure as ``_fps_kernel`` (full-width reductions —
    Mosaic lowers them as trees; a merged blockwise tuple-reduction variant
    measured 3x SLOWER at the flagship shape because its 63-block
    compare-select chain is serial, see tools/fps_v2_probe.py and
    ROADMAP.md). The one addition: every step already extracts the
    previously selected point's coordinates via masked sums to compute
    distances — blending those three scalars into (8, Mpad) output planes
    costs ~3% of the step, and eliminates the follow-up
    ``gather_points(xyz, fps_idx)`` (an addressing-bound row gather,
    measured 0.5 ms at the flagship shape) from every SA level.
    """
    npad = xyz_ref.shape[-1]
    mpad = idx_ref.shape[-1]
    x = xyz_ref[:, 0, :]  # (8, Npad)
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]

    col = lax.broadcasted_iota(jnp.int32, (_SUBLANES, npad), 1)
    valid = col < n
    mind_ref[:] = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    col_m = lax.broadcasted_iota(jnp.int32, (_SUBLANES, mpad), 1)

    zero_m = jnp.zeros((_SUBLANES, mpad), jnp.float32)

    def extract(sel):
        """Coordinates of the (unique) selected column, via masked sums."""
        x1 = jnp.sum(x * sel, axis=1, keepdims=True)  # (8, 1)
        y1 = jnp.sum(y * sel, axis=1, keepdims=True)
        z1 = jnp.sum(z * sel, axis=1, keepdims=True)
        return x1, y1, z1

    def step(j, carry):
        old, row, ox, oy, oz = carry  # old: (8, 1) selected index per row
        sel = (col == old).astype(jnp.float32)
        x1, y1, z1 = extract(sel)
        # Emit the coords of `old` (the slot j-1 selection) as they are
        # computed — no extra reduction, just three (8, Mpad) blends.
        prev = col_m == (j - 1)
        ox = jnp.where(prev, x1, ox)
        oy = jnp.where(prev, y1, oy)
        oz = jnp.where(prev, z1, oz)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        # No masking needed: padded lanes start at -1 and d >= 0, so the
        # running minimum keeps them at -1 forever (one full-width pass
        # saved per step vs where(valid, d, -1)).
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        rowmax = jnp.max(mind, axis=1, keepdims=True)  # (8, 1)
        new = jnp.min(
            jnp.where(mind == rowmax, col, npad), axis=1, keepdims=True
        ).astype(jnp.int32)
        row = jnp.where(col_m == j, new, row)
        return new, row, ox, oy, oz

    # Slot 0 is index 0 for every batch element (tf_sampling.cu:124).
    old, row, ox, oy, oz = lax.fori_loop(
        1,
        npoint,
        step,
        (
            jnp.zeros((_SUBLANES, 1), jnp.int32),
            jnp.zeros((_SUBLANES, mpad), jnp.int32),
            zero_m,
            zero_m,
            zero_m,
        ),
    )
    # The final selection's coords were never extracted in-loop.
    xl, yl, zl = extract((col == old).astype(jnp.float32))
    last = col_m == (npoint - 1)
    idx_ref[:, :] = row
    oxyz_ref[:, 0, :] = jnp.where(last, xl, ox)
    oxyz_ref[:, 1, :] = jnp.where(last, yl, oy)
    oxyz_ref[:, 2, :] = jnp.where(last, zl, oz)


@functools.partial(jax.jit, static_argnums=(1,))
def fps_centroids_pallas(
    xyz: jax.Array, npoint: int
) -> tuple[jax.Array, jax.Array]:
    """Fused FPS: (B, N, 3) -> ((B, npoint) int32 idx, (B, npoint, 3) centroids).

    The centroid coordinates are exact copies of the selected input rows
    (bit-identical to ``gather_points(xyz, idx)`` on the f32-cast input).
    """
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANES)
    mpad = _round_up(npoint, _LANES)
    bpad = _round_up(b, _SUBLANES)
    xyz_f = xyz.astype(jnp.float32)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))  # (B, 3, N)
    if npad != n or bpad != b:
        xyz_t = jnp.pad(xyz_t, ((0, bpad - b), (0, 0), (0, npad - n)))

    kernel = functools.partial(_fps_fused_kernel, n=n, npoint=npoint)
    idx, oxyz = pl.pallas_call(
        kernel,
        grid=(bpad // _SUBLANES,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, 3, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (_SUBLANES, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_SUBLANES, 3, mpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, mpad), jnp.int32),
            jax.ShapeDtypeStruct((bpad, 3, mpad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, npad), jnp.float32)],
        cost_estimate=common.cost_estimate(
            flops=14 * bpad * npoint * npad,
            bytes_accessed=bpad * npad * 16 + bpad * mpad * 16,
            transcendentals=0,
        ),
    )(xyz_t)
    new_xyz = jnp.transpose(oxyz, (0, 2, 1))[:b, :npoint].astype(xyz.dtype)
    return idx[:b, :npoint], new_xyz


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fps_centroids_pallas_diff(xyz: jax.Array, npoint: int):
    """``fps_centroids_pallas`` with gather's VJP re-attached.

    The kernel's centroid output is a value copy with no autodiff path; this
    wrapper restores the exact VJP of ``gather_points(xyz, idx)`` — a
    scatter-add of the new_xyz cotangent (tf_ops/tf_sampling.py:54-58) — so
    input-gradient callers (PointNet2SemSeg(input_is_leaf=False)) stay
    correct. When only parameter gradients are requested the scatter is
    never built (the input cotangent chain is pruned), so the fast path
    pays nothing.
    """
    return fps_centroids_pallas(xyz, npoint)


def _fps_centroids_fwd(xyz, npoint):
    idx, new_xyz = fps_centroids_pallas(xyz, npoint)
    # xyz rides along only to give bwd its shape/dtype (a reference, not a
    # copy; it is live through the backward anyway).
    return (idx, new_xyz), (idx, xyz)


def _fps_centroids_bwd(npoint, res, g):
    idx, xyz = res
    _, g_new = g  # idx cotangent is float0 (int output)
    grad = jnp.zeros_like(xyz)
    b = xyz.shape[0]
    grad = grad.at[jnp.arange(b)[:, None], idx].add(g_new.astype(xyz.dtype))
    return (grad,)


fps_centroids_pallas_diff.defvjp(_fps_centroids_fwd, _fps_centroids_bwd)


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
