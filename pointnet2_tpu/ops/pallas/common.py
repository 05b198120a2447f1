"""Shared in-kernel helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax.numpy as jnp

LANES = 128


def block_min(arr, width: int | None = None):
    """Stage-1 of the two-stage min reduction: elementwise minimum across the
    width/128 lane blocks of a (rows, width) array — pure vreg ops, no
    cross-lane shuffles. The caller finishes with one cross-lane reduce over
    the returned (rows, 128) candidates.

    width MUST be a multiple of 128 (asserted): a truncating block count
    would silently drop trailing columns.
    """
    width = arr.shape[-1] if width is None else width
    assert width % LANES == 0, f"block_min width {width} not a multiple of {LANES}"
    vals = arr[:, :LANES]
    for b in range(1, width // LANES):
        vals = jnp.minimum(vals, arr[:, b * LANES : (b + 1) * LANES])
    return vals
