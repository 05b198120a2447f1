"""Shared in-kernel helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def cost_estimate(flops, bytes_accessed, transcendentals=0):
    """``pl.CostEstimate``, or None under shape-polymorphic tracing.

    jax.export with a symbolic batch dimension makes the dim products
    symbolic expressions; CostEstimate requires ints. The estimate only
    tunes Mosaic's pipeline heuristics, so dropping it for polymorphic
    exports is safe (the kernel still compiles and runs correctly).
    """
    vals = (flops, bytes_accessed, transcendentals)
    if not all(isinstance(v, (int, np.integer)) for v in vals):
        return None
    return pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(bytes_accessed),
        transcendentals=int(transcendentals),
    )


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
