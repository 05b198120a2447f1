#!/usr/bin/env python3
"""Probe: can a kernel use in-VMEM-computed indices for dynamic row reads?

This gates fusing the zp-row gather into the ball-query kernel (the SA1
gather is ~13 ms of the 64 ms forward). The fused kernel must read a scalar
index from a VMEM-resident int32 array it just computed, then use it to
address a pl.ds row read — Mosaic may or may not legalize the VMEM->scalar
move. Also measures the cost per row vs the SMEM-indexed row-loop gather.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.utils.bench import slope_time


def _vmem_idx_gather_kernel(pts_ref, idxsrc_ref, out_ref, idx_ref, *, rows: int):
    # compute indices IN KERNEL (simulating ball-query output), keep in VMEM
    raw = idxsrc_ref[0]  # (1, rows) int32 in VMEM
    idx_ref[0] = raw  # also emit (like the fused kernel would)

    def body(r, _):
        i = idx_ref[0, 0, r]  # scalar read from VMEM-computed array
        out_ref[0, pl.ds(r, 1), :] = pts_ref[0, pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, rows, body, 0)


@jax.jit
def vmem_idx_gather(points, idx):
    b, n, c = points.shape
    r = idx.shape[1]
    tr = min(4096, r)
    kernel = functools.partial(_vmem_idx_gather_kernel, rows=tr)
    out, idx_out = pl.pallas_call(
        kernel,
        grid=(b, r // tr),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tr, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, r, c), points.dtype),
            jax.ShapeDtypeStruct((b, 1, r), jnp.int32),
        ),
    )(points, idx[:, None, :])
    return out, idx_out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    B, N, C = 8, 8192, 32  # SA1 chunk shape
    R = 1024 * 32
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, R)).astype(np.int32))

    try:
        out, _ = vmem_idx_gather(pts, idx)
        want = jnp.take_along_axis(pts, idx[..., None], axis=1)
        ok = bool(jnp.all(out == want))
        print("VMEM-indexed gather compiles; exact:", ok)
    except Exception as e:
        print("VMEM-indexed gather FAILED to compile/run:")
        print(type(e).__name__, str(e)[:500])
        return

    t = slope_time(lambda p: vmem_idx_gather(p, idx)[0], pts)
    t_xla = slope_time(lambda p: jnp.take_along_axis(p, idx[..., None], axis=1), pts)
    rows = B * R
    print(f"rows={rows}: pallas VMEM-idx {t * 1e3:.2f} ms ({t / rows * 1e9:.1f} ns/row)"
          f" | XLA take_along_axis {t_xla * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
