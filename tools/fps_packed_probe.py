#!/usr/bin/env python3
"""Probe: lane-packed FPS — G groups of 8 batch elements in ONE program.

The production kernel packs 8 batch elements into sublanes; grid programs
run SEQUENTIALLY on the single TensorCore, so B=64 pays 8x the serial
1023-iteration loop. This variant additionally packs G groups side by side
in the LANE dimension ((8, G*Npad) planes, per-segment reductions via a
(8, G, Npad) reshape), so one loop services 8*G elements — if the kernel is
iteration-latency-bound, near-G-times faster.

MEASURED RESULT (v5e, B=64, 8192->1024): SLOWER — current 8.0 ms vs packed
G=2/4/8 = 23.9/15.7/13.0 ms. The kernel is throughput-bound per iteration
and the (8, G*Npad) <-> (8, G, Npad) reshapes are real relayouts, not free.
The 8-per-program production kernel stands. (All packed variants are exact
vs the oracle.)
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

from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.pallas import farthest_point_sample_pallas
from pointnet2_tpu.utils.bench import slope_time

_LANES = 128
_SUB = 8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fps_packed_kernel(xyz_ref, idx_ref, mind_ref, *, n, npoint, g, npad, mpad):
    # xyz_ref: (1, 8, 3, G*Npad); idx_ref: (1, 8, G*Mpad); mind: (8, G*Npad)
    x = xyz_ref[0, :, 0, :]
    y = xyz_ref[0, :, 1, :]
    z = xyz_ref[0, :, 2, :]

    seg_col = lax.broadcasted_iota(jnp.int32, (_SUB, g, npad), 2)  # in-segment
    valid = seg_col < n
    mind_ref[:] = jnp.where(
        valid, jnp.float32(1e38), jnp.float32(-1.0)
    ).reshape(_SUB, g * npad)
    out_col = lax.broadcasted_iota(jnp.int32, (_SUB, g, mpad), 2)

    def step(j, carry):
        old, row = carry  # old: (8, G, 1); row: (8, G, Mpad)
        sel = (seg_col == old).astype(jnp.float32)  # (8, G, Npad)
        xs = x.reshape(_SUB, g, npad)
        ys = y.reshape(_SUB, g, npad)
        zs = z.reshape(_SUB, g, npad)
        x1 = jnp.sum(xs * sel, axis=2, keepdims=True)  # (8, G, 1)
        y1 = jnp.sum(ys * sel, axis=2, keepdims=True)
        z1 = jnp.sum(zs * sel, axis=2, keepdims=True)
        d = (xs - x1) ** 2 + (ys - y1) ** 2 + (zs - z1) ** 2
        mind = jnp.minimum(
            mind_ref[:].reshape(_SUB, g, npad),
            jnp.where(valid, d, jnp.float32(-1.0)),
        )
        mind_ref[:] = mind.reshape(_SUB, g * npad)
        rowmax = jnp.max(mind, axis=2, keepdims=True)  # (8, G, 1)
        new = jnp.min(
            jnp.where(mind == rowmax, seg_col, npad), axis=2, keepdims=True
        ).astype(jnp.int32)
        row = jnp.where(out_col == j, new, row)
        return new, row

    _, row = lax.fori_loop(
        1,
        npoint,
        step,
        (
            jnp.zeros((_SUB, g, 1), jnp.int32),
            jnp.zeros((_SUB, g, mpad), jnp.int32),
        ),
    )
    idx_ref[0, :, :] = row.reshape(_SUB, g * mpad)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_packed(xyz, npoint: int, g: int = 4):
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANES)
    mpad = _round_up(npoint, _LANES)
    per_prog = _SUB * g
    bpad = _round_up(b, per_prog)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    if npad != n or bpad != b:
        xyz_t = jnp.pad(xyz_t, ((0, bpad - b), (0, 0), (0, npad - n)))
    # layout: (programs, 8, 3, G*Npad) with element (s, g) of a program in
    # sublane s, lane segment g. Order below makes element index =
    # prog*8g + s*g + gi ... we instead want output unscrambling to be a
    # simple reshape: element e -> (prog, gi, s)? Use (prog, g, 8) grouping:
    xyz_t = xyz_t.reshape(bpad // per_prog, g, _SUB, 3, npad)
    xyz_t = jnp.transpose(xyz_t, (0, 2, 3, 1, 4)).reshape(
        bpad // per_prog, _SUB, 3, g * npad
    )

    kernel = functools.partial(
        _fps_packed_kernel, n=n, npoint=npoint, g=g, npad=npad, mpad=mpad
    )
    idx = pl.pallas_call(
        kernel,
        grid=(bpad // per_prog,),
        in_specs=[
            pl.BlockSpec(
                (1, _SUB, 3, g * npad), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, _SUB, g * mpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bpad // per_prog, _SUB, g * mpad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUB, g * npad), jnp.float32)],
    )(xyz_t)
    # unscramble: (progs, 8, G, Mpad) -> (progs, G, 8, Mpad) -> (bpad, Mpad)
    idx = idx.reshape(bpad // per_prog, _SUB, g, mpad)
    idx = jnp.transpose(idx, (0, 2, 1, 3)).reshape(bpad, mpad)
    return idx[:b, :npoint]


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    B, N, M = 64, 8192, 1024
    xyz = (rng.rand(B, N, 3) * 10).astype(np.float32)

    for g in (2, 4, 8):
        try:
            got = np.asarray(fps_packed(jnp.asarray(xyz[: 8 * g]), M, g))
        except Exception as e:
            print(f"G={g}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        want = reference.farthest_point_sample_np(xyz[: 8 * g], M)
        print(f"G={g}: exact={bool((got == want).all())}")

    xj = jnp.asarray(xyz)
    t0 = slope_time(lambda c: farthest_point_sample_pallas(c, M).astype(jnp.float32).sum(), xj, K0=2, K1=6)
    print(f"current (8/program):  {t0 * 1e3:.2f} ms at B=64")
    for g in (2, 4, 8):
        try:
            t = slope_time(lambda c, g=g: fps_packed(c, M, g).astype(jnp.float32).sum(), xj, K0=2, K1=6)
            print(f"packed G={g} ({8 * g}/program): {t * 1e3:.2f} ms at B=64 ({t0 / t:.2f}x)")
        except Exception as e:
            print(f"packed G={g} timing FAILED: {str(e)[:150]}")


if __name__ == "__main__":
    main()
