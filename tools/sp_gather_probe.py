#!/usr/bin/env python3
"""Probe: scalar-prefetch (SMEM-index) Pallas gathers vs XLA take_along_axis.

Round-3 verdict item 3: every documented gather dead end consumed indices
from VMEM (tools/fused_gather_probe.py — fails to legalize) or used a plain
SMEM BlockSpec row loop over the full point slab (tools/gather_probe.py —
measured no better than XLA). The mechanically different path never probed:
indices computed by XLA and delivered through
``pltpu.PrefetchScalarGridSpec`` scalar-prefetch args, consumed in
``index_map`` (DMA selection) and/or ``pl.ds`` (row copies).

Variants, on the SA1 grouping shape (ref: tf_ops/tf_grouping.cu:45-90):

A. xla      — jnp.take_along_axis (the shipped ops/core.py:149 path).
B. sp_row   — PrefetchScalarGridSpec(num_scalar_prefetch=1): the whole idx
              array lands in SMEM before the kernel runs; per-row pl.ds
              copies from a full-N VMEM block. Differs from gather_probe.py
              only in HOW idx reaches SMEM (prefetch vs blocked input).
C. sp_win   — the windowed-gather design: exploits the x-sorted production
              regime (ops.ball_query_calibrated) where every query tile's
              K indices live in a W-row window. XLA computes each tile's
              window-base block index; index_map DMAs the TWO W-row blocks
              covering [base, base+W) (the second clamped at the array
              edge, provably never read when clamped); the kernel copies
              them into one (2W, C) VMEM scratch and row-copies the output
              with RELATIVE indices read from a blocked SMEM input.

Usage: python tools/sp_gather_probe.py [regime ...]
  regimes: eval (B=8,C=64)  train (B=4,C=8)   default: both
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


# ---------------------------------------------------------------- variant B

def _sp_row_kernel(idx_ref, pts_ref, out_ref, *, tr: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    def body(r, _):
        i = idx_ref[b, j * tr + r]
        out_ref[0, pl.ds(r, 1), :] = pts_ref[0, pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, tr, body, 0)


@jax.jit
def sp_row_gather(points, idx):
    b, n, c = points.shape
    r = idx.shape[1]
    tr = 4096
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // tr),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bb, j, idx_ref: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tr, c), lambda bb, j, idx_ref: (bb, j, 0)),
    )
    return pl.pallas_call(
        functools.partial(_sp_row_kernel, tr=tr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, r, c), points.dtype),
    )(idx, points)


# ---------------------------------------------------------------- variant C

def _sp_win_kernel(kblk_ref, rel_ref, win0_ref, win1_ref, out_ref, scratch,
                   *, trk: int, w: int, unroll: int = 4):
    # land the two W-row window blocks in one contiguous scratch
    scratch[pl.ds(0, w), :] = win0_ref[0]
    scratch[pl.ds(w, w), :] = win1_ref[0]

    def body(u, _):
        # unrolled: independent scalar loads/copies can pipeline
        for s in range(unroll):
            r = u * unroll + s
            i = rel_ref[0, 0, 0, r]
            out_ref[0, 0, pl.ds(r, 1), :] = scratch[pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, trk // unroll, body, 0)


def sp_win_gather(points, idx, kblk, w: int, tm: int, unroll: int = 4):
    """points (B,N,C) x-sorted; idx (B,M,K) with each tm-query tile's
    indices inside [kblk*w, kblk*w + 2w); kblk (B,T) int32 block bases."""
    b, n, c = points.shape
    _, m, k = idx.shape
    t = m // tm
    trk = tm * k
    nblk = n // w
    # (B, T, 1, TRK): the trailing two block dims then EQUAL the array dims
    # (Mosaic's 8/128-divisibility rule exempts exact-dim blocks)
    rel = (idx.reshape(b, t, trk)
           - (kblk[:, :, None] * w)).astype(jnp.int32)[:, :, None, :]

    def map0(bb, tt, kblk_ref):
        return (bb, kblk_ref[bb, tt], 0)

    def map1(bb, tt, kblk_ref):
        # edge clamp: when kblk==nblk-1 the window already fits in block 0's
        # rows (rel < w there), so duplicating block kblk is never read.
        return (bb, jnp.minimum(kblk_ref[bb, tt] + 1, nblk - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            # rel is (B, T, 1, TRK): one SMEM block per grid step
            pl.BlockSpec((1, 1, 1, trk), lambda bb, tt, kr: (bb, tt, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w, c), map0),
            pl.BlockSpec((1, w, c), map1),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, trk, c), lambda bb, tt, kr: (bb, tt, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((2 * w, c), points.dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_sp_win_kernel, trk=trk, w=w, unroll=unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, trk, c), points.dtype),
    )(kblk, rel, points, points)
    return out.reshape(b, m * k, c)


# ------------------------------------------------------------------- bench

def run_regime(name, B, N, C, M, K, W_SPAN=3072, W=4096, TM=128):
    print(f"\n== {name}: B={B} N={N} C={C} M={M} K={K} "
          f"(span {W_SPAN}, block w {W}, tile {TM}) ==")
    rng = np.random.RandomState(0)
    pts = np.sort(rng.rand(B, N).astype(np.float32))[..., None] * np.ones(
        (1, 1, C), np.float32
    )  # x-sorted stand-in; values only checked for equality
    pts += rng.rand(B, N, C).astype(np.float32) * 1e-3
    T = M // TM
    # per-tile window bases like the calibrated bq: tiles sweep the cloud
    base = np.minimum(
        (np.arange(T) * (N - W_SPAN) // max(T - 1, 1)), N - W_SPAN
    ).astype(np.int32)
    base = np.broadcast_to(base, (B, T)).copy()
    idx = (
        base[:, :, None, None]
        + rng.randint(0, W_SPAN, (B, T, TM, K))
    ).astype(np.int32).reshape(B, M, K)
    kblk = (base // W).astype(np.int32)
    # invariant the production path certifies: idx in [kblk*w, kblk*w + 2w)
    assert (idx.reshape(B, T, TM * K) - kblk[:, :, None] * W >= 0).all()
    assert (idx.reshape(B, T, TM * K) - kblk[:, :, None] * W < 2 * W).all()

    jpts = jnp.asarray(pts)
    jidx = jnp.asarray(idx.reshape(B, M * K))
    jidx3 = jnp.asarray(idx)
    jkblk = jnp.asarray(kblk)

    want = np.take_along_axis(pts, idx.reshape(B, M * K)[..., None], axis=1)

    def xla(p):
        # The train step MATERIALIZES the grouped tensor (it feeds the SA
        # MLP); without the barrier XLA fuses the gather straight into the
        # timing harness's reduction and measures a different op.
        return lax.optimization_barrier(
            jnp.take_along_axis(p, jidx[..., None], axis=1)
        )

    results = {}
    results["xla"] = slope_time(xla, jpts)

    try:
        got = np.asarray(sp_row_gather(jpts, jidx))
        assert (got == want).all(), "sp_row mismatch"

        def f_row(p):
            return sp_row_gather(p, jidx)

        results["sp_row"] = slope_time(f_row, jpts)
    except Exception as e:  # compile errors are results too
        print(f"sp_row FAILED: {type(e).__name__}: {str(e)[:300]}")

    for unroll in (4, 8, 16):
        try:
            got = np.asarray(sp_win_gather(jpts, jidx3, jkblk, W, TM, unroll))
            assert (got == want.reshape(B, M * K, C)).all(), "sp_win mismatch"

            def f_win(p, u=unroll):
                return sp_win_gather(p, jidx3, jkblk, W, TM, u)

            results[f"sp_win/u{unroll}"] = slope_time(f_win, jpts)
        except Exception as e:
            print(f"sp_win/u{unroll} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")

    for k_, v in results.items():
        rate = B * M * K * C * 4 / v / 1e9
        print(f"{k_:>8}: {v * 1e3:7.3f} ms   ({rate:6.1f} GB/s out)")
    return results


def main():
    which = sys.argv[1:] or ["eval32", "eval", "train"]
    if "eval32" in which:
        # the REAL production SA1 eval gather: pre-projected zp is f0=32 wide
        run_regime("eval SA1 zp regime", B=8, N=8192, C=32, M=1024, K=32)
    if "eval" in which:
        run_regime("eval chunk regime", B=8, N=8192, C=64, M=1024, K=32)
    if "train" in which:
        run_regime("train micro regime", B=4, N=8192, C=8, M=1024, K=32)


if __name__ == "__main__":
    main()
