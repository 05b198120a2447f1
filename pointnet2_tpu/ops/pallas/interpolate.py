"""three_interpolate as a sparse-weight MXU matmul.

The reference's ThreeInterpolate (tf_ops/tf_interpolate.cpp:305-330) gathers
3 feature rows per query and blends them with inverse-distance weights. On
TPU the gather is addressing-bound (no vectorized dynamic row gather in
Mosaic) — but the whole op is algebraically one matmul per batch element:

    out = W @ points,   W (N, M) sparse with 3 nonzeros per row:
    W[q, idx[q, j]] = weight[q, j]

This kernel builds the W tile on the fly from (idx, weight) with three
compare-selects and runs the matmul on the MXU — the (N, 3, C) gathered
intermediate never exists. At the FP4 flagship shape (8192 queries x 1024
points x 128 ch x batch 64) this replaces ~10 ms of gather/blend with ~2-4
ms of MXU work.

Precision: "highest" (default) uses the MXU's f32 path (~1e-7 rel);
"default" uses bf16 inputs like any default-precision matmul.

Gradient (custom_vjp): d points = W^T @ g via a second kernel that builds
the transposed sparse tile the same way (the sums are exactly the
reference's ThreeInterpolateGrad, tf_interpolate.cpp:395-421, reassociated
onto the MXU — autodiff's scatter-add route measured 2.6 ms at the FP4
train shape, the kernel replaces it with MXU work); d weight = per-query
dot of g with the gathered rows (discarded by the model — the FP module
stop_gradients the distances — and then DCE'd by XLA).
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ti_kernel(idx_ref, w_ref, pts_ref, out_ref, *, prec: str):
    # idx/w_ref: (1, 3, TR); pts_ref: (1, Mpad, Cpad); out_ref: (1, TR, Cpad)
    mpad = pts_ref.shape[1]
    tr = out_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (tr, mpad), 1)
    w = jnp.zeros((tr, mpad), jnp.float32)
    for j in range(3):
        w = w + jnp.where(
            col == idx_ref[0, j, :].reshape(tr, 1),
            w_ref[0, j, :].reshape(tr, 1),
            0.0,
        )
    precision = (
        lax.Precision.HIGHEST if prec == "highest" else lax.Precision.DEFAULT
    )
    out_ref[0] = jnp.dot(
        w, pts_ref[0], preferred_element_type=jnp.float32, precision=precision
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def _ti_fwd(points, idx, weight, prec: str, tr: int):
    b, m, c = points.shape
    n = idx.shape[1]
    mpad = _round_up(m, _LANES)
    cpad = _round_up(c, _LANES)
    tr = min(tr, _round_up(n, _LANES))
    npad = _round_up(n, tr)

    pts = points.astype(jnp.float32)
    if mpad != m or cpad != c:
        pts = jnp.pad(pts, ((0, 0), (0, mpad - m), (0, cpad - c)))
    idx_t = jnp.transpose(idx.astype(jnp.int32), (0, 2, 1))  # (B, 3, N)
    w_t = jnp.transpose(weight.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        idx_t = jnp.pad(idx_t, ((0, 0), (0, 0), (0, npad - n)))
        w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, npad - n)))

    kernel = functools.partial(_ti_kernel, prec=prec)
    mxu_factor = 6 if prec == "highest" else 1
    out = pl.pallas_call(
        kernel,
        grid=(b, npad // tr),
        in_specs=[
            pl.BlockSpec((1, 3, tr), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tr), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, mpad, cpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, cpad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npad, cpad), jnp.float32),
        cost_estimate=common.cost_estimate(
            flops=mxu_factor * 2 * b * npad * mpad * cpad + 9 * b * npad * mpad,
            bytes_accessed=b * (mpad * cpad * 4 + npad * 24 + npad * cpad * 4),
            transcendentals=0,
        ),
    )(idx_t, w_t, pts)
    out = out[:, :n, :c]
    return out.astype(points.dtype)


def _ti_bwd_kernel(idx_ref, w_ref, g_ref, out_ref, *, prec: str):
    # idx/w_ref: (1, 3, Npad); g_ref: (1, Npad, Cpad); out_ref: (1, TM, Cpad)
    npad = g_ref.shape[1]
    tm = out_ref.shape[1]
    # Global ref-row index of each output row in this tile.
    row = (
        lax.broadcasted_iota(jnp.int32, (tm, npad), 0)
        + pl.program_id(1) * tm
    )
    wt = jnp.zeros((tm, npad), jnp.float32)
    for j in range(3):
        wt = wt + jnp.where(
            row == idx_ref[0, j, :].reshape(1, npad),
            w_ref[0, j, :].reshape(1, npad),
            0.0,
        )
    precision = (
        lax.Precision.HIGHEST if prec == "highest" else lax.Precision.DEFAULT
    )
    out_ref[0] = jnp.dot(
        wt, g_ref[0], preferred_element_type=jnp.float32, precision=precision
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _ti_bwd(g, idx, weight, m: int, prec: str, tm: int):
    """d points = W^T @ g as the same on-the-fly sparse matmul, transposed.

    Autodiff's route is a scatter-add of 3 rows per query into (M, C) —
    measured 2.6 ms at the FP4 train shape (scatter updates are
    read-modify-write and addressing-bound). Building the W^T tile in VMEM
    instead (one compare-select per neighbor slot, mirroring the forward
    kernel) turns the whole gradient into MXU work.
    """
    b, n, c = g.shape
    npad = _round_up(n, _LANES)
    cpad = _round_up(c, _LANES)
    tm = min(tm, _round_up(m, _LANES))
    mpad = _round_up(m, tm)

    gf = g.astype(jnp.float32)
    if npad != n or cpad != c:
        gf = jnp.pad(gf, ((0, 0), (0, npad - n), (0, cpad - c)))
    idx_t = jnp.transpose(idx.astype(jnp.int32), (0, 2, 1))  # (B, 3, N)
    w_t = jnp.transpose(weight.astype(jnp.float32), (0, 2, 1))
    if npad != n:
        # Padded queries carry weight 0 (and idx 0): no contribution.
        idx_t = jnp.pad(idx_t, ((0, 0), (0, 0), (0, npad - n)))
        w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, npad - n)))

    kernel = functools.partial(_ti_bwd_kernel, prec=prec)
    mxu_factor = 6 if prec == "highest" else 1
    out = pl.pallas_call(
        kernel,
        grid=(b, mpad // tm),
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, npad, cpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, cpad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, mpad, cpad), jnp.float32),
        cost_estimate=common.cost_estimate(
            flops=mxu_factor * 2 * b * mpad * npad * cpad + 9 * b * mpad * npad,
            bytes_accessed=b * (npad * cpad * 4 + npad * 24 + mpad * cpad * 4),
            transcendentals=0,
        ),
    )(idx_t, w_t, gf)
    return out[:, :m, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def three_interpolate_pallas(
    points, idx, weight, prec: str = "highest", tr: int = 256
):
    """points (B, M, C), idx/weight (B, N, 3) -> (B, N, C). MXU sparse matmul."""
    return _ti_fwd(points, idx, weight, prec, tr)


def _vjp_fwd(points, idx, weight, prec, tr):
    return _ti_fwd(points, idx, weight, prec, tr), (points, idx, weight)


def _vjp_bwd(prec, tr, res, g):
    points, idx, weight = res
    b, m, c = points.shape
    # d points = W^T @ g via the transpose sparse-matmul kernel (exactly the
    # reference's ThreeInterpolateGrad sums, tf_interpolate.cpp:395-421,
    # reassociated onto the MXU).
    dpoints = _ti_bwd(g, idx, weight, m, prec, 128).astype(points.dtype)
    # d weight: per-(query, j) dot of g with the gathered row. The in-tree
    # caller stop_gradients the distances, so this is usually discarded
    # (and then DCE'd by XLA).
    flat = idx.reshape(b, -1)
    gathered = jnp.take_along_axis(points, flat[..., None], axis=1).reshape(
        b, idx.shape[1], 3, c
    )
    g32 = g.astype(jnp.float32)
    dweight = jnp.sum(gathered.astype(jnp.float32) * g32[:, :, None, :], axis=-1)
    return dpoints, None, dweight.astype(weight.dtype)


three_interpolate_pallas.defvjp(_vjp_fwd, _vjp_bwd)
