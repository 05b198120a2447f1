"""Fused calibrated ball query + windowed feature gather for the SA1 path.

The round-3 profile's largest unconquered inference cost was the SA1
grouping gather — ``group_points(zp, idx)`` at ops/core.py:149, ~20% of the
flagship forward — and every prior Pallas gather attempt lost to XLA
(ROADMAP.md §1: VMEM-index kernels fail to legalize, SMEM-BlockSpec row
loops measure no better, the MXU one-hot form loses at C=32). What finally
wins (tools/sp_gather_probe.py, round 4) exploits the SAME x-sorted
locality the calibrated ball query already certifies:

1. the ball-query kernel runs on the x-sorted cloud, so every 128-query
   tile's candidates live in one ``window``-wide slice of sorted rows;
2. a second kernel DMAs the TWO static ``wblk``-row blocks covering that
   slice (``index_map`` picks the block from a scalar-prefetched base —
   contiguous block DMAs instead of 4096 row lookups), lands them in one
   (2*wblk, C) VMEM scratch, and copies the tile's TM*K output rows with
   window-RELATIVE positions read from SMEM, 4 rows per loop iteration
   (the unroll pipelines the scalar address reads — measured 2.3x);
3. positions come free from the ball-query sweep: its extraction keys
   encode ``original_index * w + window_position``, so the min-extract
   that implements first-in-dataset-order (tf_ops/tf_grouping.cu:3-43)
   yields both the parity index and the gather position at once.

Measured at the production SA1 shape (B=8, 8192 -> 1024 queries, k=32,
C=32, w=3072): gather 0.83 ms vs XLA take_along_axis 1.56 ms.

Everything stays bit-identical to the exact path: the gathered values are
the same projected rows (per-row dot products are order-independent), the
neighbor set/order is the calibrated kernel's (certified by ``ok``), and
the caller un-permutes only per-centroid outputs (see
nn/pointnet.py SetAbstraction._pre_projected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu.ops.pallas.ballquery import ball_query_pallas
from pointnet2_tpu.ops.pallas.common import block_min

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bq_sliced_pos_kernel(
    win_ref, perm_ref, q_ref, idx_ref, pos_ref, cnt_ref, sel_ref,
    *, n: int, radius: float, nsample: int
):
    """ball_query_sliced's kernel with position-carrying extraction keys.

    Keys are ``orig_index * w + window_column`` (max n*w < 2^31 for every
    shipped shape): lexicographic in (orig, column), and columns are unique,
    so the nsample smallest keys are exactly the nsample smallest ORIGINAL
    indices — the reference's first-in-dataset-order semantics — while the
    low digits hand the gather kernel each pick's window position for free.
    """
    w = win_ref.shape[-1]
    tm = q_ref.shape[2]

    d2 = jnp.zeros((tm, w), jnp.float32)
    for c in range(3):
        # f32 difference form — NOT the MXU expansion, which cancels
        # catastrophically at ball boundaries (see ballquery.py docstring).
        diff = q_ref[0, 0, :, c : c + 1] - win_ref[0, 0, c : c + 1, :]
        d2 = d2 + diff * diff

    keys_orig = perm_ref[0, 0, 0:1, :]  # (1, W) original dataset indices
    col = lax.broadcasted_iota(jnp.int32, (tm, w), 1)
    in_ball = (d2 < jnp.float32(radius) ** 2) & (keys_orig < n)
    sent = n * w  # > any valid key
    keys = jnp.where(in_ball, keys_orig * w + col, sent)

    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1)
    cnt_ref[0, 0, 0, :] = jnp.minimum(cnt, nsample)

    for s in range(nsample):
        kmin = jnp.min(block_min(keys), axis=1, keepdims=True)
        sel_ref[:, s : s + 1] = kmin
        keys = jnp.where(keys == kmin, sent, keys)

    sel = sel_ref[:, :nsample]
    first = sel[:, 0:1]
    first = jnp.where(first < sent, first, 0)  # pad-by-first (cu:32-37)
    sel = jnp.where(sel < sent, sel, first)
    idx_ref[0, 0] = sel // w
    pos_ref[0, 0] = sel % w


def _window_gather_kernel(
    kblk_ref, rel_ref, win0_ref, win1_ref, out_ref, scratch,
    *, trk: int, wblk: int, unroll: int
):
    # land the two wblk-row blocks covering the tile's window in one
    # contiguous scratch, then row-copy with SMEM-read relative positions
    scratch[pl.ds(0, wblk), :] = win0_ref[0]
    scratch[pl.ds(wblk, wblk), :] = win1_ref[0]

    def body(u, _):
        # unrolled: independent scalar loads/copies pipeline (measured 2.3x
        # over unroll=1 at C=32 — tools/sp_gather_probe.py)
        for s in range(unroll):
            r = u * unroll + s
            i = rel_ref[0, 0, 0, r]
            out_ref[0, 0, pl.ds(r, 1), :] = scratch[pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, trk // unroll, body, 0)


def _pick_wblk(n: int, w: int):
    """Smallest 128-multiple block width >= w that divides n (None if none).

    Coverage proof: blocks k and k+1 with k = lo // wblk span
    [k*wblk, k*wblk + 2*wblk) ⊇ [lo, lo + w) because lo mod wblk < wblk and
    w <= wblk.
    """
    for cand in range(_round_up(w, _LANES), n + 1, _LANES):
        if n % cand == 0:
            return cand
    return None


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def project_group_sliced(
    inputs: jax.Array,
    w0: jax.Array,
    b0: jax.Array,
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    window: int,
):
    """Fused ``group_points(inputs @ w0 + b0, ball_query(...))`` via windows.

    Returns ``(grouped_s, idx, cnt, qperm, inv_q, ok)``:

    - ``grouped_s`` (B, M, K, f0): grouped projected features in
      x-SORTED-query order when the windowed path ran (``qperm`` not None);
      callers keep per-centroid work in sorted order and un-permute the
      pooled output with ``inv_q`` (values are bit-identical to the exact
      path's rows — projection is row-independent).
    - ``idx`` (B, M, K), ``cnt`` (B, M): ball-query outputs in ORIGINAL
      query order (ops.ball_query parity surface).
    - ``qperm``/``inv_q`` (B, M): the query sort and its inverse, or None
      on the static fallback (grouped_s already in original order).
    - ``ok``: scalar exactness certificate (ball_query_calibrated contract).

    Static fallback (window >= n, tile mismatch, or no block width divides
    n): exact full kernel + plain gather, original order, ok=True.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    k = nsample
    tm = min(_LANES, m)
    w = _round_up(window, _LANES)
    wblk = _pick_wblk(n, w)
    if w >= n or m % tm != 0 or wblk is None:
        idx, cnt = ball_query_pallas(xyz, new_xyz, radius, nsample)
        zp = inputs @ w0 + b0
        flat = idx.reshape(b, m * k)
        grouped = jnp.take_along_axis(zp, flat[..., None], axis=1)
        return (
            grouped.reshape(b, m, k, zp.shape[-1]), idx, cnt,
            None, None, jnp.array(True),
        )
    t = m // tm
    trk = tm * k

    x1 = xyz.astype(jnp.float32)
    x2 = new_xyz.astype(jnp.float32)
    perm = jnp.argsort(x1[..., 0], axis=1)  # (B, N)
    # ONE row gather for coords AND features: the two separate
    # take_along_axis calls (3-ch xs + cin-ch inputs, same perm) measured
    # 2.2 + 2.0 ms at the batch-64 flagship profile — row gathers are
    # addressing-bound, so gathering the concatenated rows once costs ~one
    # gather, not two (bit-identical: gather∘slice == slice∘gather).
    cat_s = jnp.take_along_axis(
        jnp.concatenate([x1, inputs.astype(jnp.float32)], axis=-1),
        perm[..., None],
        axis=1,
    )
    xs = cat_s[..., :3]
    sorted_inputs = cat_s[..., 3:]
    qperm = jnp.argsort(x2[..., 0], axis=1)  # (B, M)
    qs = jnp.take_along_axis(x2, qperm[..., None], axis=1)

    q_tiles = qs.reshape(b, t, tm, 3)
    xsx = xs[..., 0]
    tile_lo = q_tiles[..., 0].min(axis=-1) - jnp.float32(radius)
    tile_hi = q_tiles[..., 0].max(axis=-1) + jnp.float32(radius)
    lo = jax.vmap(jnp.searchsorted)(xsx, tile_lo).astype(jnp.int32)
    hi = jax.vmap(jnp.searchsorted)(xsx, tile_hi).astype(jnp.int32)
    lo_aligned = (jnp.clip(lo, 0, max(n - w, 0)) // _LANES) * _LANES
    ok = jnp.max(hi - lo_aligned) <= w

    xs_t = jnp.transpose(xs, (0, 2, 1))  # (B, 3, N)
    perm_in = perm.astype(jnp.int32)[:, None, :]  # (B, 1, N)
    cut = jax.vmap(
        jax.vmap(
            lambda arr, s: lax.dynamic_slice(arr, (0, s), (arr.shape[0], w)),
            in_axes=(None, 0),
        ),
        in_axes=(0, 0),
    )
    win = cut(xs_t, lo_aligned)  # (B, T, 3, W)
    permw = cut(perm_in, lo_aligned)  # (B, T, 1, W)

    bq_kernel = functools.partial(
        _bq_sliced_pos_kernel, n=n, radius=float(radius), nsample=nsample
    )
    idx_s, pos_s, cnt_s = pl.pallas_call(
        bq_kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, 3, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tm, nsample), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm, nsample), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tm), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, t, tm, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, t, 1, tm), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, _round_up(nsample, _LANES)), jnp.int32)
        ],
    )(win, permw, q_tiles)

    # project the SORTED cloud (row-independent: same values as projecting
    # then permuting) so the gather's source is natively in sorted order
    zp_s = sorted_inputs @ w0 + b0  # (B, N, f0)
    c = zp_s.shape[-1]

    kblk = (lo_aligned // wblk).astype(jnp.int32)  # (B, T)
    off = (lo_aligned - kblk * wblk).astype(jnp.int32)  # lo mod wblk
    rel = (pos_s.reshape(b, t, trk) + off[:, :, None])[:, :, None, :]
    nblk = n // wblk

    def map0(bb, tt, kblk_ref):
        return (bb, kblk_ref[bb, tt], 0)

    def map1(bb, tt, kblk_ref):
        # edge clamp: when kblk is the last block the window already fits
        # inside it (rel < wblk there), so duplicating it is never read
        return (bb, jnp.minimum(kblk_ref[bb, tt] + 1, nblk - 1), 0)

    gather_kernel = functools.partial(
        _window_gather_kernel, trk=trk, wblk=wblk, unroll=4
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, 1, trk), lambda bb, tt, kr: (bb, tt, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wblk, c), map0),
            pl.BlockSpec((1, wblk, c), map1),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, trk, c), lambda bb, tt, kr: (bb, tt, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((2 * wblk, c), zp_s.dtype)],
    )
    grouped_s = pl.pallas_call(
        gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, trk, c), zp_s.dtype),
    )(kblk, rel, zp_s, zp_s).reshape(b, m, k, c)

    # parity surface in original query order (XLA prunes these when the
    # caller discards them — the flagship model does)
    inv_q = jnp.argsort(qperm, axis=1)
    idx_out = jnp.take_along_axis(
        idx_s.reshape(b, m, k), inv_q[..., None], axis=1
    )
    cnt_out = jnp.take_along_axis(cnt_s.reshape(b, m), inv_q, axis=1)
    return grouped_s, idx_out, cnt_out, qperm, inv_q, ok
