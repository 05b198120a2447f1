"""XLA implementations of the point-set operators.

These are pure jax.numpy/lax programs with static shapes and compiler-friendly
control flow. They run on any backend (CPU tests, TPU production). The hot
TPU paths (FPS, ball query, knn) also have Pallas kernels in
``pointnet2_tpu.ops.pallas``; ``pointnet2_tpu.ops`` dispatches between the two.

Semantics mirror the reference's native kernels exactly (see
ops/reference.py for the NumPy oracles and the reference file:line citations):

- farthest_point_sample: tf_ops/tf_sampling.cu:111-176 (start at index 0,
  squared-distance max-min selection).
- ball_query: tf_ops/tf_grouping.cu:3-43 (FIRST nsample in-ball points in
  dataset index order, pad with first hit, count capped at nsample).
- knn: tf_ops/tf_grouping.py:66-89 (dense distance matrix + top-k smallest).
- three_nn: tf_ops/tf_interpolate.cpp:213-243 (exact 3-NN, SQUARED dists).
- three_interpolate: tf_ops/tf_interpolate.cpp:305-330 (inverse-distance
  weighted 3-point blend; gradients come from JAX AD, which yields the same
  scatter-add as the hand-written GroupPointGrad/ThreeInterpolateGrad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_xla(xyz: Array, npoint: int) -> Array:
    """Farthest point sampling, batched over a fori_loop.

    Args:
        xyz: (B, N, 3) float32.
        npoint: static number of samples.
    Returns:
        (B, npoint) int32 indices.
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(j, carry):
        min_d, old, idx = carry
        sel = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - sel) ** 2, axis=-1)  # (B, N)
        min_d = jnp.minimum(min_d, d)
        old = jnp.argmax(min_d, axis=-1).astype(jnp.int32)  # (B,)
        idx = lax.dynamic_update_slice(idx, old[:, None], (0, j))
        return min_d, old, idx

    min_d0 = jnp.full((b, n), jnp.float32(1e38))
    old0 = jnp.zeros((b,), jnp.int32)
    idx0 = jnp.zeros((b, npoint), jnp.int32)
    _, _, idx = lax.fori_loop(1, npoint, body, (min_d0, old0, idx0))
    return idx


def gather_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M) -> (B, M, C).

    JAX AD gives the scatter-add gradient the reference registers by hand
    (tf_ops/tf_sampling.py:54-58).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def prob_sample(cdf: Array, uniforms: Array) -> Array:
    """Inverse-CDF categorical sampling (tf_ops/tf_sampling.cu:7-110).

    cdf: (B, N) unnormalized inclusive cumsum; uniforms: (B, M) in [0,1).
    Returns (B, M) int32 indices.
    """
    n = cdf.shape[-1]
    q = uniforms * cdf[:, -1:]
    idx = jax.vmap(lambda c, qq: jnp.searchsorted(c, qq, side="left"))(cdf, q)
    return jnp.minimum(idx, n - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Grouping
# ---------------------------------------------------------------------------


def _pairwise_dist2(xyz_q: Array, xyz_d: Array) -> Array:
    """Squared distances (B, M, N) between queries (B,M,3) and dataset (B,N,3).

    Uses the float32 difference form (dx^2 + dy^2 + dz^2) so boundary
    membership and neighbor ordering are bit-faithful to the reference CUDA
    kernels (tf_grouping.cu:28-31). The |q|^2 - 2 q.d + |d|^2 MXU expansion is
    faster but suffers catastrophic cancellation near ball boundaries; XLA
    fuses this broadcasted form into the consumer reduction, so the (B,M,N,3)
    intermediate is never materialized.
    """
    diff = xyz_q[:, :, None, :] - xyz_d[:, None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ball_query_xla(
    xyz1: Array, xyz2: Array, radius: float, nsample: int
) -> tuple[Array, Array]:
    """Radius search: first `nsample` in-ball dataset points per query.

    The "first k in index order" selection is expressed as a top-k over index
    keys: in-ball points keep their own index as key, others get key N; the
    nsample smallest keys are exactly the first nsample in-ball indices,
    already in dataset order. Pad-by-first and the count cap then match
    tf_ops/tf_grouping.cu:21-41.

    Returns idx (B, M, nsample) int32, cnt (B, M) int32.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d2 = _pairwise_dist2(xyz2.astype(jnp.float32), xyz1.astype(jnp.float32))
    in_ball = d2 < jnp.float32(radius) ** 2  # strict <, cu:31
    iota = lax.broadcasted_iota(jnp.int32, (b, m, n), 2)
    keys = jnp.where(in_ball, iota, n)
    k = min(nsample, n)
    neg_topk, _ = lax.top_k(-keys, k)  # ascending keys
    sel = -neg_topk
    if k < nsample:  # fewer dataset points than slots: pad with "empty" key n
        sel = jnp.concatenate(
            [sel, jnp.full((b, m, nsample - k), n, sel.dtype)], axis=-1
        )
    valid = sel < n
    first = sel[..., :1]  # first in-ball index (or n if empty ball)
    first = jnp.where(first < n, first, 0)
    idx = jnp.where(valid, sel, first).astype(jnp.int32)
    cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)
    return idx, cnt


def group_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M, K) -> (B, M, K, C).

    AD provides the scatter-add gradient (tf_ops/tf_grouping.py:57-61).
    """
    b, m, k = idx.shape
    flat = idx.reshape(b, m * k)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, m, k, points.shape[-1])


@jax.custom_vjp
def project_group_leaf(inputs: Array, w: Array, b: Array, idx: Array) -> Array:
    """``group_points(inputs @ w + b, idx)`` with a scatter-free backward.

    For a LEAF input cloud (one that needs no gradient — the raw
    xyz/color batch feeding the first SetAbstraction), autodiff's backward
    for project-then-group is a scatter-add of (B*M*K) rows into the
    (B, N, f0) projection — the single most expensive op in the train step
    (measured 6.8 ms of a 40.5 ms batch-16 step; scatter row updates are
    read-modify-write and addressing-bound on TPU). But the scatter's only
    consumer is the weight gradient, and algebraically

        grad_w = inputs^T @ scatter(grad_grouped)
               = group_points(inputs, idx)^T @ grad_grouped

    so the backward can instead re-gather the narrow raw inputs (cin=6
    wide vs f0=32) and contract directly — no scatter, plain MXU matmul.

    The cotangent returned for ``inputs`` is ZERO by construction: do not
    use this op anywhere the input cloud itself needs gradients (deeper SA
    levels, adversarial-perturbation training); use the plain
    project + ``group_points`` chain there.

    Matches the reference's QueryAndGroup + first conv layer combination
    (util/pointnet_util.py:98-216 + tf_ops/tf_grouping.py:57-61) for
    inference and for every parameter gradient.
    """
    zp = inputs @ w + b
    return group_points(zp, idx)


def _pgl_fwd(inputs, w, b, idx):
    return project_group_leaf(inputs, w, b, idx), (inputs, idx)


def _pgl_bwd(res, g):
    inputs, idx = res
    gathered = group_points(inputs, idx)  # (B, M, K, cin) narrow re-gather
    # HIGHEST keeps the weight-gradient contraction in f32 (the tiny
    # (cin, f0) output amortizes the 6-pass cost; measured neutral on the
    # step time) instead of the default bf16-input matmul.
    grad_w = jnp.einsum(
        "bmkc,bmkf->cf", gathered, g, precision=lax.Precision.HIGHEST
    )
    grad_b = jnp.sum(g, axis=(0, 1, 2))
    return jnp.zeros_like(inputs), grad_w, grad_b, None


project_group_leaf.defvjp(_pgl_fwd, _pgl_bwd)


@functools.partial(jax.jit, static_argnums=(2,))
def knn_xla(xyz1: Array, xyz2: Array, k: int) -> tuple[Array, Array]:
    """k smallest squared distances + indices, ascending (B, M, k)."""
    d2 = _pairwise_dist2(xyz2.astype(jnp.float32), xyz1.astype(jnp.float32))
    neg_d, idx = lax.top_k(-d2, k)
    return -neg_d, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def selection_sort(dist: Array, k: int) -> tuple[Array, Array]:
    """Full-row SelectionSort with exact reference semantics.

    Mirrors tf_ops/tf_grouping.cu:93-136: returns FULL (B, M, N) rows where
    positions 0..k-1 hold the k smallest values ascending (ties keep the
    first occurrence, strict <) and positions k..N-1 hold the remaining
    values in the partially-permuted order the in-place swaps leave behind.
    Returns (idx, dist_out).
    """
    b, m, n = dist.shape
    vals0 = dist.astype(jnp.float32)
    idxs0 = jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (b, m, n), 2), (b, m, n)
    )
    pos = lax.broadcasted_iota(jnp.int32, (b, m, n), 2)

    def body(s, carry):
        vals, idxs = carry
        masked = jnp.where(pos >= s, vals, jnp.float32(jnp.inf))
        mn = jnp.argmin(masked, axis=-1)[..., None]  # (B, M, 1) first min
        # swap position s <-> mn (in-place selection-sort step, cu:124-133)
        val_s = jnp.take_along_axis(vals, jnp.full_like(mn, 0) + s, axis=-1)
        val_m = jnp.take_along_axis(vals, mn, axis=-1)
        idx_s = jnp.take_along_axis(idxs, jnp.full_like(mn, 0) + s, axis=-1)
        idx_m = jnp.take_along_axis(idxs, mn, axis=-1)
        at_s = pos == s
        at_m = pos == mn
        vals = jnp.where(at_s, val_m, jnp.where(at_m, val_s, vals))
        idxs = jnp.where(at_s, idx_m, jnp.where(at_m, idx_s, idxs))
        return vals, idxs

    vals, idxs = lax.fori_loop(0, min(k, n), body, (vals0, idxs0))
    return idxs, vals


def select_top_k(k: int, dist: Array) -> tuple[Array, Array]:
    """SelectionSort wrapper parity (tf_ops/tf_grouping.py:31-43): returns
    FULL sorted-prefix rows (idx, dist) like the reference; callers slice
    [..., :k] (tf_grouping.py:86-87). For just the k smallest without the
    full-row tail, ``lax.top_k(-dist, k)`` is the fast path (knn_xla)."""
    return selection_sort(dist, k)


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------


def three_nn_xla(xyz1: Array, xyz2: Array) -> tuple[Array, Array]:
    """3 nearest neighbors of each xyz1 point among xyz2; SQUARED distances.

    xyz1: (B, N, 3) targets, xyz2: (B, M, 3) references.
    Returns dist2 (B, N, 3), idx (B, N, 3).
    """
    return knn_xla(xyz2, xyz1, 3)


def interpolation_weights(dist2: Array) -> Array:
    """Inverse-distance weights with 1e-10 clamp (util/pointnet_util.py:300-303)."""
    d = jnp.maximum(dist2, 1e-10)
    inv = 1.0 / d
    return inv / jnp.sum(inv, axis=-1, keepdims=True)


def three_interpolate(
    points: Array, idx: Array, weight: Array, precision: str | None = None
) -> Array:
    """points: (B, M, C), idx/weight: (B, N, 3) -> (B, N, C).

    ``precision`` mirrors the Pallas MXU path's contract (ops/__init__.py):
    None/"highest" accumulates the weighted sum in f32 regardless of the
    points dtype (so bf16-mode results agree with the Pallas highest path
    beyond rounding); "default" keeps the points dtype (bf16 math in bf16
    mode, like the Pallas bf16-MXU path).
    """
    gathered = group_points(points, idx)  # (B, N, 3, C)
    if precision in (None, "highest") and points.dtype == jnp.bfloat16:
        # bf16 points + highest precision: accumulate in f32 (only UPcast —
        # f32/f64 inputs keep their native dtype, so the f64 gradient
        # goldens and the f32 parity path are untouched).
        out = jnp.sum(
            gathered.astype(jnp.float32) * weight[..., None].astype(jnp.float32),
            axis=2,
        )
        return out.astype(points.dtype)
    return jnp.sum(gathered * weight[..., None].astype(points.dtype), axis=2)
