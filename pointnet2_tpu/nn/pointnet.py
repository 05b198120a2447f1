"""PointNet++ building blocks: Set Abstraction and Feature Propagation.

TPU-first re-design of util/pointnet_util.py:
- sampling/grouping run as XLA/Pallas ops (pointnet2_tpu.ops) entirely
  on-device — the reference bounced to CPU for 3-NN/interpolate every FP
  level (tf_ops/tf_interpolate.cpp:283,378), costing 4 device round-trips
  per forward pass;
- the shared MLP is a Dense stack (MXU), grouped tensors stay in NHWC-
  equivalent (B, npoint, nsample, C) layout which XLA tiles natively.

Feature parity with the reference modules:
- pooling modes max / avg / weighted_avg / max_and_avg
  (util/pointnet_util.py:167-191),
- group_all variant (sample_and_group_all, :63-95),
- kNN grouping instead of ball query (:39-42),
- use_xyz toggle, optional mlp2 post-pool MLP,
- multi-scale grouping (pointnet_sa_module_msg, :219-282).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from pointnet2_tpu import ops
from pointnet2_tpu.nn.layers import BatchNorm, SharedMLP


def sample_and_group(
    xyz: jax.Array,
    points: Optional[jax.Array],
    npoint: int,
    radius: float,
    nsample: int,
    use_knn: bool = False,
    use_xyz: bool = True,
    impl: str | None = None,
    ball_query_fn=None,
    geometry=None,
):
    """FPS centroids + ball-query (or kNN) grouping + local normalization.

    Mirrors util/pointnet_util.py:18-60. Returns (new_xyz, new_points, idx,
    grouped_xyz) with shapes (B,npoint,3), (B,npoint,nsample,3+C),
    (B,npoint,nsample), (B,npoint,nsample,3). ``ball_query_fn`` overrides
    the radius search ((xyz, new_xyz) -> (idx, cnt)) — SetAbstraction uses
    it to route through the calibrated-window query when configured.
    ``geometry`` supplies precomputed ``{"new_xyz", "idx"}`` (see
    models.precompute_geometry), skipping FPS and the radius search — the
    gradient-accumulation hoist computes them ONCE at full batch width. A
    centroids-only ``{"new_xyz"}`` dict skips just FPS (SetAbstractionMSG
    shares one FPS across its grouping scales this way).
    """
    if geometry is not None and "idx" in geometry:
        new_xyz, idx = geometry["new_xyz"], geometry["idx"]
    else:
        if geometry is not None:
            new_xyz = geometry["new_xyz"]
        else:
            _, new_xyz = ops.fps_centroids(xyz, npoint, impl=impl)
        if use_knn:
            _, idx = ops.knn(xyz, new_xyz, nsample, impl=impl)
        elif ball_query_fn is not None:
            idx, _ = ball_query_fn(xyz, new_xyz)
        else:
            idx, _ = ops.ball_query(xyz, new_xyz, radius, nsample, impl=impl)
    if points is not None:
        # ONE row gather for coords AND features: row gathers are
        # addressing-bound (cost ~ row count, not width — see the round-5
        # fused sort-gather, PERFORMANCE.md), so gathering the
        # concatenated rows once costs ~one gather, not two.
        # Bit-identical: gather∘concat == concat∘gather; the f32 round
        # trip on a lower-precision `points` is exact (widening), and the
        # astype restores the original dtype for the use_xyz=False path.
        grouped_all = ops.group_points(
            jnp.concatenate([xyz, points.astype(xyz.dtype)], axis=-1), idx
        )
        grouped_xyz = grouped_all[..., :3] - new_xyz[:, :, None, :]
        grouped_points = grouped_all[..., 3:].astype(points.dtype)
        new_points = (
            jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
            if use_xyz
            else grouped_points
        )
    else:
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: jax.Array, points: Optional[jax.Array], use_xyz: bool = True):
    """Single group containing every point, centroid (0,0,0).

    Mirrors util/pointnet_util.py:63-95.
    """
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, 1, n))
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = (
            jnp.concatenate([xyz, points], axis=-1) if use_xyz else points
        )[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def _pool(new_points: jax.Array, grouped_xyz: jax.Array, pooling: str) -> jax.Array:
    """Local-region pooling over the nsample axis (util/pointnet_util.py:166-191)."""
    if pooling == "max":
        return jnp.max(new_points, axis=2)
    if pooling == "avg":
        return jnp.mean(new_points, axis=2)
    if pooling == "weighted_avg":
        dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
        exp_dists = jnp.exp(-dists * 5.0)
        weights = exp_dists / jnp.sum(exp_dists, axis=2, keepdims=True)
        return jnp.sum(new_points * weights, axis=2)
    if pooling == "max_and_avg":
        return jnp.concatenate(
            [jnp.mean(new_points, axis=2), jnp.max(new_points, axis=2)], axis=-1
        )
    raise ValueError(f"unknown pooling {pooling!r}")


class SetAbstraction(nn.Module):
    """PointNet++ SA module (util/pointnet_util.py:98-216).

    (B,N,3) xyz + (B,N,C) features -> (B,npoint,3) centroids +
    (B,npoint,mlp[-1] or mlp2[-1]) pooled features + group indices.

    ``pre_project=True`` (default) applies the first MLP layer's linear part
    to ALL N points BEFORE grouping. Because the layer is linear and the
    grouped input is [xyz_i - center_q, feats_i], the gathered result equals
    projecting first and subtracting the center's xyz projection after:

        W.T [x_i - c_q; f_i] + b  =  (W_xyz.T x_i + W_feat.T f_i + b)
                                      - W_xyz.T c_q

    This is mathematically identical (up to f32 reassociation) but gathers
    mlp[0] channels instead of 3+C and runs the widest matmul over N points
    once instead of npoint*nsample times — on TPU the grouping gather is
    bandwidth/addressing-bound, so shrinking its width is the win.
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    mlp2: Optional[Sequence[int]] = None
    group_all: bool = False
    pooling: str = "max"
    use_knn: bool = False
    use_xyz: bool = True
    use_bn: bool = True
    pre_project: bool = True
    # True ONLY when (xyz, points) are leaf inputs that never need
    # gradients (the raw input cloud feeding the first SA level): the
    # pre-projected grouping then uses ops.project_group_leaf, whose
    # backward replaces autodiff's dominant scatter-add with a narrow
    # re-gather + matmul (see ops/core.py). Parameter gradients are
    # identical; the input cloud's cotangent becomes zero.
    leaf_inputs: bool = False
    ops_impl: Optional[str] = None
    # Computation dtype for the MLP/feature path (see SharedMLP.dtype).
    # Geometry (FPS / ball query / kNN) always runs in f32 — neighbor
    # selection stays bit-exact in bf16 mode.
    compute_dtype: Optional[Any] = None
    # Calibrated ball-query x-window (ops.ball_query_calibrated): when set
    # (and use_knn is False), ball query sweeps only a window-wide slice of
    # the x-sorted cloud and the exactness certificate is sown into the
    # "diagnostics" collection as "bq_window_ok" (dropped unless the caller
    # applies with mutable=["diagnostics"] — see Trainer.check_bq_window).
    # Pick the window with tools/bq_window_calibrate.py; levels whose cloud
    # is not larger than the window automatically use the full exact kernel.
    bq_window: Optional[int] = None

    def _ball_query(self, xyz, new_xyz):
        if self.bq_window is not None:
            idx, cnt, ok = ops.ball_query_calibrated(
                xyz, new_xyz, self.radius, self.nsample, self.bq_window,
                impl=self.ops_impl,
            )
            self.sow("diagnostics", "bq_window_ok", ok)
            return idx, cnt
        return ops.ball_query(
            xyz, new_xyz, self.radius, self.nsample, impl=self.ops_impl
        )

    @nn.compact
    def __call__(self, xyz, points, *, train: bool, bn_momentum, geometry=None):
        if geometry is not None and (
            self.group_all or (self.use_knn and "idx" in geometry)
        ):
            # Precomputed geometry carries FPS centroids + BALL-QUERY
            # indices (models.precompute_geometry); silently substituting
            # them for kNN/group-all indices would change the math.
            # (Centroids-only geometry is grouping-mode independent, but
            # group_all has no FPS to hoist at all.)
            raise ValueError(
                "precomputed geometry is only valid for the ball-query SSG "
                f"path (got group_all={self.group_all}, use_knn={self.use_knn})"
            )
        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz
            )
        elif self.pre_project and self.mlp and (self.use_xyz or points is not None):
            return self._pre_projected(xyz, points, train, bn_momentum, geometry)
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                xyz,
                points,
                self.npoint,
                self.radius,
                self.nsample,
                self.use_knn,
                self.use_xyz,
                impl=self.ops_impl,
                ball_query_fn=self._ball_query,
                geometry=geometry,
            )

        new_points = SharedMLP(
            self.mlp, use_bn=self.use_bn, dtype=self.compute_dtype, name="mlp"
        )(new_points, train=train, bn_momentum=bn_momentum)
        new_points = _pool(new_points, grouped_xyz, self.pooling)
        if self.mlp2:
            new_points = SharedMLP(
                self.mlp2, use_bn=self.use_bn, dtype=self.compute_dtype, name="mlp2"
            )(new_points, train=train, bn_momentum=bn_momentum)
        return new_xyz, new_points, idx

    def _pre_projected(self, xyz, points, train, bn_momentum, geometry=None):
        f0 = self.mlp[0]
        if points is not None:
            inputs = (
                jnp.concatenate([xyz, points], axis=-1) if self.use_xyz else points
            )
        else:
            inputs = xyz
        cin = inputs.shape[-1]
        w = self.param("w0", nn.initializers.xavier_uniform(), (cin, f0), jnp.float32)
        b = self.param("b0", nn.initializers.zeros, (f0,), jnp.float32)

        # The projection/subtraction/BN stay f32 even in bf16 mode:
        # ``grouped - zq`` subtracts two O(|x|) projections to recover the
        # O(radius) local offset — bf16-rounded operands lose most of the
        # difference (measured: logits off by ~50% when this ran in bf16).
        # The cast to compute_dtype happens after bn0 normalizes scale.
        if geometry is not None:
            # Precomputed geometry (models.precompute_geometry): the
            # accumulation hoist ran FPS/ball query once at full batch
            # width; per-sample values are mathematically identical (the
            # kernels are batch-independent — see the exactness note on
            # precompute_geometry for the ulp-level caveat). A
            # centroids-only {"new_xyz"} dict (no "idx") hoists just FPS:
            # grouping still runs here, including the fused windowed eval
            # path (SetAbstractionMSG shares one FPS across scales so).
            new_xyz = geometry["new_xyz"]
        else:
            fps_idx, new_xyz = ops.fps_centroids(
                xyz, self.npoint, impl=self.ops_impl
            )
        has_idx = geometry is not None and "idx" in geometry

        # Fused windowed grouping (EVAL only): the calibrated ball query and
        # the zp gather share one x-sorted pass — the gather rides two
        # contiguous block DMAs per query tile instead of per-row lookups
        # (1.9x the XLA gather at the SA1 shape, ops/pallas/wingather.py).
        # The grouped tensor comes back in sorted-QUERY order; every
        # per-centroid op below is order-covariant in eval mode (BN uses
        # moving stats), so we un-permute only the pooled output — values
        # stay bit-identical to the exact path. Train keeps the raw-gather
        # path (narrow C: the windowed kernel loses there — probe), and
        # train-mode BN batch moments would reassociate under permutation.
        fused_window = (
            not has_idx
            and self.bq_window is not None
            and not self.use_knn
            and not train
            and self.pooling != "weighted_avg"
        )
        inv_q = None
        if fused_window:
            grouped, idx, _cnt, qperm, inv_q, ok = ops.project_group_calibrated(
                inputs, w, b, xyz, new_xyz, self.radius, self.nsample,
                self.bq_window, impl=self.ops_impl,
            )
            self.sow("diagnostics", "bq_window_ok", ok)
            if self.use_xyz:
                centers = (
                    new_xyz if inv_q is None
                    else jnp.take_along_axis(new_xyz, qperm[..., None], axis=1)
                )
                zq = centers @ w[:3]  # centers' xyz projection (no bias)
                grouped = grouped - zq[:, :, None, :]
            h = grouped
            if self.use_bn:
                h = BatchNorm(name="bn0")(h, train=train, momentum=bn_momentum)
            h = nn.relu(h)
            if self.compute_dtype is not None:
                h = h.astype(self.compute_dtype)
            if len(self.mlp) > 1:
                h = SharedMLP(
                    self.mlp[1:],
                    use_bn=self.use_bn,
                    dtype=self.compute_dtype,
                    name="mlp_rest",
                )(h, train=train, bn_momentum=bn_momentum)
            new_points = _pool(h, None, self.pooling)
            if inv_q is not None:
                new_points = jnp.take_along_axis(
                    new_points, inv_q[..., None], axis=1
                )
            if self.mlp2:
                new_points = SharedMLP(
                    self.mlp2, use_bn=self.use_bn, dtype=self.compute_dtype,
                    name="mlp2",
                )(new_points, train=train, bn_momentum=bn_momentum)
            return new_xyz, new_points, idx

        if has_idx:
            idx = geometry["idx"]
        elif self.use_knn:
            _, idx = ops.knn(xyz, new_xyz, self.nsample, impl=self.ops_impl)
        else:
            idx, _ = self._ball_query(xyz, new_xyz)

        if self.leaf_inputs and train:
            # TRAIN, leaf inputs: gather the RAW channels (the reference's
            # own layout, util/pointnet_util.py:18-60) and project after.
            # Autodiff then needs NO scatter (the input cotangent is pruned
            # — inputs are leaves) and NO re-gather (grad_w contracts the
            # grouped residual stored by the forward). This deletes the two
            # SA1 backward hotspots at once: project_group_leaf's 6-ch
            # re-gather (4.3 ms at batch 16) AND the forward's f0-wide zp
            # gather (3.0 ms), for one cin-wide raw gather (~3.7 ms).
            # Mathematically identical to the pre-projected form up to f32
            # reassociation: (x - c) @ w_xyz == x @ w_xyz - c @ w_xyz.
            grouped_in = ops.group_points(inputs, idx)  # (B, m, k, cin)
            if self.use_xyz:
                grouped_in = jnp.concatenate(
                    [
                        grouped_in[..., :3] - new_xyz[:, :, None, :],
                        grouped_in[..., 3:],
                    ],
                    axis=-1,
                )
            grouped = grouped_in @ w + b
        else:
            if self.leaf_inputs:
                # EVAL, leaf inputs: pre-projected gather (f0-wide rows
                # measure faster than cin-wide on this chip; no backward
                # exists to pay for). project_group_leaf == project+group.
                grouped = ops.project_group_leaf(inputs, w, b, idx)
            else:
                zp = inputs @ w + b  # (B, N, f0): layer-1 linear, ALL points
                grouped = ops.group_points(zp, idx)  # (B, m, k, f0)
            if self.use_xyz:
                zq = new_xyz @ w[:3]  # centers' xyz projection (no bias)
                grouped = grouped - zq[:, :, None, :]
        h = grouped
        if self.use_bn:
            h = BatchNorm(name="bn0")(h, train=train, momentum=bn_momentum)
        h = nn.relu(h)
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        if len(self.mlp) > 1:
            h = SharedMLP(
                self.mlp[1:],
                use_bn=self.use_bn,
                dtype=self.compute_dtype,
                name="mlp_rest",
            )(h, train=train, bn_momentum=bn_momentum)

        if self.pooling == "weighted_avg":
            grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        else:
            grouped_xyz = None
        new_points = _pool(h, grouped_xyz, self.pooling)
        if self.mlp2:
            new_points = SharedMLP(
                self.mlp2, use_bn=self.use_bn, dtype=self.compute_dtype, name="mlp2"
            )(new_points, train=train, bn_momentum=bn_momentum)
        return new_xyz, new_points, idx


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA module (util/pointnet_util.py:219-282).

    Groups around shared FPS centroids at several radii and concatenates the
    per-scale pooled features.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    ops_impl: Optional[str] = None
    compute_dtype: Optional[Any] = None
    # True (default): each scale delegates to a pre-projected
    # SetAbstraction submodule ("scale{i}") sharing the level's FPS
    # centroids via the geometry seam — the scale's layer-1 Dense runs
    # once over the N cloud rows instead of over the M*K grouped rows
    # (k-fold fewer layer-1 FLOPs), the gather moves f0-wide rows, and
    # leaf_inputs' scatter-free train backward applies. Numerically
    # equivalent to the group-then-MLP form (same algebra as
    # SetAbstraction.pre_project; equivalence pinned in
    # tests/test_preproject.py::test_msg_pre_projected_equivalent).
    # False keeps the literal grouped-first-layer formulation
    # (util/pointnet_util.py:219-282 layout).
    pre_project: bool = True
    # See SetAbstraction.leaf_inputs: True when (xyz, points) are raw
    # inputs (gradient leaves) — the train backward skips its scatter-add.
    leaf_inputs: bool = False
    # Calibrated ball-query window shared by every scale (calibrate for the
    # LARGEST radius — wider-than-needed windows stay exact). See
    # SetAbstraction.bq_window.
    bq_window: Optional[int] = None

    @nn.compact
    def __call__(self, xyz, points, *, train: bool, bn_momentum, geometry=None):
        if geometry is not None:
            # Precomputed geometry (models.precompute_geometry(arch="msg")):
            # shared FPS centroids + one ball-query index set PER SCALE.
            # The window certificates come from the hoisted ops, so no sows
            # here (mirrors SetAbstraction's geometry path).
            if len(geometry["idx"]) != len(self.radius_list):
                raise ValueError(
                    f"geometry carries {len(geometry['idx'])} index sets "
                    f"for {len(self.radius_list)} grouping scales"
                )
            new_xyz = geometry["new_xyz"]
        else:
            fps_idx, new_xyz = ops.fps_centroids(
                xyz, self.npoint, impl=self.ops_impl
            )
        # EVAL + window + pre_project: delegate GROUPING to each scale too
        # (centroids-only geometry), so SetAbstraction's fused windowed
        # grouping path runs per scale (ops.project_group_calibrated — the
        # block-DMA gather that beats the XLA row gather 1.9x at SA1). The
        # x-sort/gather preamble inside project_group_sliced depends only
        # on (xyz, inputs, new_xyz) — identical across scales — so XLA CSE
        # shares it; only the per-scale windowed kernels differ.
        fused_window = (
            geometry is None
            and self.pre_project
            and self.bq_window is not None
            and not train
        )
        scale_feats = []
        for i, (radius, nsample) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            if fused_window:
                idx = None  # the delegated scale computes its own grouping
            elif geometry is not None:
                idx = geometry["idx"][i]
            elif self.bq_window is not None:
                idx, _, ok = ops.ball_query_calibrated(
                    xyz, new_xyz, radius, nsample, self.bq_window,
                    impl=self.ops_impl,
                )
                self.sow("diagnostics", "bq_window_ok", ok)
            else:
                idx, _ = ops.ball_query(
                    xyz, new_xyz, radius, nsample, impl=self.ops_impl
                )
            if self.pre_project:
                # The scale IS a SetAbstraction around the shared
                # centroids: hand it the (new_xyz, idx) pair through the
                # geometry seam and inherit the pre-projected forward,
                # the leaf-train backward, and the BN-fold param layout.
                _, feats_i, _ = SetAbstraction(
                    npoint=self.npoint,
                    radius=radius,
                    nsample=nsample,
                    mlp=list(self.mlp_list[i]),
                    use_xyz=self.use_xyz,
                    use_bn=self.use_bn,
                    ops_impl=self.ops_impl,
                    compute_dtype=self.compute_dtype,
                    leaf_inputs=self.leaf_inputs,
                    bq_window=self.bq_window if fused_window else None,
                    name=f"scale{i}",
                )(
                    xyz, points, train=train, bn_momentum=bn_momentum,
                    geometry=(
                        {"new_xyz": new_xyz}
                        if fused_window
                        else {"new_xyz": new_xyz, "idx": idx}
                    ),
                )
                scale_feats.append(feats_i)
                continue
            if points is not None:
                # One combined row gather (see sample_and_group): two
                # gathers over the same idx become one — MSG pays this
                # per scale per dense level.
                grouped_all = ops.group_points(
                    jnp.concatenate(
                        [xyz, points.astype(xyz.dtype)], axis=-1
                    ),
                    idx,
                )
                grouped_xyz = (
                    grouped_all[..., :3] - new_xyz[:, :, None, :]
                )
                gp = grouped_all[..., 3:].astype(points.dtype)
                grouped = (
                    jnp.concatenate([gp, grouped_xyz], axis=-1)
                    if self.use_xyz
                    else gp
                )
            else:
                grouped_xyz = (
                    ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
                )
                grouped = grouped_xyz
            feats = SharedMLP(
                self.mlp_list[i],
                use_bn=self.use_bn,
                dtype=self.compute_dtype,
                name=f"mlp_{i}",
            )(grouped, train=train, bn_momentum=bn_momentum)
            scale_feats.append(jnp.max(feats, axis=2))
        return new_xyz, jnp.concatenate(scale_feats, axis=-1)


class FeaturePropagation(nn.Module):
    """PointNet++ FP module (util/pointnet_util.py:285-326).

    Interpolates coarse-level features back onto the dense level via
    inverse-distance-weighted exact 3-NN, concatenates skip features, and
    applies a shared MLP. The reference ran 3-NN/interpolation on the CPU
    (Open3D KDTree); here it's a fused on-device top-k.
    """

    mlp: Sequence[int]
    use_bn: bool = True
    ops_impl: Optional[str] = None
    compute_dtype: Optional[Any] = None
    # Calibrated 3-NN x-window (ops.three_nn_calibrated): when set, the
    # 3-NN sweeps only a window-wide centered slice of the x-sorted coarse
    # cloud and the exactness certificate is sown into "diagnostics" as
    # "fp_window_ok" (checked together with bq_window_ok by
    # Trainer.check_bq_window). Levels whose coarse cloud is not larger
    # than the window automatically use the full exact kernel.
    fp_window: Optional[int] = None

    @nn.compact
    def __call__(
        self, xyz1, xyz2, points1, points2, *, train: bool, bn_momentum,
        geometry=None,
    ):
        if geometry is not None:
            # Precomputed 3-NN (models.precompute_geometry): hoisted out
            # of the accumulation scan. Indices are exact; dist2 can
            # differ by ~1 ulp from the inline op (XLA fuses the hoisted
            # subgraph differently — precompute_geometry's exactness note).
            dist2, idx = geometry["dist2"], geometry["idx"]
        elif self.fp_window is not None:
            dist2, idx, ok = ops.three_nn_calibrated(
                xyz1, xyz2, self.fp_window, impl=self.ops_impl
            )
            self.sow("diagnostics", "fp_window_ok", ok)
        else:
            dist2, idx = ops.three_nn(xyz1, xyz2, impl=self.ops_impl)
        # The reference registers NoGradient on ThreeNN; distances are
        # geometry, not parameters — stop the (useless) backward sweep.
        dist2 = lax.stop_gradient(dist2)
        weight = ops.interpolation_weights(dist2)
        # bf16 mode runs the sparse-weight interpolation matmul at default
        # MXU precision (bf16 inputs, ~2x the highest-precision rate).
        precision = (
            "default" if self.compute_dtype == jnp.bfloat16 else None
        )
        interpolated = ops.three_interpolate(
            points2, idx, weight, impl=self.ops_impl, precision=precision
        )
        if points1 is not None:
            if self.compute_dtype is not None:
                points1 = points1.astype(self.compute_dtype)
            new_points = jnp.concatenate([interpolated, points1], axis=-1)
        else:
            new_points = interpolated
        return SharedMLP(
            self.mlp, use_bn=self.use_bn, dtype=self.compute_dtype, name="mlp"
        )(new_points, train=train, bn_momentum=bn_momentum)
