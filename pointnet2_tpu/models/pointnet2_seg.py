"""PointNet++ SSG semantic segmentation network.

Architecture parity with the reference model (model.py:22-148):

    input (B, N, 3[+3 rgb])
    SA1: FPS->l1_npoint, r=l1_radius, k=32, MLP [32,32,64]
    SA2: ->l2_npoint, r=l2_radius, MLP [64,64,128]
    SA3: ->l3_npoint, r=l3_radius, MLP [128,128,256]
    SA4: ->l4_npoint, r=l4_radius, MLP [256,256,512]
    FP1..FP4: [256,256] / [256,256] / [256,128] / [128,128,128]
    head: Dense 128 + BN + ReLU -> Dropout 0.5 -> Dense num_classes

Loss parity with model.py:152-161 (weighted sparse softmax CE with TF's
SUM_BY_NONZERO_WEIGHTS reduction).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointnet2_tpu import ops
from pointnet2_tpu.config import Config
from pointnet2_tpu.nn.layers import BatchNorm
from pointnet2_tpu.nn.pointnet import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
)

SA_MLPS = ([32, 32, 64], [64, 64, 128], [128, 128, 256], [256, 256, 512])
FP_MLPS = ([256, 256], [256, 256], [256, 128], [128, 128, 128])


class PointNet2SemSeg(nn.Module):
    """Flagship segmentation model. Input (B, N, 3+feature_size) -> logits (B, N, C)."""

    num_classes: int = 9
    use_color: bool = True
    config: Optional[Config] = None
    ops_impl: Optional[str] = None
    pre_project: bool = True
    # Computation dtype for the MLP/feature path (jnp.bfloat16 for the
    # production inference mode; None = f32 parity default). Params stay
    # f32 — the same checkpoints serve both modes. Geometry ops (FPS, ball
    # query, 3-NN) always run f32, so neighbor structure is bit-identical;
    # only MLP activations and the interpolation matmul change precision.
    compute_dtype: Optional[Any] = None
    # SELECTIVE mixed precision: when set (with compute_dtype=bfloat16), a
    # stage runs in compute_dtype only if its narrowest MLP width is >= this
    # threshold; narrower stages stay f32. At 128 that keeps SA1 ([32,32,64])
    # and SA2 ([64,64,128] — narrowest 64) in f32, where bf16's 7-bit
    # mantissa costs the most relative precision per channel, while the wide
    # SA3/SA4 encoders, the whole FP stack, and the head (>= 128 ch — the
    # bulk of the FLOPs and activation traffic) take the bf16 speedup.
    # Convergence-vs-throughput tradeoff measured in PERFORMANCE.md
    # "Round 5: selective bf16" (tools/bf16_train_soak.py --min_width).
    # None = uniform compute_dtype everywhere (the round-4 behavior).
    compute_dtype_min_width: Optional[int] = None
    # True (default): treat the input point cloud as a GRADIENT LEAF — SA1
    # uses ops.project_group_leaf, whose scatter-free backward returns an
    # exactly-ZERO cotangent for `point_cloud` (parameter gradients are
    # identical; it's the fastest train path). Set False whenever the input
    # cloud itself needs gradients — saliency maps, adversarial
    # perturbation, input optimization — to route SA1 through the plain
    # project+group chain with the full autodiff backward.
    input_is_leaf: bool = True
    # Calibrated ball-query x-window (production fast path): SA levels whose
    # cloud exceeds this width sweep only a window-wide slice of the
    # x-sorted cloud (1.6-2.3x faster ball query at SA1, PERFORMANCE.md) and
    # sow an exactness certificate into the "diagnostics" collection
    # ("bq_window_ok" — True means outputs are bit-identical to the exact
    # kernel). Calibrate with tools/bq_window_calibrate.py; verify on real
    # batches with Trainer.check_bq_window. None (default) = exact full
    # kernels everywhere. Either ONE int shared by every level (levels
    # whose cloud is not larger than it statically run exact — with 3072
    # only SA1's 8192-point cloud engages) or a 4-tuple of per-SA-level
    # Optional[int] widths (round 5: lets the coarse levels engage windows
    # sized to THEIR clouds, e.g. (3072, 768, None, None)).
    bq_window: Union[int, Sequence[Optional[int]], None] = None
    # Calibrated 3-NN x-window for the FP decoder levels (same contract:
    # certificate sown as "fp_window_ok", checked by Trainer.check_bq_window;
    # coarse clouds not larger than the window run the full exact kernel).
    # Int or per-FP-level 4-tuple, like bq_window (FP level i targets
    # decoder stage i: fp1 interpolates level 3 from level 4, ..., fp4
    # interpolates the raw cloud from level 1).
    fp_window: Union[int, Sequence[Optional[int]], None] = None

    def _bq_win(self, i: int) -> Optional[int]:
        return _level_window(self.bq_window, i)

    def _fp_win(self, i: int) -> Optional[int]:
        return _level_window(self.fp_window, i)

    def _stage_dtype(self, widths) -> Optional[Any]:
        """Per-stage compute dtype under selective mixed precision."""
        if self.compute_dtype is None or self.compute_dtype_min_width is None:
            return self.compute_dtype
        return (
            self.compute_dtype
            if min(widths) >= self.compute_dtype_min_width
            else None
        )

    @nn.compact
    def __call__(
        self, point_cloud, *, train: bool = False, bn_momentum=0.9,
        geometry=None,
    ):
        cfg = self.config or Config()
        if self.use_color:
            l0_xyz = point_cloud[..., :3]
            l0_points = point_cloud[..., 3:6]
        else:
            l0_xyz = point_cloud[..., :3]
            l0_points = None

        xyzs = [l0_xyz]
        feats = [l0_points]
        for i, (spec, mlp) in enumerate(zip(cfg.sa_layers, SA_MLPS)):
            new_xyz, new_points, _ = SetAbstraction(
                npoint=spec.npoint,
                radius=spec.radius,
                nsample=spec.nsample,
                mlp=mlp,
                ops_impl=self.ops_impl,
                pre_project=self.pre_project,
                # SA1's inputs are the raw cloud (leaves): the grouping
                # backward can skip its scatter-add (ops.project_group_leaf).
                # input_is_leaf=False opts out for input-gradient callers.
                leaf_inputs=(i == 0) and self.input_is_leaf,
                compute_dtype=self._stage_dtype(mlp),
                bq_window=self._bq_win(i),
                name=f"sa{i + 1}",
            )(
                xyzs[-1], feats[-1], train=train, bn_momentum=bn_momentum,
                geometry=None if geometry is None else geometry["sa"][i],
            )
            xyzs.append(new_xyz)
            feats.append(new_points)

        # Feature propagation: coarse -> fine (model.py:90-129).
        for i, mlp in enumerate(FP_MLPS):
            lvl = 3 - i  # target level: 3, 2, 1, 0
            feats[lvl] = FeaturePropagation(
                mlp=mlp,
                ops_impl=self.ops_impl,
                compute_dtype=self._stage_dtype(mlp),
                fp_window=self._fp_win(i),
                name=f"fp{i + 1}",
            )(
                xyzs[lvl],
                xyzs[lvl + 1],
                feats[lvl],
                feats[lvl + 1],
                train=train,
                bn_momentum=bn_momentum,
                geometry=None if geometry is None else geometry["fp"][i],
            )

        net = nn.Dense(
            128,
            dtype=self._stage_dtype([128]),
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(feats[0])
        net = BatchNorm(name="fc1_bn")(net, train=train, momentum=bn_momentum)
        net = nn.relu(net)
        net = nn.Dropout(rate=0.5, deterministic=not train, name="dp1")(net)
        # The head keeps f32 logits (flax promotes bf16 activations against
        # the f32 kernel when dtype is None) so argmax ties break like f32.
        logits = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.xavier_uniform(), name="fc2"
        )(net)
        return logits


def _level_window(window, i: int) -> Optional[int]:
    """Per-level window width from an int (shared) or a per-level sequence.

    Sequences must have one entry per level (4 for the SSG flagship); a
    None entry keeps that level on the exact full kernel.
    """
    if window is None or isinstance(window, int):
        return window
    return window[i]


def msg_scales(spec) -> tuple:
    """The MSG dense-level grouping scales derived from an SALayerSpec.

    Single source of truth shared by PointNet2SemSegMSG and
    precompute_geometry: ((radius/2, nsample/2), (radius, nsample)).
    """
    return (
        (spec.radius / 2.0, max(spec.nsample // 2, 1)),
        (spec.radius, spec.nsample),
    )


def precompute_geometry(
    point_cloud,
    *,
    config: Optional[Config] = None,
    ops_impl: Optional[str] = None,
    bq_window: Union[int, Sequence[Optional[int]], None] = None,
    fp_window: Union[int, Sequence[Optional[int]], None] = None,
    arch: str = "ssg",
):
    """Parameter-independent neighbor structure for PointNet2SemSeg.

    FPS centroids, ball-query groups, and FP-level 3-NN depend only on the
    input coordinates — never on parameters — so a gradient-accumulation
    step can compute them ONCE at full batch width and slice per
    microbatch (``model.apply(..., geometry=...)``). One full-width kernel
    launch replaces G quarter-width launches, and full-width FPS packs all
    8 VPU sublanes where a microbatch of 4 leaves half idle
    (ops/pallas/fps.py) — at the production train config the
    per-microbatch FPS was 21.5% of the step (artifacts/train-profile-r4).

    Exactness: the geometry math is per-sample batch-independent, so the
    hoisted step is MATHEMATICALLY identical — measured: indices and
    centroids bit-identical, accum-step loss and BN batch stats
    bit-identical (tests/test_train.py hoist tests). It is not bit-exact
    to the last ulp everywhere: XLA fuses the hoisted three_nn ``dist2``
    (and the backward) differently from the inline one, so squared
    distances can differ by ~1 ulp (indices unaffected), and gradients
    carry ~1e-6-absolute reassociation noise that one Adam step amplifies
    into last-digit param differences — the same class of noise as any
    recompilation (see the accumulation oracle test's tolerance note).

    Returns ``(geometry, ok)``: ``geometry`` is a pytree of per-sample
    arrays (leading batch axis; slice it per microbatch), ``ok`` the AND of
    the calibrated-window exactness certificates (constant True when both
    windows are None). ``arch`` selects the model whose per-level geometry
    is produced: "ssg" (the reference flagship, model.py:22-148) or "msg"
    (PointNet2SemSegMSG: the two dense levels carry one ball-query index
    set PER SCALE, ``idx`` becomes a tuple).
    """
    if arch not in ("ssg", "msg"):
        raise ValueError(f"unknown arch {arch!r}, expected 'ssg'/'msg'")
    cfg = config or Config()
    xyz = point_cloud[..., :3].astype(jnp.float32)
    xyzs = [xyz]
    sa = []
    ok = jnp.ones((), bool)

    def query(cloud, centroids, radius, nsample, bq_w):
        nonlocal ok
        if bq_w is not None:
            idx, _, lvl_ok = ops.ball_query_calibrated(
                cloud, centroids, radius, nsample, bq_w, impl=ops_impl
            )
            ok = jnp.logical_and(ok, lvl_ok)
            return idx
        idx, _ = ops.ball_query(
            cloud, centroids, radius, nsample, impl=ops_impl
        )
        return idx

    for li, spec in enumerate(cfg.sa_layers):
        _, new_xyz = ops.fps_centroids(xyzs[-1], spec.npoint, impl=ops_impl)
        bq_w = _level_window(bq_window, li)
        if arch == "msg" and li < 2:  # dense levels: one idx per scale
            idx = tuple(
                query(xyzs[-1], new_xyz, r, k, bq_w)
                for r, k in msg_scales(spec)
            )
        else:
            idx = query(xyzs[-1], new_xyz, spec.radius, spec.nsample, bq_w)
        sa.append({"new_xyz": new_xyz, "idx": idx})
        xyzs.append(new_xyz)

    fp = []
    for i in range(len(FP_MLPS)):
        lvl = 3 - i  # target level: 3, 2, 1, 0 (model.py:90-129)
        fp_w = _level_window(fp_window, i)
        if fp_w is not None:
            dist2, idx, lvl_ok = ops.three_nn_calibrated(
                xyzs[lvl], xyzs[lvl + 1], fp_w, impl=ops_impl
            )
            ok = jnp.logical_and(ok, lvl_ok)
        else:
            dist2, idx = ops.three_nn(xyzs[lvl], xyzs[lvl + 1], impl=ops_impl)
        fp.append({"dist2": dist2, "idx": idx})
    return {"sa": tuple(sa), "fp": tuple(fp)}, ok


class PointNet2SemSegMSG(nn.Module):
    """Multi-scale-grouping variant of the segmentation net.

    The reference ships the MSG module (util/pointnet_util.py:219-282,
    pointnet_sa_module_msg) but its model never instantiates it; this model
    exercises it end-to-end: the two dense encoder levels group at two radii
    each (r/2 and r, half/full nsample) and concatenate per-scale features,
    the two coarse levels stay SSG, and the FP decoder adapts to the wider
    skip channels automatically.
    """

    num_classes: int = 9
    use_color: bool = True
    config: Optional[Config] = None
    ops_impl: Optional[str] = None
    compute_dtype: Optional[Any] = None
    # See PointNet2SemSeg.compute_dtype_min_width: stages whose narrowest
    # MLP width (across every grouping scale at MSG levels — the first
    # scale runs half-width MLPs) is below this stay f32.
    compute_dtype_min_width: Optional[int] = None
    # See PointNet2SemSeg.input_is_leaf: SA1's scales use the scatter-free
    # leaf-train backward; set False for input-gradient callers.
    input_is_leaf: bool = True
    # See PointNet2SemSeg.bq_window: int shared by every level (an MSG
    # level's scales share one window — calibrate for the largest radius)
    # or a per-SA-level 4-tuple.
    bq_window: Union[int, Sequence[Optional[int]], None] = None
    # See PointNet2SemSeg.fp_window (int or per-FP-level 4-tuple).
    fp_window: Union[int, Sequence[Optional[int]], None] = None

    def _stage_dtype(self, widths) -> Optional[Any]:
        if self.compute_dtype is None or self.compute_dtype_min_width is None:
            return self.compute_dtype
        return (
            self.compute_dtype
            if min(widths) >= self.compute_dtype_min_width
            else None
        )

    @nn.compact
    def __call__(
        self, point_cloud, *, train: bool = False, bn_momentum=0.9,
        geometry=None,
    ):
        cfg = self.config or Config()
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:6] if self.use_color else None

        xyzs = [l0_xyz]
        feats = [l0_points]
        for i, (spec, mlp) in enumerate(zip(cfg.sa_layers, SA_MLPS)):
            geom_i = None if geometry is None else geometry["sa"][i]
            if i < 2:  # dense levels: two grouping scales (msg_scales)
                half = [c // 2 for c in mlp]
                scales = msg_scales(spec)
                new_xyz, new_points = SetAbstractionMSG(
                    npoint=spec.npoint,
                    radius_list=tuple(r for r, _ in scales),
                    nsample_list=tuple(k for _, k in scales),
                    mlp_list=(half, mlp),
                    ops_impl=self.ops_impl,
                    compute_dtype=self._stage_dtype(half + mlp),
                    leaf_inputs=(i == 0) and self.input_is_leaf,
                    bq_window=_level_window(self.bq_window, i),
                    name=f"sa{i + 1}",
                )(
                    xyzs[-1], feats[-1], train=train,
                    bn_momentum=bn_momentum, geometry=geom_i,
                )
            else:
                new_xyz, new_points, _ = SetAbstraction(
                    npoint=spec.npoint,
                    radius=spec.radius,
                    nsample=spec.nsample,
                    mlp=mlp,
                    ops_impl=self.ops_impl,
                    compute_dtype=self._stage_dtype(mlp),
                    bq_window=_level_window(self.bq_window, i),
                    name=f"sa{i + 1}",
                )(
                    xyzs[-1], feats[-1], train=train,
                    bn_momentum=bn_momentum, geometry=geom_i,
                )
            xyzs.append(new_xyz)
            feats.append(new_points)

        for i, mlp in enumerate(FP_MLPS):
            lvl = 3 - i
            feats[lvl] = FeaturePropagation(
                mlp=mlp,
                ops_impl=self.ops_impl,
                compute_dtype=self._stage_dtype(mlp),
                fp_window=_level_window(self.fp_window, i),
                name=f"fp{i + 1}",
            )(
                xyzs[lvl],
                xyzs[lvl + 1],
                feats[lvl],
                feats[lvl + 1],
                train=train,
                bn_momentum=bn_momentum,
                geometry=None if geometry is None else geometry["fp"][i],
            )

        net = nn.Dense(
            128,
            dtype=self._stage_dtype([128]),
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(feats[0])
        net = BatchNorm(name="fc1_bn")(net, train=train, momentum=bn_momentum)
        net = nn.relu(net)
        net = nn.Dropout(rate=0.5, deterministic=not train, name="dp1")(net)
        return nn.Dense(
            self.num_classes, kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )(net)


def weighted_ce_sum(logits, labels, weights):
    """Unnormalized weighted CE: (sum of ce*w, number of nonzero weights).

    The two accumulands of TF's SUM_BY_NONZERO_WEIGHTS reduction, exposed
    separately so gradient accumulation can sum them across microbatches
    and normalize once globally (exactly the whole-batch loss).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # One-hot multiply instead of take_along_axis: bit-identical values
    # (the non-label terms are exactly 0.0 and log_softmax of finite logits
    # is finite), but the backward is a dense multiply instead of a scatter
    # of (B*N) rows into the logits — the scatter measured 1.7 ms/step on
    # TPU (train-profile round 3).
    onehot = jax.nn.one_hot(
        labels.astype(jnp.int32), logits.shape[-1], dtype=jnp.float32
    )
    ce = -jnp.sum(logp * onehot, axis=-1)
    w = weights.astype(jnp.float32)
    return jnp.sum(ce * w), jnp.sum(w != 0.0).astype(jnp.float32)


def weighted_ce_loss(logits, labels, weights):
    """Weighted sparse softmax cross entropy.

    Matches tf.losses.sparse_softmax_cross_entropy(labels, logits, weights)
    as called in model.py:156-158: per-point CE scaled by the point weight,
    summed, divided by the number of non-zero weights
    (tf.losses.Reduction.SUM_BY_NONZERO_WEIGHTS).
    """
    total, num_nonzero = weighted_ce_sum(logits, labels, weights)
    return total / jnp.maximum(num_nonzero, 1.0)
