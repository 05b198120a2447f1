"""Run the reference TF model code as a parity oracle.

This imports the *actual* reference network-assembly code
(/root/reference/model.py + util/{tf_util,pointnet_util}.py) under TF2's
compat.v1 with two shims:

1. ``tf.contrib`` — a minimal shim providing ``layers.batch_norm`` (exact
   contrib semantics: biased batch variance, eps 1e-3, moving-stat EMA
   ``moving = moving*decay + batch*(1-decay)``, in-place updates, scope-named
   beta/gamma/moving_mean/moving_variance variables) and
   ``layers.xavier_initializer`` (glorot uniform), the only two contrib
   symbols the reference uses (util/tf_util.py:44, :572-582).
2. ``tf_ops.*`` — the reference's CUDA/Open3D custom ops are replaced by
   this repo's NumPy oracles (pointnet2_tpu/ops/reference.py) via
   ``tf.py_func`` for the index-producing ops (FPS, ball query, 3-NN — all
   ``NoGradient`` in the reference) and by pure differentiable TF gathers for
   GatherPoint/GroupPoint/ThreeInterpolate (whose hand-written CUDA gradients
   are exactly TF's native scatter-add for gather).

No reference code is copied; the reference modules are imported read-only at
runtime to serve as a test oracle. The resulting graph has the *authentic*
reference variable names and shapes (layer1/conv0/weights,
layer1/conv0/bn/gamma, fa_layer1/conv_0/..., fc1, fc2), so checkpoints saved
from it exercise the real TF-checkpoint -> flax converter
(pointnet2_tpu/convert.py) exactly as a trained reference checkpoint would.

Requires tensorflow (CPU is fine). Guarded imports: callers should skip when
TF or /root/reference is unavailable.
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np

REFERENCE_ROOT = os.environ.get("PN2_REFERENCE_ROOT", "/root/reference")

_REF_CACHE: dict | None = None


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_ROOT, "model.py"))


def _tf1():
    import tensorflow as tf

    tf1 = tf.compat.v1
    tf1.disable_v2_behavior()
    return tf1


def _make_contrib_shim(tf1) -> types.SimpleNamespace:
    """tf.contrib shim: layers.batch_norm + layers.xavier_initializer."""

    def xavier_initializer(*a, **kw):
        return tf1.glorot_uniform_initializer()

    def batch_norm(
        inputs,
        center=True,
        scale=True,
        is_training=None,
        decay=0.9,
        updates_collections=None,
        scope=None,
        data_format="NHWC",
        epsilon=1e-3,
    ):
        assert data_format == "NHWC", "shim only supports NHWC"
        assert updates_collections is None, "shim only supports in-place updates"
        with tf1.variable_scope(scope, default_name="BatchNorm"):
            c = int(inputs.shape[-1])
            beta = tf1.get_variable(
                "beta", [c], initializer=tf1.zeros_initializer()
            )
            gamma = tf1.get_variable(
                "gamma", [c], initializer=tf1.ones_initializer()
            )
            moving_mean = tf1.get_variable(
                "moving_mean",
                [c],
                initializer=tf1.zeros_initializer(),
                trainable=False,
            )
            moving_var = tf1.get_variable(
                "moving_variance",
                [c],
                initializer=tf1.ones_initializer(),
                trainable=False,
            )
            axes = list(range(inputs.shape.ndims - 1))
            batch_mean, batch_var = tf1.nn.moments(inputs, axes)
            decay_t = tf1.cast(
                tf1.convert_to_tensor(decay if decay is not None else 0.9),
                tf1.float32,
            )

            def train_branch():
                upd_m = tf1.assign(
                    moving_mean,
                    moving_mean * decay_t + batch_mean * (1.0 - decay_t),
                )
                upd_v = tf1.assign(
                    moving_var, moving_var * decay_t + batch_var * (1.0 - decay_t)
                )
                with tf1.control_dependencies([upd_m, upd_v]):
                    return tf1.identity(batch_mean), tf1.identity(batch_var)

            def eval_branch():
                return moving_mean.read_value(), moving_var.read_value()

            if isinstance(is_training, bool):
                mean, var = train_branch() if is_training else eval_branch()
            else:
                mean, var = tf1.cond(is_training, train_branch, eval_branch)
            return tf1.nn.batch_normalization(
                inputs, mean, var, beta, gamma, epsilon
            )

    layers = types.SimpleNamespace(
        batch_norm=batch_norm,
        xavier_initializer=xavier_initializer,
        xavier_initializer_conv2d=xavier_initializer,
    )
    return types.SimpleNamespace(layers=layers)


def _make_tf_ops_modules(tf1) -> dict[str, types.ModuleType]:
    """Fake tf_ops.* modules: NumPy oracles for index ops, TF for gathers."""
    from pointnet2_tpu.ops import reference as oracle
    from pointnet2_tpu.utils import colors as color_util

    sampling = types.ModuleType("tf_ops.tf_sampling")
    grouping = types.ModuleType("tf_ops.tf_grouping")
    interpolate = types.ModuleType("tf_ops.tf_interpolate")

    def farthest_point_sample(npoint, inp):
        out = tf1.py_func(
            lambda x: oracle.farthest_point_sample_np(x, npoint),
            [inp],
            tf1.int32,
        )
        out.set_shape([inp.shape[0], npoint])
        return out

    def gather_point(inp, idx):
        return tf1.gather(inp, idx, batch_dims=1)

    def prob_sample(inp, inpr):
        out = tf1.py_func(oracle.prob_sample_np, [inp, inpr], tf1.int32)
        out.set_shape(inpr.shape)
        return out

    def query_ball_point(radius, nsample, xyz1, xyz2):
        idx, cnt = tf1.py_func(
            lambda a, b: oracle.ball_query_np(a, b, radius, nsample),
            [xyz1, xyz2],
            [tf1.int32, tf1.int32],
        )
        idx.set_shape([xyz2.shape[0], xyz2.shape[1], nsample])
        cnt.set_shape([xyz2.shape[0], xyz2.shape[1]])
        return idx, cnt

    def group_point(points, idx):
        return tf1.gather(points, idx, batch_dims=1)

    def knn_point(k, xyz1, xyz2):
        d2 = tf1.reduce_sum(
            tf1.squared_difference(
                tf1.expand_dims(xyz2, 2), tf1.expand_dims(xyz1, 1)
            ),
            axis=-1,
        )
        neg, idx = tf1.nn.top_k(-d2, k=k)
        return -neg, idx

    def select_top_k(k, dist):
        n = int(dist.shape[-1])
        neg, idx = tf1.nn.top_k(-dist, k=n)
        return idx, -neg

    def three_nn(xyz1, xyz2):
        d2, idx = tf1.py_func(
            oracle.three_nn_np, [xyz1, xyz2], [tf1.float32, tf1.int32]
        )
        d2.set_shape([xyz1.shape[0], xyz1.shape[1], 3])
        idx.set_shape([xyz1.shape[0], xyz1.shape[1], 3])
        return d2, idx

    def three_interpolate(points, idx, weight):
        gathered = tf1.gather(points, idx, batch_dims=1)  # (B, N, 3, C)
        return tf1.reduce_sum(gathered * tf1.expand_dims(weight, -1), axis=2)

    def interpolate_label_with_color(sparse_points, sparse_labels, dense_points, knn):
        def _run(sp, sl, dp):
            labels = oracle.densify_labels_np(sp, sl.astype(np.int32), dp, k=int(knn))
            cols = color_util.label_to_colors(labels).astype(np.float32)
            return labels.astype(np.int32), cols

        labels, cols = tf1.py_func(
            _run, [sparse_points, sparse_labels, dense_points], [tf1.int32, tf1.float32]
        )
        labels.set_shape([dense_points.shape[0]])
        cols.set_shape([dense_points.shape[0], 3])
        return labels, cols

    sampling.farthest_point_sample = farthest_point_sample
    sampling.gather_point = gather_point
    sampling.prob_sample = prob_sample
    grouping.query_ball_point = query_ball_point
    grouping.group_point = group_point
    grouping.knn_point = knn_point
    grouping.select_top_k = select_top_k
    interpolate.three_nn = three_nn
    interpolate.three_interpolate = three_interpolate
    interpolate.interpolate_label_with_color = interpolate_label_with_color

    pkg = types.ModuleType("tf_ops")
    pkg.tf_sampling = sampling
    pkg.tf_grouping = grouping
    pkg.tf_interpolate = interpolate
    return {
        "tf_ops": pkg,
        "tf_ops.tf_sampling": sampling,
        "tf_ops.tf_grouping": grouping,
        "tf_ops.tf_interpolate": interpolate,
    }


class _TFProxy(types.ModuleType):
    """A 'tensorflow' module whose attributes come from tf.compat.v1 plus
    a .contrib shim — what the reference code expects to import."""

    def __init__(self, tf1, contrib):
        super().__init__("tensorflow")
        object.__setattr__(self, "_tf1", tf1)
        object.__setattr__(self, "contrib", contrib)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_tf1"), name)


def load_reference_modules():
    """Import reference model/util modules under the shims (cached)."""
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    tf1 = _tf1()
    proxy = _TFProxy(tf1, _make_contrib_shim(tf1))
    fakes = _make_tf_ops_modules(tf1)

    saved = {}
    names = ["tensorflow", "util", "util.tf_util", "util.pointnet_util", "model"]
    names += list(fakes)
    for name in names:
        saved[name] = sys.modules.pop(name, None)
    sys.modules["tensorflow"] = proxy
    sys.modules.update(fakes)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import model as ref_model  # noqa: F401  (reference /root/reference/model.py)
        import util.pointnet_util as ref_pointnet_util
        import util.tf_util as ref_tf_util

        _REF_CACHE = {
            "tf1": tf1,
            "model": ref_model,
            "pointnet_util": ref_pointnet_util,
            "tf_util": ref_tf_util,
        }
        return _REF_CACHE
    finally:
        sys.path.remove(REFERENCE_ROOT)
        for name in names:
            mod = saved[name]
            if name in ("model", "util", "util.tf_util", "util.pointnet_util"):
                # Keep the imported reference modules private to the cache:
                # restore whatever (usually nothing) was there before, so the
                # names 'model'/'util' stay free for this repo's own imports.
                sys.modules.pop(name, None)
            if mod is not None:
                sys.modules[name] = mod
            elif name == "tensorflow":
                sys.modules.pop(name, None)


class ReferenceModel:
    """The reference network graph with authentic variable names.

    Builds /root/reference/model.py:get_model on a fixed (batch, num_point)
    placeholder pair and owns a session. All ops run on CPU; the neighbor ops
    are NumPy oracles, so indices agree exactly with pointnet2_tpu's ops.
    """

    def __init__(self, hyper: dict, num_point: int, batch: int, num_classes: int = 9,
                 seed: int = 0):
        ref = load_reference_modules()
        tf1 = ref["tf1"]
        self.tf1 = tf1
        self.graph = tf1.Graph()
        dim = 3 + 3 * int(hyper["use_color"])
        with self.graph.as_default():
            tf1.set_random_seed(seed)
            self.pointclouds = tf1.placeholder(
                tf1.float32, (batch, num_point, dim), name="pointclouds"
            )
            self.labels = tf1.placeholder(tf1.int32, (batch, num_point), name="labels")
            self.smpws = tf1.placeholder(
                tf1.float32, (batch, num_point), name="smpws"
            )
            self.is_training = tf1.placeholder(tf1.bool, (), name="is_training")
            self.bn_decay = tf1.placeholder_with_default(
                tf1.constant(0.9, tf1.float32), (), name="bn_decay"
            )
            self.logits, self.end_points = ref["model"].get_model(
                self.pointclouds,
                self.is_training,
                num_classes,
                hyper,
                bn_decay=self.bn_decay,
            )
            self.loss = ref["model"].get_loss(
                self.logits, self.labels, self.smpws, self.end_points
            )
            self.trainables = tf1.trainable_variables()
            self.grads = tf1.gradients(self.loss, self.trainables)
            self.saver = tf1.train.Saver()
            init = tf1.global_variables_initializer()
        self.sess = tf1.Session(graph=self.graph)
        self.sess.run(init)

    def run_logits(self, points: np.ndarray, training: bool = False) -> np.ndarray:
        return self.sess.run(
            self.logits,
            {self.pointclouds: points, self.is_training: training},
        )

    def run_loss(self, points, labels, smpws, training: bool = False) -> float:
        return float(
            self.sess.run(
                self.loss,
                {
                    self.pointclouds: points,
                    self.labels: labels,
                    self.smpws: smpws,
                    self.is_training: training,
                },
            )
        )

    def run_grads(self, points, labels, smpws, training: bool = False):
        """Returns {var_name: gradient array} for all trainable variables."""
        vals = self.sess.run(
            self.grads,
            {
                self.pointclouds: points,
                self.labels: labels,
                self.smpws: smpws,
                self.is_training: training,
            },
        )
        return {v.op.name: g for v, g in zip(self.trainables, vals)}

    def var_dict(self) -> dict[str, np.ndarray]:
        with self.graph.as_default():
            gvars = self.tf1.global_variables()
        vals = self.sess.run(gvars)
        return {v.op.name: val for v, val in zip(gvars, vals)}

    def save(self, path: str) -> str:
        return self.saver.save(self.sess, path)

    def restore(self, path: str) -> None:
        self.saver.restore(self.sess, path)

    def load_var_dict(self, values: dict[str, np.ndarray]) -> None:
        """Assign {reference_var_name: array} into the live graph (e.g. the
        output of pointnet2_tpu.convert.flax_to_tf_vars)."""
        with self.graph.as_default():
            gvars = {v.op.name: v for v in self.tf1.global_variables()}
        missing = set(gvars) - set(values)
        extra = set(values) - set(gvars)
        if missing or extra:
            raise ValueError(f"variable mismatch: missing={missing} extra={extra}")
        for name, var in gvars.items():
            var.load(np.asarray(values[name]).reshape(var.shape), self.sess)

    def close(self):
        self.sess.close()
