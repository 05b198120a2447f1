"""Jitted training/eval steps, schedules, and orbax checkpointing.

TPU-first replacement for the reference train loop (train.py:333-465):
- one fused XLA program per step: forward, weighted CE loss
  (model.py:152-161), backward, Adam/momentum update, BN moving-stat update,
  device-side confusion matrix (replacing the O(B*N) Python loop at
  train.py:249-251);
- staircase exponential LR with a 1e-5 floor (train.py:80-98) and the BN
  momentum schedule (train.py:101-119) evaluated in-graph from the step
  counter;
- batch donated, parameters replicated, batch sharded over the data mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from pointnet2_tpu.config import Config
from pointnet2_tpu.models import (
    PointNet2SemSeg,
    precompute_geometry,
    weighted_ce_loss,
    weighted_ce_sum,
)
from pointnet2_tpu.utils.metrics import confusion_matrix_jax


def learning_rate_schedule(cfg: Config):
    """Staircase exponential decay with floor (train.py:80-98)."""

    def schedule(step):
        exponent = jnp.floor(
            step.astype(jnp.float32) * cfg.batch_size / cfg.decay_step
        )
        lr = cfg.learning_rate * jnp.power(cfg.learning_rate_decay_rate, exponent)
        return jnp.maximum(lr, 1e-5)

    return schedule


def bn_momentum_schedule(cfg: Config):
    """BN EMA coefficient schedule (train.py:101-119).

    Returns the *decay* passed to batch_norm: min(clip, 1 - momentum_decayed).
    """

    def schedule(step):
        exponent = jnp.floor(
            jnp.asarray(step, jnp.float32) * cfg.batch_size / cfg.decay_step
        )
        bn_momentum = cfg.bn_init_decay * jnp.power(
            cfg.bn_decay_decay_rate, exponent
        )
        return jnp.minimum(cfg.bn_decay_clip, 1.0 - bn_momentum)

    return schedule


def _diag_ok(diag) -> jnp.ndarray:
    """AND-reduce every sown window certificate to one bool scalar.

    ``diag`` is the mutated "diagnostics" collection: each calibrated op
    (ops.ball_query_calibrated / ops.three_nn_calibrated) sows one `ok`
    certificate per level; True for all of them means every windowed op's
    outputs this step were bit-identical to the exact kernels'.
    """
    flags = jax.tree.leaves(diag)
    if not flags:
        return jnp.ones((), jnp.bool_)
    return jnp.all(jnp.stack([jnp.all(f) for f in flags]))


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class Trainer:
    """Owns the model, optimizer, and compiled train/eval steps."""

    cfg: Config
    num_classes: int = 9
    # Model architecture: "ssg" (the reference flagship, model.py:22-148)
    # or "msg" (multi-scale grouping — the reference ships the MSG module,
    # util/pointnet_util.py:219-282, but never trains it; here it is a
    # first-class end-to-end choice: train.py/predict.py --arch msg).
    # Geometry hoisting works for both (precompute_geometry(arch=...)
    # emits per-scale index sets for MSG's dense levels).
    arch: str = "ssg"
    ops_impl: Optional[str] = None
    # Inference forwards run the batch in chunks of this size via lax.map:
    # the grouped tensors' HBM working set stays at the small-batch size,
    # which measures ~29% faster at batch 64 and 2.3x at batch 128 than the
    # monolithic forward (tools/batch_chunk_bench.py, PERFORMANCE.md). Exactly
    # equivalent math — eval-mode BN uses moving stats, so per-chunk results
    # are independent.
    infer_chunk: int = 8
    # Gradient accumulation: split each train batch into this many
    # microbatches, scan over them accumulating gradients, and apply ONE
    # optimizer update. Gradient math is exact vs the monolithic step for
    # fixed activations: the loss is sum(ce*w)/num_nonzero over the WHOLE
    # batch (TF's SUM_BY_NONZERO_WEIGHTS, model.py:152-161), so we
    # accumulate unnormalized gradient sums and divide by the global
    # nonzero count once. BatchNorm uses per-microbatch moments (ghost BN)
    # and its EMA advances once per microbatch — the one intentional
    # semantic difference, documented in PERFORMANCE.md. Like infer_chunk,
    # this keeps the grouped tensors' HBM working set at the microbatch
    # size, which is what makes large-batch training fast.
    accum_steps: int = 1
    # Inference computation dtype: "float32" (parity default) or
    # "bfloat16" (production mode: MLP activations + interpolation matmul
    # in bf16; geometry ops and logits stay f32; same f32 checkpoints).
    # Accuracy delta measured in PERFORMANCE.md.
    infer_dtype: str = "float32"
    # Training computation dtype: "float32" (parity default) or "bfloat16"
    # (mixed precision, the standard TPU training configuration the
    # reference has no equivalent of): SharedMLP/Dense matmuls and
    # activations run in bf16 while everything numerically fragile stays
    # f32 — master weights and Adam moments (flax param_dtype), BatchNorm
    # batch moments and EMA stats (nn/layers.py casts to f32 in-layer),
    # geometry ops (fps/ball query/3-NN consume raw f32 xyz), logits (the
    # head's final Dense promotes to f32), and the CE loss. Gradients are
    # f32 pytrees (the forward casts params bf16 at use; the cast's
    # cotangent accumulates in f32). Convergence vs f32 and step time are
    # measured in PERFORMANCE.md (tools/bf16_train_soak.py artifact).
    train_dtype: str = "float32"
    # SELECTIVE mixed precision threshold (models.PointNet2SemSeg
    # .compute_dtype_min_width): with a bfloat16 infer/train dtype, stages
    # whose narrowest MLP width is below this stay f32. 128 keeps the
    # narrow SA1/SA2 encoders f32 — the convergence-vs-throughput middle
    # ground measured in PERFORMANCE.md "Round 5: selective bf16".
    # None = uniform dtype (the round-4 behavior). Requires at least one
    # of infer_dtype/train_dtype to be bfloat16.
    bf16_min_width: Optional[int] = None
    # With accum_steps=G the BN EMA advances G times per optimizer step, so
    # the effective per-step decay is momentum**G — faster moving-stat
    # adaptation than the reference's bn_decay calibration as G grows.
    # True rescales the per-microbatch coefficient to momentum**(1/G) so
    # the per-OPTIMIZER-STEP decay matches the schedule exactly (for equal
    # microbatch moments the stats match the monolithic step bit-for-bit).
    # Default False keeps the documented ghost-BN semantics that round-2
    # soaks and the accumulation oracle test pin down.
    bn_accum_rescale: bool = False
    # Calibrated ball-query x-window (PointNet2SemSeg.bq_window): the
    # production fast path for the SA1 radius search. None (default) keeps
    # the exact full kernel. When set, every train step additionally
    # reports a "window_ok" metric (the AND of all sown certificates for
    # THAT batch — zero extra device cost, the kernels compute it anyway;
    # train.py ANDs it across each epoch's train AND eval batches and
    # aborts on failure), eval_step reports the same metric,
    # predict_step_checked returns (labels, ok) for inference CLIs, and
    # check_bq_window verifies a fresh batch on demand (bench.py gates its
    # production config on it). Calibrate with tools/bq_window_calibrate.py.
    # Int (one width shared by every level) or a per-SA-level 4-sequence of
    # Optional[int] (PointNet2SemSeg.bq_window).
    bq_window: Union[int, Sequence[Optional[int]], None] = None
    # Calibrated 3-NN x-window for the FP decoder levels
    # (PointNet2SemSeg.fp_window): same contract and verification path as
    # bq_window (check_bq_window collects BOTH certificates). Int or
    # per-FP-level 4-sequence.
    fp_window: Union[int, Sequence[Optional[int]], None] = None
    # With accum_steps > 1: compute the parameter-independent neighbor
    # structure (FPS/ball query/3-NN — models.precompute_geometry) ONCE at
    # full batch width before the microbatch scan instead of once per
    # microbatch: one full-width kernel launch per op instead of G
    # quarter-width ones, restoring the 8-sublane FPS occupancy narrow
    # microbatches waste (per-microbatch FPS was 21.5% of the r4
    # production step). Mathematically identical — loss and BN moments
    # measure bit-identical; gradients pick up ~1e-6 XLA-fusion
    # reassociation noise (see models.precompute_geometry's exactness
    # note). Measured in PERFORMANCE.md "Round 5: geometry hoisting"
    # (artifacts/hoist-matrix-r5.txt): f32 accum-4 +window 21.4 -> 20.3 ms
    # (6.45 M pts/s, 10.1x the measured train baseline without bf16).
    hoist_geometry: bool = True

    def __post_init__(self):
        # Per-level window sequences normalize to tuples (hashable for the
        # flax module / jit static args); ints and None pass through.
        # Anything else — notably the CLI sentinel string "auto", which the
        # CLIs must resolve via ops.calibrate BEFORE constructing a Trainer —
        # fails fast here instead of deep inside a kernel.
        def norm_window(name, w):
            if w is None or isinstance(w, int):
                return w
            if isinstance(w, (list, tuple)) and all(
                lvl is None or isinstance(lvl, int) for lvl in w
            ):
                return tuple(w)
            raise TypeError(
                f"{name} must be an int, None, or a sequence of int/None "
                f"(got {w!r}); 'auto' is a CLI-level mode — resolve it with "
                "pointnet2_tpu.ops.calibrate.calibrate_model_windows first"
            )

        self.bq_window = norm_window("bq_window", self.bq_window)
        self.fp_window = norm_window("fp_window", self.fp_window)
        if self.arch == "ssg":
            self.model = PointNet2SemSeg(
                num_classes=self.num_classes,
                use_color=bool(self.cfg.use_color),
                config=self.cfg,
                ops_impl=self.ops_impl,
                bq_window=self.bq_window,
                fp_window=self.fp_window,
            )
        elif self.arch == "msg":
            from pointnet2_tpu.models import PointNet2SemSegMSG

            self.model = PointNet2SemSegMSG(
                num_classes=self.num_classes,
                use_color=bool(self.cfg.use_color),
                config=self.cfg,
                ops_impl=self.ops_impl,
                bq_window=self.bq_window,
                fp_window=self.fp_window,
            )
        else:
            raise ValueError(
                f"unknown arch {self.arch!r}, expected 'ssg'/'msg'"
            )
        def bf16_clone():
            return self.model.clone(
                compute_dtype=jnp.bfloat16,
                compute_dtype_min_width=self.bf16_min_width,
            )

        if self.infer_dtype in ("bfloat16", "bf16"):
            self.infer_model = bf16_clone()
        elif self.infer_dtype in ("float32", "f32"):
            self.infer_model = self.model
        else:
            raise ValueError(
                f"unknown infer_dtype {self.infer_dtype!r}, "
                "expected 'float32'/'bfloat16'"
            )
        if self.train_dtype in ("bfloat16", "bf16"):
            self.train_model = bf16_clone()
        elif self.train_dtype in ("float32", "f32"):
            self.train_model = self.model
        else:
            raise ValueError(
                f"unknown train_dtype {self.train_dtype!r}, "
                "expected 'float32'/'bfloat16'"
            )
        if self.bf16_min_width is not None and (
            self.infer_model is self.model and self.train_model is self.model
        ):
            raise ValueError(
                "bf16_min_width is set but neither infer_dtype nor "
                "train_dtype is bfloat16 — it would silently do nothing"
            )
        if self.accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {self.accum_steps}")
        if self.accum_steps > 1 and self.cfg.batch_size % self.accum_steps:
            raise ValueError(
                f"accum_steps={self.accum_steps} must divide "
                f"cfg.batch_size={self.cfg.batch_size}"
            )
        self.lr_schedule = learning_rate_schedule(self.cfg)
        self.bn_schedule = bn_momentum_schedule(self.cfg)
        if self.cfg.optimizer == "momentum":
            self.tx = optax.sgd(self.lr_schedule, momentum=self.cfg.momentum)
        elif self.cfg.optimizer == "adam":
            self.tx = optax.adam(self.lr_schedule)
        else:
            raise ValueError(f"unknown optimizer {self.cfg.optimizer!r}")
        # Collect the sown window certificates in the train step only when a
        # window is actually set: the mutable list changes the traced
        # program, and the default path should stay byte-identical.
        self._windows_on = (
            self.bq_window is not None or self.fp_window is not None
        )
        self._mutable = (
            ["batch_stats", "diagnostics"] if self._windows_on
            else ["batch_stats"]
        )
        # jit per-instance closures (Trainer itself is not hashable).
        self.train_step = jax.jit(self._train_step, donate_argnums=0)
        self.eval_step = jax.jit(self._eval_step)
        self.predict_step = jax.jit(self._predict_step)
        self.predict_step_checked = jax.jit(self._predict_step_checked)

    # -- state ------------------------------------------------------------

    def init_state(self, rng: jax.Array) -> TrainState:
        dummy = jnp.zeros(
            (1, self.cfg.num_point, self.cfg.point_dim), jnp.float32
        )
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            dummy,
            train=False,
            bn_momentum=0.9,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    # -- steps ------------------------------------------------------------

    def _train_step(self, state: TrainState, batch: dict, dropout_rng: jax.Array):
        """One optimizer step. batch: points (B,N,D), labels (B,N), weights (B,N)."""
        bn_momentum = self.bn_schedule(state.step)
        rng = jax.random.fold_in(dropout_rng, state.step)
        if self.accum_steps > 1:
            if batch["points"].shape[0] % self.accum_steps:
                raise ValueError(
                    f"accum_steps={self.accum_steps} must divide the batch "
                    f"size (got batch of {batch['points'].shape[0]}); the "
                    "silent monolithic fallback would reintroduce the "
                    "large-batch HBM working set (PERFORMANCE.md)"
                )
            return self._train_step_accum(state, batch, rng, bn_momentum)

        def loss_fn(params):
            logits, mutated = self.train_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                bn_momentum=bn_momentum,
                rngs={"dropout": rng},
                mutable=self._mutable,
            )
            loss = weighted_ce_loss(logits, batch["labels"], batch["weights"])
            return loss, (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_stats = mutated["batch_stats"]
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "accuracy": jnp.mean((preds == batch["labels"]).astype(jnp.float32)),
            "confusion": confusion_matrix_jax(
                batch["labels"], preds, self.num_classes
            ),
            "learning_rate": self.lr_schedule(state.step),
            "bn_decay": bn_momentum,
        }
        if self._windows_on:
            # Per-batch exactness certificate for the calibrated windows —
            # the kernels compute `ok` regardless, so surfacing it is free.
            metrics["window_ok"] = _diag_ok(mutated.get("diagnostics", {}))
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    def _train_step_accum(self, state, batch: dict, rng, bn_momentum):
        """Gradient-accumulated optimizer step (see ``accum_steps``).

        Scans over ``accum_steps`` microbatches, summing unnormalized
        gradients and the global nonzero-weight count; one normalization +
        optimizer update at the end reproduces the whole-batch
        SUM_BY_NONZERO_WEIGHTS loss exactly. Microbatches are strided
        (``batch[j::accum_steps]``) so a batch sharded over a device mesh
        keeps every device busy in every microbatch.
        """
        g = self.accum_steps
        b, n = batch["labels"].shape
        micro = b // g
        if self.bn_accum_rescale:
            # momentum**(1/G) per microbatch => momentum per optimizer step.
            bn_momentum = jnp.power(bn_momentum, 1.0 / g)

        def to_micro(x):
            # sample i -> (microbatch i % g, slot i // g): strided split.
            return jnp.moveaxis(x.reshape(micro, g, *x.shape[1:]), 1, 0)

        xs = {"batch": {k: to_micro(v) for k, v in batch.items()}}
        geom_ok = jnp.ones((), jnp.bool_)
        if self.hoist_geometry:
            # Neighbor structure is parameter-independent: compute it ONCE
            # at full batch width (full FPS sublane occupancy) and feed the
            # per-microbatch slices through the scan. Mathematically
            # identical to the in-forward ops per sample (ulp caveat on
            # precompute_geometry); the window certificates (when windows
            # are on) come from the hoisted ops instead of sows.
            geom, geom_ok = precompute_geometry(
                batch["points"],
                config=self.cfg,
                ops_impl=self.ops_impl,
                bq_window=self.bq_window,
                fp_window=self.fp_window,
                arch=self.arch,
            )
            xs["geom"] = jax.tree.map(to_micro, geom)

        def loss_fn(params, stats, pts, labels, weights, mrng, geometry):
            logits, mutated = self.train_model.apply(
                {"params": params, "batch_stats": stats},
                pts,
                train=True,
                bn_momentum=bn_momentum,
                rngs={"dropout": mrng},
                mutable=self._mutable,
                geometry=geometry,
            )
            ce_sum, nonzero = weighted_ce_sum(logits, labels, weights)
            return ce_sum, (logits, nonzero, mutated)

        def micro_step(carry, inputs):
            stats, grad_sum, ce_sum, nz_sum, conf, correct, wok, j = carry
            mb = inputs["batch"]
            mrng = jax.random.fold_in(rng, j)
            (ce, (logits, nonzero, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, mb["points"], mb["labels"],
              mb["weights"], mrng, inputs.get("geom"))
            preds = jnp.argmax(logits, axis=-1)
            carry = (
                mutated["batch_stats"],
                jax.tree.map(jnp.add, grad_sum, grads),
                ce_sum + ce,
                nz_sum + nonzero,
                conf + confusion_matrix_jax(
                    mb["labels"], preds, self.num_classes
                ),
                correct
                + jnp.sum((preds == mb["labels"]).astype(jnp.float32)),
                jnp.logical_and(wok, _diag_ok(mutated.get("diagnostics", {}))),
                j + 1,
            )
            return carry, None

        init = (
            state.batch_stats,
            jax.tree.map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((self.num_classes, self.num_classes), jnp.int32),
            jnp.zeros((), jnp.float32),
            geom_ok,
            jnp.zeros((), jnp.int32),
        )
        (
            new_stats, grad_sum, ce_sum, nz_sum, conf, correct, wok, _
        ), _ = jax.lax.scan(micro_step, init, xs)

        denom = jnp.maximum(nz_sum, 1.0)
        grads = jax.tree.map(lambda x: x / denom, grad_sum)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": ce_sum / denom,
            "accuracy": correct / float(b * n),
            "confusion": conf,
            "learning_rate": self.lr_schedule(state.step),
            "bn_decay": bn_momentum,
        }
        if self._windows_on:
            metrics["window_ok"] = wok
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    def _infer_logits_ok(self, state: TrainState, points: jax.Array):
        """Eval-mode forward, batch-chunked for HBM locality (see infer_chunk).

        Returns ``(logits, ok)``: ``ok`` is the AND of every sown window
        certificate across all chunks (constant True when no window is set —
        XLA prunes it when the caller drops it).
        """
        params, batch_stats = state.params, state.batch_stats
        if self.infer_model is not self.model:
            # bf16 mode: fold eval BN into the linear layers in f32 so the
            # bf16 rounding lands on normalized activations (see nn/fold.py
            # for the measured conditioning argument). Tree-level math,
            # negligible next to the forward; runs inside the jit.
            from pointnet2_tpu.nn.fold import fold_batch_norm

            params, batch_stats = fold_batch_norm(params, batch_stats)

        def forward(x):
            if self._windows_on:
                logits, diag = self.infer_model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x,
                    train=False,
                    bn_momentum=0.9,
                    mutable=["diagnostics"],
                )
                return logits, _diag_ok(diag.get("diagnostics", {}))
            logits = self.infer_model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=False,
                bn_momentum=0.9,
            )
            return logits, jnp.ones((), jnp.bool_)

        b = points.shape[0]
        chunk = self.infer_chunk
        if chunk and 0 < chunk < b and b % chunk == 0:
            xs = points.reshape(b // chunk, chunk, *points.shape[1:])
            logits, oks = jax.lax.map(forward, xs)
            return logits.reshape(b, points.shape[1], -1), jnp.all(oks)
        return forward(points)

    def _infer_logits(self, state: TrainState, points: jax.Array) -> jax.Array:
        return self._infer_logits_ok(state, points)[0]

    def _eval_step(self, state: TrainState, batch: dict):
        logits, ok = self._infer_logits_ok(state, batch["points"])
        # NOTE: on validation batches produced by SemanticDataset this loss
        # is identically 0 — the reference's non-train splits carry all-zero
        # label weights (dataset/semantic_dataset.py:284-285, preserved in
        # data/semantic3d.py), so SUM_BY_NONZERO_WEIGHTS has nothing to sum.
        # It is returned for callers that feed real weights (tests, custom
        # eval sets); train.py deliberately logs only eval accuracy/mIoU.
        loss = weighted_ce_loss(logits, batch["labels"], batch["weights"])
        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "accuracy": jnp.mean((preds == batch["labels"]).astype(jnp.float32)),
            "confusion": confusion_matrix_jax(
                batch["labels"], preds, self.num_classes
            ),
            "preds": preds,
        }
        if self._windows_on:
            metrics["window_ok"] = ok
        return metrics

    def _predict_step(self, state: TrainState, points: jax.Array):
        """Inference logits -> argmax labels (predict.py:65-91)."""
        logits = self._infer_logits(state, points)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _predict_step_checked(self, state: TrainState, points: jax.Array):
        """Like predict_step, plus the window exactness certificate.

        ``(labels, ok)``: ok False means some calibrated window dropped
        candidates on THIS batch and the labels may differ from the exact
        kernels' — callers should abort and recalibrate (predict.py does).
        """
        logits, ok = self._infer_logits_ok(state, points)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), ok

    def check_bq_window(self, state: TrainState, points: jax.Array) -> bool:
        """Verify the calibrated ball-query window on a real batch.

        Runs the eval forward with the "diagnostics" collection mutable so
        every SA level's sown ``bq_window_ok`` AND every FP level's
        ``fp_window_ok`` exactness certificate is collected (see
        ops.ball_query_calibrated / ops.three_nn_calibrated), and returns
        True iff all hold — i.e. the windowed queries' outputs on this batch
        are bit-identical to the exact kernels'. Always True when both
        windows are None. Cheap relative to an eval pass (one un-chunked
        forward on the given batch); train.py calls it at every eval epoch.
        """
        if self.bq_window is None and self.fp_window is None:
            return True
        _, diag = self.infer_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
            bn_momentum=0.9,
            mutable=["diagnostics"],
        )
        flags = jax.tree.leaves(diag.get("diagnostics", {}))
        return bool(jnp.all(jnp.stack([jnp.all(f) for f in flags])))


# -- checkpointing ---------------------------------------------------------


def save_checkpoint(path, state: TrainState) -> None:
    """Orbax checkpoint (replaces tf.train.Saver, train.py:391,443-460)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: jnp.asarray(x), state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
