"""AOT model export for serving (StableHLO via ``jax.export``).

The reference can only serve predictions through its own Python stack — a
TF1 graph rebuilt from source plus a checkpoint restore
(/root/reference/predict.py:44-63, /root/reference/benchmark.py:10-24).
For production deployment this module instead exports the eval forward as
a *self-contained, versioned StableHLO artifact*:

- weights are baked into the program as constants (one file serves),
- the batch dimension may be symbolic (one artifact serves any batch),
- the artifact is loadable with ``jax.export.deserialize`` alone — no
  model code, no checkpoint, no flax — and runs under jit on the target
  platform,
- StableHLO carries jax.export's compatibility guarantees across runtime
  versions (unlike pickled Python or a checkpoint tied to model code).

Export on the platform you serve on (kernels are lowered for the lowering
platform: TPU exports carry the Mosaic kernels, CPU exports the XLA-only
op set — ``ops_impl`` dispatch happens at trace time). One interaction:
a SYMBOLIC batch dimension cannot lower through ``pallas_call`` (Mosaic
grids need concrete shapes), so TPU exports need either a fixed ``batch``
or ``ops_impl="xla"`` — :func:`export_model` raises with that guidance.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jexport

_MANIFEST = "manifest.json"
_ARTIFACT = "model.stablehlo"


def export_model(
    trainer,
    state,
    path: str,
    *,
    batch: Optional[int] = None,
    output: str = "labels",
) -> dict:
    """Serialize the eval-mode forward (with ``state``'s weights baked in).

    trainer: ``Trainer`` (its ``infer_dtype`` decides f32 vs bf16-folded
    serving mode). state: a ``TrainState`` (params + batch_stats used;
    optimizer state is not exported). batch: fixed batch size (enables the
    chunked forward) or ``None`` for a symbolic batch dimension (one
    artifact, any batch; runs unchunked). output: "labels" (argmax int32,
    predict.py semantics) or "logits".

    If the trainer has calibrated windows (``bq_window``/``fp_window``),
    the exported callable returns ``(output, ok)`` — ``ok`` is the sown
    exactness certificate for the served batch (False means the window
    dropped neighbor candidates; the server must reject/recalibrate) —
    and the manifest records ``window_certificate: true`` + the widths.

    Writes ``model.stablehlo`` + ``manifest.json`` under ``path`` and
    returns the manifest dict.
    """
    if output not in ("labels", "logits"):
        raise ValueError(f"unknown output {output!r}, expected labels/logits")
    if batch is None and jax.default_backend() == "tpu" and (
        getattr(trainer, "ops_impl", None) in (None, "pallas")
    ):
        # Mosaic kernels need concrete grid shapes: a symbolic batch
        # dimension cannot lower through pallas_call (MemRefType rejects
        # symbolic dims). Fail here with guidance instead of deep in
        # jax.export's lowering.
        raise ValueError(
            "symbolic-batch export on TPU cannot carry the Mosaic kernels "
            "(pallas_call needs concrete grid shapes). Either export with "
            "a fixed batch (export_model(..., batch=N) / "
            "tools/export_model.py --batch N), or build the Trainer with "
            "ops_impl='xla' for a batch-polymorphic XLA-only artifact "
            "(slower neighbor ops; see PERFORMANCE.md)."
        )
    cfg = trainer.cfg
    # Calibrated-window serving: the artifact must carry the exactness
    # certificate with it — a served batch outside the calibrated span
    # would otherwise silently drop neighbors. The exported callable then
    # returns (output, ok) and the manifest says so.
    checked = bool(getattr(trainer, "_windows_on", False))

    def forward(points):
        ok = None
        if batch is None:
            # Symbolic batch: apply the model directly — the chunk split
            # needs a concrete batch size (b % chunk), and serving batches
            # are chosen by the caller anyway.
            params, batch_stats = state.params, state.batch_stats
            if trainer.infer_model is not trainer.model:
                from pointnet2_tpu.nn.fold import fold_batch_norm

                params, batch_stats = fold_batch_norm(params, batch_stats)
            variables = {"params": params, "batch_stats": batch_stats}
            if checked:
                from pointnet2_tpu.train.trainer import _diag_ok

                logits, diag = trainer.infer_model.apply(
                    variables,
                    points,
                    train=False,
                    bn_momentum=0.9,
                    mutable=["diagnostics"],
                )
                ok = _diag_ok(diag.get("diagnostics", {}))
            else:
                logits = trainer.infer_model.apply(
                    variables, points, train=False, bn_momentum=0.9
                )
        elif checked:
            logits, ok = trainer._infer_logits_ok(state, points)
        else:
            logits = trainer._infer_logits(state, points)
        out = logits
        if output == "labels":
            out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (out, ok) if checked else out

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        arg = jax.ShapeDtypeStruct((b, cfg.num_point, cfg.point_dim), jnp.float32)
    else:
        arg = jax.ShapeDtypeStruct(
            (batch, cfg.num_point, cfg.point_dim), jnp.float32
        )
    exported = jexport.export(jax.jit(forward))(arg)
    blob = exported.serialize()

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(blob)
    manifest = {
        "artifact": _ARTIFACT,
        "input_shape": [batch, cfg.num_point, cfg.point_dim],
        "input_dtype": "float32",
        "output": output,
        "num_classes": trainer.num_classes,
        "arch": getattr(trainer, "arch", "ssg"),
        "infer_dtype": trainer.infer_dtype,
        "bf16_min_width": getattr(trainer, "bf16_min_width", None),
        "window_certificate": checked,
        "bq_window": getattr(trainer, "bq_window", None),
        "fp_window": getattr(trainer, "fp_window", None),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "artifact_bytes": len(blob),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str):
    """(callable, manifest) from an ``export_model`` directory.

    Requires only jax — no model code or checkpoint. The callable maps
    (batch, num_point, point_dim) f32 points to the exported output and
    may be wrapped in ``jax.jit`` by the caller. If the manifest says
    ``window_certificate``, the callable returns ``(output, ok)`` and the
    server must check ``ok`` per batch.
    """
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(path, manifest["artifact"]), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call, manifest
