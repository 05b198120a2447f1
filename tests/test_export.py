"""Serving export round-trip: StableHLO artifact == live model.

The exported artifact must be loadable with jax alone (no model code) and
reproduce the live predict path exactly. Covers the symbolic-batch
artifact (any batch from one export), the fixed-batch (chunked) artifact,
and the bf16 serving mode. The reference has no counterpart (its serving
requires rebuilding the TF1 graph, /root/reference/predict.py:44-63).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.config import Config
from pointnet2_tpu.export import export_model, load_exported
from pointnet2_tpu.train.trainer import Trainer

SMALL = Config(
    num_point=256,
    batch_size=4,
    l1_npoint=64,
    l2_npoint=32,
    l3_npoint=16,
    l4_npoint=8,
)


def _trainer_state(dtype="float32"):
    trainer = Trainer(cfg=SMALL, infer_dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


def _points(rng, b):
    return jnp.asarray(
        rng.randn(b, SMALL.num_point, SMALL.point_dim), jnp.float32
    )


def test_symbolic_batch_round_trip(rng, tmp_path):
    trainer, state = _trainer_state()
    out = str(tmp_path / "export")
    manifest = export_model(trainer, state, out, batch=None, output="labels")
    assert manifest["input_shape"][0] is None
    assert manifest["artifact_bytes"] > 0

    fn, loaded_manifest = load_exported(out)
    assert loaded_manifest["num_classes"] == 9
    # one artifact serves BOTH batch sizes; must equal the live forward
    for b in (2, 5):
        pts = _points(rng, b)
        got = np.asarray(fn(pts))
        # live reference: unchunked eval forward (what the export traced)
        logits = trainer.infer_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, train=False, bn_momentum=0.9,
        )
        want = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))
        np.testing.assert_array_equal(got, want)


def test_fixed_batch_matches_predict_step(rng, tmp_path):
    trainer, state = _trainer_state()
    out = str(tmp_path / "export_fixed")
    export_model(trainer, state, out, batch=4, output="labels")
    fn, _ = load_exported(out)
    pts = _points(rng, 4)
    got = np.asarray(fn(pts))
    want = np.asarray(trainer.predict_step(state, pts))
    np.testing.assert_array_equal(got, want)


def test_logits_output_and_bf16_mode(rng, tmp_path):
    trainer, state = _trainer_state(dtype="bfloat16")
    out = str(tmp_path / "export16")
    manifest = export_model(trainer, state, out, batch=2, output="logits")
    assert manifest["infer_dtype"] == "bfloat16"
    fn, _ = load_exported(out)
    pts = _points(rng, 2)
    got = np.asarray(fn(pts))
    want = np.asarray(trainer._infer_logits(state, pts))
    # bf16 activations: the exported whole-graph compilation fuses
    # differently than the eager per-op reference, so logits agree only to
    # bf16 rounding (~1e-3 absolute on this scale). Labels must match.
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    assert got.shape == (2, SMALL.num_point, 9)


def test_selective_bf16_export(rng, tmp_path):
    """Selective mixed precision serves: the manifest records the
    threshold and the artifact reproduces the live selective predict
    path exactly (labels)."""
    trainer = Trainer(cfg=SMALL, infer_dtype="bfloat16", bf16_min_width=128)
    state = trainer.init_state(jax.random.PRNGKey(0))
    out = str(tmp_path / "export_sel16")
    manifest = export_model(trainer, state, out, batch=2, output="labels")
    assert manifest["infer_dtype"] == "bfloat16"
    assert manifest["bf16_min_width"] == 128
    fn, loaded = load_exported(out)
    assert loaded["bf16_min_width"] == 128
    pts = _points(rng, 2)
    got = np.asarray(fn(pts))
    want = np.asarray(trainer.predict_step(state, pts))
    np.testing.assert_array_equal(got, want)


def test_msg_arch_export_round_trip(rng, tmp_path):
    """--arch msg serving: the manifest records the arch and the artifact
    reproduces the live MSG predict path exactly."""
    trainer = Trainer(cfg=SMALL, arch="msg")
    state = trainer.init_state(jax.random.PRNGKey(0))
    out = str(tmp_path / "export_msg")
    manifest = export_model(trainer, state, out, batch=2, output="labels")
    assert manifest["arch"] == "msg"
    fn, _ = load_exported(out)
    pts = _points(rng, 2)
    got = np.asarray(fn(pts))
    want = np.asarray(trainer.predict_step(state, pts))
    np.testing.assert_array_equal(got, want)


def test_symbolic_batch_with_pallas_rejected(tmp_path, monkeypatch):
    """On TPU a symbolic batch cannot lower through pallas_call (Mosaic
    grids need concrete shapes) — export_model must raise the guidance
    error up front, not a MemRefType error deep in jax.export."""
    import pytest

    import pointnet2_tpu.export as export_mod

    trainer, state = _trainer_state()
    monkeypatch.setattr(export_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="--batch N"):
        export_model(trainer, state, str(tmp_path / "x"), batch=None)


def test_manifest_written(tmp_path, rng):
    trainer, state = _trainer_state()
    out = str(tmp_path / "export_m")
    export_model(trainer, state, out, batch=2)
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["artifact"] == "model.stablehlo"
    assert m["output"] == "labels"
    assert os.path.getsize(os.path.join(out, m["artifact"])) == m["artifact_bytes"]


def test_windowed_export_carries_certificate(rng, tmp_path):
    """Calibrated-window serving: the artifact returns (labels, ok) and the
    manifest records the widths — a server must check ok per batch. On the
    CPU XLA path the windows are advisory so ok is constant True and the
    labels equal the unwindowed export's."""
    trainer = Trainer(cfg=SMALL, bq_window=256, fp_window=128)
    state = trainer.init_state(jax.random.PRNGKey(0))

    for batch in (None, 4):
        out = str(tmp_path / f"export_win_{batch}")
        manifest = export_model(trainer, state, out, batch=batch, output="labels")
        assert manifest["window_certificate"] is True
        assert manifest["bq_window"] == 256 and manifest["fp_window"] == 128

        fn, loaded = load_exported(out)
        assert loaded["window_certificate"] is True
        pts = _points(rng, 4)
        labels, ok = fn(pts)
        assert bool(ok) is True
        want = np.asarray(trainer.predict_step(state, pts))
        np.testing.assert_array_equal(np.asarray(labels), want)

    # unwindowed manifests say so
    plain, state_p = _trainer_state()
    out = str(tmp_path / "export_plain")
    manifest = export_model(plain, state_p, out, batch=4)
    assert manifest["window_certificate"] is False
