"""HTTP serving daemon: transport, micro-batching, certificates.

Serves a real exported artifact (pointnet2_tpu/export.py) through the real
ThreadingHTTPServer on a loopback port and drives it with stdlib HTTP
clients — no mocked transport. The reference has no serving counterpart
(predictions rebuild the TF1 graph in-process,
/root/reference/predict.py:44-63).
"""

import io
import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.config import Config
from pointnet2_tpu.export import export_model
from pointnet2_tpu.serving import PredictServer, ServingModel
from pointnet2_tpu.train.trainer import Trainer

SMALL = Config(
    num_point=256,
    batch_size=4,
    l1_npoint=64,
    l2_npoint=32,
    l3_npoint=16,
    l4_npoint=8,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """A fixed-batch-4 artifact plus the live trainer/state it came from."""
    trainer = Trainer(cfg=SMALL)
    state = trainer.init_state(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("serve") / "export")
    export_model(trainer, state, out, batch=4, output="labels")
    return out, trainer, state


@pytest.fixture(scope="module")
def server(artifact):
    out, _, _ = artifact
    srv = PredictServer(out, port=0, max_delay_ms=30.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(port, body, ctype="application/json", accept=None, path="/v1/predict"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    req.add_header("Content-Type", ctype)
    if accept:
        req.add_header("Accept", accept)
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _live_labels(trainer, state, pts):
    logits = trainer.infer_model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(pts), train=False, bn_momentum=0.9,
    )
    return np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))


def test_healthz_and_stats(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["manifest"]["input_shape"] == [4, 256, 6]
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/stats", timeout=30
    ) as r:
        assert "device_batches" in json.loads(r.read())


def test_json_single_cloud_matches_live(server, artifact, rng):
    _, trainer, state = artifact
    pts = rng.randn(1, SMALL.num_point, SMALL.point_dim).astype(np.float32)
    status, body, _ = _post(
        server.port, json.dumps({"points": pts[0].tolist()}).encode()
    )
    assert status == 200
    got = np.asarray(json.loads(body)["labels"], np.int32)
    np.testing.assert_array_equal(got, _live_labels(trainer, state, pts))


def test_npy_batch_round_trip(server, artifact, rng):
    _, trainer, state = artifact
    pts = rng.randn(2, SMALL.num_point, SMALL.point_dim).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pts)
    status, body, ctype = _post(
        server.port, buf.getvalue(),
        ctype="application/x-npy", accept="application/x-npy",
    )
    assert status == 200 and ctype == "application/x-npy"
    got = np.load(io.BytesIO(body))
    assert got.shape == (2, SMALL.num_point)
    np.testing.assert_array_equal(got, _live_labels(trainer, state, pts))


def test_oversize_request_is_split_across_device_calls(server, artifact, rng):
    # 7 clouds > compiled batch 4: the runner must slice into 4 + 3(+pad)
    _, trainer, state = artifact
    pts = rng.randn(7, SMALL.num_point, SMALL.point_dim).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, pts)
    status, body, _ = _post(server.port, buf.getvalue(), ctype="application/x-npy")
    assert status == 200
    got = np.asarray(json.loads(body)["labels"], np.int32)
    np.testing.assert_array_equal(got, _live_labels(trainer, state, pts))


def test_concurrent_requests_are_microbatched(server, rng):
    before = server.stats.snapshot()
    pts = rng.randn(1, SMALL.num_point, SMALL.point_dim).astype(np.float32)
    body = json.dumps({"points": pts[0].tolist()}).encode()
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(lambda _: _post(server.port, body), range(4)))
    assert all(s == 200 for s, _, _ in results)
    # all four answers identical (same cloud)
    labels = {b for _, b, _ in results}
    assert len(labels) == 1
    after = server.stats.snapshot()
    assert after["requests"] - before["requests"] == 4
    # with a 30ms coalescing window, 4 concurrent 1-cloud requests must
    # share device batches: fewer batches than requests
    assert after["device_batches"] - before["device_batches"] < 4
    assert after["batched_clouds"] > before["batched_clouds"]


def test_bad_shape_is_400(server):
    bad = json.dumps({"points": [[1.0, 2.0], [3.0, 4.0]]}).encode()
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.port, bad)
    assert ei.value.code == 400
    assert json.loads(ei.value.read())["error"] == "bad_request"


def test_unknown_path_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.port, b"{}", path="/v2/nope")
    assert ei.value.code == 404


def test_certificate_failure_is_503(artifact, rng):
    # exercise the rejection path by stubbing the device call to report a
    # failed window certificate (exporting a genuinely-failing calibrated
    # window needs box-regime data; the server contract is what's under
    # test here — the certificate itself is covered by tests/test_bq_window)
    out, _, _ = artifact
    srv = PredictServer(out, port=0, max_delay_ms=1.0, warmup=False)
    srv.model.checked = True
    real = srv.model._fn
    srv.model._fn = lambda x: (real(x), jnp.asarray(False))
    srv.start_background()
    try:
        pts = rng.randn(SMALL.num_point, SMALL.point_dim).astype(np.float32)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv.port, json.dumps({"points": pts.tolist()}).encode())
        assert ei.value.code == 503
        payload = json.loads(ei.value.read())
        assert payload["error"] == "window_certificate_failed"
        assert srv.stats.snapshot()["certificate_failures"] == 1
    finally:
        srv.shutdown()


def test_symbolic_artifact_pads_to_pow2(tmp_path, rng):
    trainer = Trainer(cfg=SMALL, ops_impl="xla")
    state = trainer.init_state(jax.random.PRNGKey(1))
    out = str(tmp_path / "export_sym")
    export_model(trainer, state, out, batch=None, output="labels")
    model = ServingModel(out, max_batch=8)
    assert model.fixed_batch is None
    pts = rng.randn(3, SMALL.num_point, SMALL.point_dim).astype(np.float32)
    labels, ok = model.run(pts)
    assert ok and labels.shape == (3, SMALL.num_point)
    np.testing.assert_array_equal(labels, _live_labels(trainer, state, pts))
