"""Production HTTP serving for exported artifacts (micro-batching).

The reference has no serving story at all — every prediction rebuilds the
TF1 graph from source and restores a checkpoint in-process
(/root/reference/predict.py:44-63, /root/reference/benchmark.py:10-24).
This module serves the self-contained StableHLO artifact produced by
:mod:`pointnet2_tpu.export` over HTTP, with the pieces a fixed-shape TPU
program actually needs in production:

- **Micro-batching.** A TPU program is compiled for a fixed batch; serving
  one cloud per dispatch wastes the chip and pays the ~ms dispatch latency
  per request. A batcher thread coalesces concurrent requests (up to the
  compiled batch, within ``max_delay_ms``), pads the tail, runs ONE device
  program, and scatters results back to the waiting requests.
- **Bounded compile cache.** Symbolic-batch artifacts accept any batch but
  each distinct batch size is a fresh XLA compile; the runner pads to the
  next power of two so the cache stays O(log max_batch).
- **Certificate rejection.** Artifacts exported with calibrated windows
  return ``(labels, ok)``; ``ok=False`` means the window dropped neighbor
  candidates for THIS batch and the labels are not trustworthy — the
  server answers 503 (recalibrate / re-export), mirroring predict.py's
  per-batch abort semantics.

Wire format: ``POST /v1/predict`` with either JSON ``{"points": [...]}``
(one ``(num_point, point_dim)`` cloud or a ``(b, num_point, point_dim)``
batch) or a raw ``.npy`` body (``Content-Type: application/x-npy``, same
shapes). Responses are JSON by default, ``.npy`` when requested via
``Accept: application/x-npy``. ``GET /healthz`` reports the manifest;
``GET /stats`` reports batching efficiency.

Dependency-free: stdlib ``http.server`` + jax. No Python model code is
needed at the serving host — only the artifact directory.
"""

from __future__ import annotations

import io
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_NPY = "application/x-npy"
_JSON = "application/json"


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class ServingModel:
    """A loaded artifact plus the pad/split logic around its fixed shapes.

    ``run(points)`` accepts any ``(b, num_point, point_dim)`` float32 batch,
    slices it into compiled-batch-sized device calls (padding the tail by
    repeating row 0 — padded rows are discarded, never returned), and
    returns ``(labels (b, num_point) int32, ok bool)``. ``ok`` is the
    conjunction of the per-call window certificates (True when the
    artifact has no certificate).
    """

    def __init__(self, artifact_dir: str, *, max_batch: int = 64):
        import jax

        from pointnet2_tpu.export import load_exported

        fn, manifest = load_exported(artifact_dir)
        self.manifest = manifest
        self.checked = bool(manifest.get("window_certificate"))
        self.num_point = int(manifest["input_shape"][1])
        self.point_dim = int(manifest["input_shape"][2])
        fixed = manifest["input_shape"][0]
        self.fixed_batch: Optional[int] = int(fixed) if fixed else None
        self.max_batch = self.fixed_batch or max_batch
        self._fn = jax.jit(fn)
        self._lock = threading.Lock()  # device calls are serialized

    def _call_padded(self, chunk: np.ndarray):
        """One device call at a compiled batch size covering ``chunk``."""
        b = chunk.shape[0]
        target = self.fixed_batch or min(_next_pow2(b), self.max_batch)
        if b < target:
            pad = np.broadcast_to(chunk[:1], (target - b,) + chunk.shape[1:])
            chunk = np.concatenate([chunk, pad], axis=0)
        out = self._fn(chunk)
        if self.checked:
            labels, ok = out
            return np.asarray(labels)[:b], bool(ok)
        return np.asarray(out)[:b], True

    def run(self, points: np.ndarray):
        points = np.ascontiguousarray(points, dtype=np.float32)
        labels, ok = [], True
        with self._lock:
            for s in range(0, points.shape[0], self.max_batch):
                lab, call_ok = self._call_padded(points[s : s + self.max_batch])
                labels.append(lab)
                ok = ok and call_ok
        return np.concatenate(labels, axis=0), ok

    def warmup(self) -> None:
        """Compile the full-batch program before accepting traffic."""
        x = np.zeros(
            (self.max_batch, self.num_point, self.point_dim), np.float32
        )
        self.run(x)


class _Pending:
    """One enqueued request: points in, (labels, ok) or an exception out."""

    __slots__ = ("points", "event", "labels", "ok", "error")

    def __init__(self, points: np.ndarray):
        self.points = points
        self.event = threading.Event()
        self.labels: Optional[np.ndarray] = None
        self.ok = True
        self.error: Optional[BaseException] = None


@dataclass
class ServerStats:
    requests: int = 0
    clouds: int = 0
    device_batches: int = 0
    batched_clouds: int = 0  # clouds that shared a device batch with others
    certificate_failures: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict:
        with self.lock:
            return {
                "requests": self.requests,
                "clouds": self.clouds,
                "device_batches": self.device_batches,
                "batched_clouds": self.batched_clouds,
                "certificate_failures": self.certificate_failures,
            }


class MicroBatcher:
    """Coalesce concurrent requests into shared device batches.

    A single consumer thread blocks on the queue, then drains further
    requests for up to ``max_delay_ms`` (or until the compiled batch is
    full), concatenates the clouds, runs ONE ``ServingModel.run``, and
    scatters the label rows back. Requests never see each other's data;
    a failed device call fails every request in the batch.
    """

    def __init__(
        self, model: ServingModel, stats: ServerStats, max_delay_ms: float = 5.0
    ):
        import queue

        self.model = model
        self.stats = stats
        self.max_delay = max_delay_ms / 1000.0
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, points: np.ndarray) -> _Pending:
        p = _Pending(points)
        self._q.put(p)
        return p

    def stop(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=5)

    def _drain(self, first: _Pending):
        batch = [first]
        total = first.points.shape[0]
        deadline = time.monotonic() + self.max_delay
        while total < self.model.max_batch:
            try:
                nxt = self._q.get(timeout=max(deadline - time.monotonic(), 0))
            except Exception:
                break
            if nxt is None:
                self._q.put(None)  # re-post the sentinel for _loop
                break
            batch.append(nxt)
            total += nxt.points.shape[0]
        return batch

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = self._drain(first)
            try:
                pts = np.concatenate([p.points for p in batch], axis=0)
                labels, ok = self.model.run(pts)
                with self.stats.lock:
                    self.stats.device_batches += 1
                    self.stats.clouds += pts.shape[0]
                    if len(batch) > 1:
                        self.stats.batched_clouds += pts.shape[0]
                    if not ok:
                        self.stats.certificate_failures += 1
                s = 0
                for p in batch:
                    n = p.points.shape[0]
                    p.labels, p.ok = labels[s : s + n], ok
                    s += n
            except BaseException as e:  # propagate to every waiter
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.event.set()


def _make_handler(model: ServingModel, batcher: MicroBatcher, stats: ServerStats):
    manifest = model.manifest

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet by default; stats cover it
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict) -> None:
            self._send(code, json.dumps(obj).encode(), _JSON)

        def do_GET(self) -> None:
            if self.path == "/healthz":
                self._send_json(200, {"status": "ok", "manifest": manifest})
            elif self.path == "/stats":
                self._send_json(200, stats.snapshot())
            else:
                self._send_json(404, {"error": "not_found"})

        def _parse_points(self) -> np.ndarray:
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            ctype = (self.headers.get("Content-Type") or _JSON).split(";")[0]
            if ctype == _NPY:
                pts = np.load(io.BytesIO(body), allow_pickle=False)
            else:
                pts = np.asarray(json.loads(body)["points"], dtype=np.float32)
            if pts.ndim == 2:
                pts = pts[None]
            if pts.ndim != 3 or pts.shape[1:] != (
                model.num_point,
                model.point_dim,
            ):
                raise ValueError(
                    f"expected (b, {model.num_point}, {model.point_dim}) "
                    f"or ({model.num_point}, {model.point_dim}), "
                    f"got {pts.shape}"
                )
            return np.ascontiguousarray(pts, dtype=np.float32)

        def do_POST(self) -> None:
            if self.path != "/v1/predict":
                self._send_json(404, {"error": "not_found"})
                return
            try:
                pts = self._parse_points()
            except Exception as e:
                self._send_json(400, {"error": "bad_request", "detail": str(e)})
                return
            with stats.lock:
                stats.requests += 1
            pending = batcher.submit(pts)
            pending.event.wait()
            if pending.error is not None:
                self._send_json(
                    500, {"error": "inference_failed", "detail": str(pending.error)}
                )
                return
            if not pending.ok:
                # calibrated-window certificate failed for this batch: the
                # labels may differ from the exact kernels' (predict.py's
                # abort semantics — recalibrate and re-export)
                self._send_json(
                    503,
                    {
                        "error": "window_certificate_failed",
                        "detail": "calibrated window dropped neighbor "
                        "candidates on this batch; recalibrate "
                        "(tools/bq_window_calibrate.py) and re-export",
                    },
                )
                return
            if _NPY in (self.headers.get("Accept") or ""):
                buf = io.BytesIO()
                np.save(buf, pending.labels)
                self._send(200, buf.getvalue(), _NPY)
            else:
                self._send_json(200, {"labels": pending.labels.tolist()})

    return Handler


class PredictServer:
    """Owns the model, batcher, stats, and HTTP server lifecycle."""

    def __init__(
        self,
        artifact_dir: str,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        max_batch: int = 64,
        max_delay_ms: float = 5.0,
        warmup: bool = True,
    ):
        self.model = ServingModel(artifact_dir, max_batch=max_batch)
        if warmup:
            self.model.warmup()
        self.stats = ServerStats()
        self.batcher = MicroBatcher(self.model, self.stats, max_delay_ms)
        handler = _make_handler(self.model, self.batcher, self.stats)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()
