"""Async host-side batch producer with device prefetch.

Replaces the reference's mp.Queue producer (train.py:122-196): a thread pool
samples batches concurrently (the samplers are NumPy-heavy and release the
GIL), a bounded queue smooths jitter, and ``device_prefetch`` keeps the next
batch already transferred to HBM (sharded across the mesh if given) while the
current step runs — so the TPU never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class _ProducerError:
    """Sentinel carrying a worker traceback to the consumer."""

    def __init__(self, tb: str):
        self.tb = tb


class BatchProducer:
    """Background producer running `sample_fn()` into a bounded queue."""

    def __init__(
        self,
        sample_fn: Callable[[], tuple],
        max_queue: int = 8,
        num_workers: int = 4,
    ):
        self._sample_fn = sample_fn
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._fill, daemon=True)
            for _ in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _fill(self) -> None:
        while not self._stop.is_set():
            try:
                batch = self._sample_fn()
            except Exception:  # propagate as sentinel; consumer re-raises
                if not self._stop.is_set():
                    import traceback

                    self._queue.put(_ProducerError(traceback.format_exc()))
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def get(self):
        item = self._queue.get()
        if isinstance(item, _ProducerError):
            raise RuntimeError(f"batch producer failed:\n{item.tb}")
        return item

    def __iter__(self) -> Iterator:
        """Endless iterator view (for device_prefetch wrapping)."""
        while True:
            yield self.get()

    def stop(self) -> None:
        self._stop.set()
        # Drain so blocked putters exit.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


def device_prefetch(
    host_iter: Iterator,
    sharding: Optional[jax.sharding.Sharding] = None,
    depth: int = 2,
    put_fn: Optional[Callable] = None,
) -> Iterator:
    """Wrap a host batch iterator so batches are put on device ahead of use.

    ``put_fn`` overrides the host->device transfer (e.g. multi-process
    assembly via parallel.multihost.global_batch_from_local, where each
    process contributes only its shard of the global batch); default is a
    plain device_put against ``sharding``.
    """
    buf: list = []

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        if sharding is None:
            return jax.device_put(batch)
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), sharding), batch
        )

    it = iter(host_iter)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
