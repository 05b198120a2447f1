"""Async batch producer + device prefetch tests."""

import time

import numpy as np
import pytest

from pointnet2_tpu.data.pipeline import BatchProducer, device_prefetch


class TestBatchProducer:
    def test_produces_batches(self):
        counter = {"n": 0}

        def sample():
            counter["n"] += 1
            return (np.ones((2, 4)), np.zeros((2,)))

        prod = BatchProducer(sample, max_queue=4, num_workers=2)
        try:
            batches = [prod.get() for _ in range(10)]
            assert len(batches) == 10
            assert batches[0][0].shape == (2, 4)
        finally:
            prod.stop()

    def test_error_propagates(self):
        def bad():
            raise RuntimeError("boom")

        prod = BatchProducer(bad, max_queue=2, num_workers=1)
        try:
            with pytest.raises(RuntimeError, match="batch producer failed"):
                prod.get()
        finally:
            prod.stop()

    def test_bounded_queue_backpressure(self):
        def sample():
            return np.zeros(1)

        prod = BatchProducer(sample, max_queue=2, num_workers=1)
        try:
            time.sleep(0.3)
            assert prod._queue.qsize() <= 2
        finally:
            prod.stop()


class TestDevicePrefetch:
    def test_order_and_completeness(self):
        batches = [{"x": np.full((4, 2), i)} for i in range(7)]
        out = list(device_prefetch(iter(batches), depth=3))
        assert len(out) == 7
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_sharded_prefetch(self):
        import jax

        from pointnet2_tpu.parallel import batch_sharding, create_mesh

        mesh = create_mesh()
        sharding = batch_sharding(mesh)
        batches = [{"x": np.ones((8, 2), np.float32)} for _ in range(3)]
        out = list(device_prefetch(iter(batches), sharding=sharding))
        assert len(out) == 3
        assert len(out[0]["x"].sharding.device_set) == len(jax.devices())
