"""Sampling-RNG thread safety + determinism, and the zero-batch train guard.

The reference re-seeded numpy per worker *process* (train.py:123); the
thread-pool producer here needs one RandomState per worker *thread*
(data/rng.py). Contract under test:
- fixed seed + one sampling thread => bit-identical batch stream,
- concurrent sampling threads never share a RandomState object.
"""

import sys
import threading

import numpy as np
import pytest

import pointnet2_tpu.data.semantic3d as s3d
from pointnet2_tpu.data.pipeline import BatchProducer
from pointnet2_tpu.data.rng import ThreadLocalRNG
from pointnet2_tpu.data.semantic3d import SemanticDataset


@pytest.fixture
def scene_dir(rng, tmp_path, monkeypatch):
    from pointnet2_tpu.data.io import write_labels, write_pcd

    names = ["rngA", "rngB"]
    for name in names:
        n = 2000
        pts = rng.rand(n, 3) * [20, 20, 5]
        write_pcd(tmp_path / f"{name}.pcd", pts, rng.rand(n, 3))
        write_labels(tmp_path / f"{name}.labels", rng.randint(0, 9, n))
    monkeypatch.setitem(s3d.map_name_to_file_prefixes, "train", names)
    return tmp_path


def _dataset(scene_dir, seed):
    return SemanticDataset(
        num_points_per_sample=128,
        split="train",
        use_color=True,
        box_size_x=10,
        box_size_y=10,
        path=str(scene_dir),
        seed=seed,
    )


def test_threadlocal_rng_distinct_per_thread():
    tl = ThreadLocalRNG(0)
    states = {}  # hold the objects: id() values can be reused after GC

    def record(name):
        states[name] = tl.get()
        assert tl.get() is states[name]  # stable within a thread

    threads = [
        threading.Thread(target=record, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len({id(s) for s in states.values()}) == 4


def test_single_worker_seeded_stream_reproducible(scene_dir):
    """Same seed + one producer worker => identical batch stream twice."""

    def stream(seed, nbatches):
        ds = _dataset(scene_dir, seed)
        producer = BatchProducer(
            lambda: ds.sample_batch_in_all_files(4, True),
            max_queue=4,
            num_workers=1,
        )
        try:
            return [producer.get() for _ in range(nbatches)]
        finally:
            producer.stop()

    a = stream(7, 5)
    b = stream(7, 5)
    for (da, la, wa), (db, lb, wb) in zip(a, b):
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(wa, wb)


def test_multi_worker_rngs_never_shared(scene_dir):
    """Concurrent sampling threads each resolve to their own RandomState."""
    ds = _dataset(scene_dir, 0)
    seen: dict[int, object] = {}  # hold objects: id() reuse after thread GC
    errors: list[BaseException] = []
    barrier = threading.Barrier(4)

    def worker(tid):
        try:
            barrier.wait()
            for _ in range(3):
                ds.sample_batch_in_all_files(2, True)
            seen[tid] = ds.rng
            # Every FileData resolves to the same per-thread state object.
            assert ds.list_file_data[0].rng is seen[tid]
        except BaseException as e:  # surface failures from threads
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len({id(s) for s in seen.values()}) == 4


def test_train_cli_zero_batches_clear_error(scene_dir, tmp_path):
    """batch_size*num_point > total points => actionable error, no NameError.

    Regression for the round-2 bug: an epoch with zero batches crashed at
    `logger.scalars(... last_metrics ...)` with an unbound local.
    """
    from pointnet2_tpu.config import Config

    monkey_names = s3d.map_name_to_file_prefixes["train"]
    # validation split must also resolve; reuse the same fabricated scenes
    old_val = s3d.map_name_to_file_prefixes["validation"]
    s3d.map_name_to_file_prefixes["validation"] = monkey_names
    cfg = Config(
        num_point=256,
        batch_size=32,  # 32*256 = 8192 > the 4000 fabricated points -> 0 batches
        max_epoch=1,
        data_path=str(scene_dir),
        logdir=str(tmp_path / "log"),
        l1_npoint=64,
        l2_npoint=32,
        l3_npoint=16,
        l4_npoint=8,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)
    argv = ["train.py", "--config_file", str(cfg_path), "--seed", "0"]
    old = sys.argv
    sys.argv = argv
    try:
        import train

        with pytest.raises(ValueError, match="that is 0"):
            train.main()
    finally:
        sys.argv = old
        s3d.map_name_to_file_prefixes["validation"] = old_val
