"""Tests for the dependency-free XSpace parser and per-op report.

Records a real jax.profiler trace (CPU backend), parses it with
pointnet2_tpu.utils.xplane, and — when tensorflow is importable —
cross-validates every plane/line/event against TF's own xplane_pb2 decoding.
Mirrors the reference's per-op profile artifact (benchmark.py:26-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from pointnet2_tpu.utils import xplane


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    with jax.profiler.trace(str(tmp)):
        for _ in range(3):
            f(x).block_until_ready()
    return tmp


def test_finds_and_parses_xplane(trace_dir):
    files = xplane.find_xplane_files(trace_dir)
    assert files, "no xplane files recorded"
    planes = []
    for f in files:
        planes.extend(xplane.parse_xspace(f))
    assert planes
    names = {p.name for p in planes}
    assert any("CPU" in n or "TPU" in n for n in names), names
    n_events = sum(len(line.events) for p in planes for line in p.lines)
    assert n_events > 0


def test_aggregate_and_report(trace_dir, tmp_path):
    out = tmp_path / "profile.txt"
    rows = xplane.write_op_report(trace_dir, out)
    assert rows
    assert rows == sorted(rows, key=lambda r: -r.total_ps)
    # the jitted matmul must appear somewhere in the aggregated ops
    assert any("dot" in r.name for r in rows), [r.name for r in rows[:10]]
    text = out.read_text()
    assert "total_ms" in text and "share" in text
    # shares sum to ~100%
    shares = [
        float(line.rsplit("%", 1)[0].rsplit(" ", 1)[-1])
        for line in text.splitlines()
        if line.endswith("%")
    ]
    assert abs(sum(shares) - 100.0) < 1.5


def test_cross_validate_against_tf_proto(trace_dir):
    xp = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    for f in xplane.find_xplane_files(trace_dir):
        mine = xplane.parse_xspace(f)
        ref = xp.XSpace()
        ref.ParseFromString(f.read_bytes())
        assert [p.name for p in mine] == [p.name for p in ref.planes]
        for pm, pr in zip(mine, ref.planes):
            assert [l.name for l in pm.lines] == [l.name for l in pr.lines]
            assert {k: v for k, v in pm.event_names.items()} == {
                m.id: (m.display_name or m.name)
                for m in pr.event_metadata.values()
            }
            for lm, lr in zip(pm.lines, pr.lines):
                assert len(lm.events) == len(lr.events)
                assert sum(e.duration_ps for e in lm.events) == sum(
                    e.duration_ps for e in lr.events
                )


def test_format_report_memory_column_and_share_semantics():
    """Memory column renders; async rows are 'ovl' and container rows 'agg',
    and neither inflates the share denominator (the round-2 report counted
    546ms of overlapped DMA windows as 41% 'share')."""
    rows = [
        xplane.OpRow("async-copy", "Async XLA Ops", 100, 500_000_000_000),
        xplane.OpRow("5", "Steps", 1, 300_000_000_000),
        xplane.OpRow(
            "fusion.1", "XLA Ops", 3, 90_000_000_000,
            bytes_accessed=16 * 1024 * 1024, category="fusion",
        ),
        xplane.OpRow("fusion.2", "XLA Ops", 3, 10_000_000_000),
    ]
    text = xplane.format_report(rows, top=10)
    lines = {l.split()[0]: l for l in text.splitlines() if l and l[0] != "#"}
    assert "ovl" in lines["async-copy"]
    assert "agg" in lines["5"]
    assert "90.00%" in lines["fusion.1"] and "16.0MB" in lines["fusion.1"]
    assert "10.00%" in lines["fusion.2"]


def test_event_metadata_stats_parsed_from_real_trace():
    """The round-2 committed TPU trace carries bytes_accessed stats; the
    parser must surface them (guards the XStat wire-format decoding)."""
    import pathlib

    trace = pathlib.Path("/root/repo/result/jax-trace-train")
    files = xplane.find_xplane_files(trace) if trace.exists() else []
    if not files:
        pytest.skip("round-2 TPU trace not present")
    planes = []
    for f in files:
        planes.extend(xplane.parse_xspace(f))
    dev = [p for p in planes if "/device:TPU" in p.name]
    assert dev
    stats = [s for p in dev for s in p.event_stats.values()]
    assert any("bytes_accessed" in s for s in stats)
    assert any(
        isinstance(s.get("bytes_accessed"), int) and s["bytes_accessed"] > 0
        for s in stats
    )
