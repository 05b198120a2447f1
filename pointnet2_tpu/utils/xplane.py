"""Dependency-free XSpace (.xplane.pb) parser + per-op profile report.

The reference's benchmark.py emits a per-op time/memory table via
tf.profiler (`tf-profile.txt`, /root/reference/benchmark.py:26-54). JAX's
profiler writes XSpace protobufs instead; this module decodes them with a
minimal protobuf wire-format reader (no tensorflow / protobuf dependency) and
renders the equivalent table: op name, occurrences, total/avg time, share of
device time, sorted by total time.

Schema (tsl/profiler/protobuf/xplane.proto):
    XSpace:  planes=1 (repeated XPlane)
    XPlane:  id=1, name=2, lines=3 (repeated XLine),
             event_metadata=4 (map<int64, XEventMetadata>), stat_metadata=5
    XLine:   id=1, name=2, timestamp_ns=3, events=4 (repeated XEvent)
    XEvent:  metadata_id=1, offset_ps=2, duration_ps=3, num_occurrences=5
    XEventMetadata: id=1, name=2, display_name=4
    XStatMetadata:  id=1, name=2
    XStat:   metadata_id=1, double=2, uint64=3, int64=4, str=5, bytes=6, ref=7
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Iterator


# -- protobuf wire format ----------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) from a serialized message."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            size, pos = _read_varint(buf, pos)
            val = buf[pos : pos + size]
            pos += size
        elif wire == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


# -- XSpace decoding ---------------------------------------------------------


@dataclasses.dataclass
class XEvent:
    metadata_id: int = 0
    offset_ps: int = 0
    duration_ps: int = 0
    num_occurrences: int = 0


@dataclasses.dataclass
class XLine:
    name: str = ""
    events: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class XPlane:
    name: str = ""
    lines: list = dataclasses.field(default_factory=list)
    event_names: dict = dataclasses.field(default_factory=dict)  # id -> name
    # id -> {stat_name: value} from XEventMetadata.stats (e.g. per-op
    # "bytes_accessed" / "flops" / "hlo_category" on TPU device planes).
    event_stats: dict = dataclasses.field(default_factory=dict)
    stat_names: dict = dataclasses.field(default_factory=dict)  # id -> name


def _parse_event(buf: bytes) -> XEvent:
    ev = XEvent()
    for field, _, val in _fields(buf):
        if field == 1:
            ev.metadata_id = val
        elif field == 2:
            ev.offset_ps = val
        elif field == 3:
            ev.duration_ps = val
        elif field == 5:
            ev.num_occurrences = val
    return ev


def _parse_line(buf: bytes) -> XLine:
    line = XLine()
    for field, _, val in _fields(buf):
        if field == 2:
            line.name = val.decode("utf-8", "replace")
        elif field == 4:
            line.events.append(_parse_event(val))
    return line


def _parse_stat(buf: bytes) -> tuple[int, object]:
    """XStat -> (stat_metadata_id, value)."""
    import struct

    meta_id, value = 0, None
    for field, _, val in _fields(buf):
        if field == 1:
            meta_id = val
        elif field == 2:  # double
            value = struct.unpack("<d", val)[0]
        elif field in (3, 4, 7):  # uint64 / int64 / ref
            value = val
        elif field == 5:  # str
            value = val.decode("utf-8", "replace")
        elif field == 6:  # bytes
            value = val
    return meta_id, value


def _parse_event_metadata(buf: bytes) -> tuple[int, str, list]:
    """map entry: key=1 (id), value=2 (XEventMetadata). Returns raw stats
    as (stat_metadata_id, value) pairs — names resolve after the plane's
    stat_metadata map is fully parsed (field order is not guaranteed)."""
    meta_id, name, display = 0, "", ""
    raw_stats: list = []
    for field, _, val in _fields(buf):
        if field == 1:
            meta_id = val
        elif field == 2:
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
                elif f2 == 4:
                    display = v2.decode("utf-8", "replace")
                elif f2 == 5:
                    raw_stats.append(_parse_stat(v2))
    return meta_id, display or name, raw_stats


def _parse_stat_metadata(buf: bytes) -> tuple[int, str]:
    """map entry: key=1 (id), value=2 (XStatMetadata{id=1, name=2})."""
    meta_id, name = 0, ""
    for field, _, val in _fields(buf):
        if field == 1:
            meta_id = val
        elif field == 2:
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return meta_id, name


def _parse_plane(buf: bytes) -> XPlane:
    plane = XPlane()
    raw_event_stats: dict = {}
    for field, _, val in _fields(buf):
        if field == 2:
            plane.name = val.decode("utf-8", "replace")
        elif field == 3:
            plane.lines.append(_parse_line(val))
        elif field == 4:
            meta_id, name, raw_stats = _parse_event_metadata(val)
            plane.event_names[meta_id] = name
            if raw_stats:
                raw_event_stats[meta_id] = raw_stats
        elif field == 5:
            sid, sname = _parse_stat_metadata(val)
            plane.stat_names[sid] = sname
    for meta_id, raw in raw_event_stats.items():
        plane.event_stats[meta_id] = {
            plane.stat_names.get(sid, f"#{sid}"): v for sid, v in raw
        }
    return plane


def parse_xspace(path: str | pathlib.Path) -> list[XPlane]:
    buf = pathlib.Path(path).read_bytes()
    planes = []
    for field, _, val in _fields(buf):
        if field == 1:
            planes.append(_parse_plane(val))
    return planes


# -- per-op aggregation (tf-profile.txt equivalent) --------------------------


@dataclasses.dataclass
class OpRow:
    name: str
    line: str
    count: int
    total_ps: int
    # Requested HBM traffic per execution (XLA cost analysis, from the
    # event-metadata "bytes_accessed" stat) — the reference's per-op memory
    # column (/root/reference/benchmark.py:44-54 time_and_memory).
    bytes_accessed: int = 0
    category: str = ""
    # Attribution: the "source" (file:line) or "tf_op" (jaxpr scope path)
    # stat, so fusion.N rows map back to model code.
    origin: str = ""

    @property
    def total_ms(self) -> float:
        return self.total_ps / 1e9

    @property
    def avg_us(self) -> float:
        return self.total_ps / max(self.count, 1) / 1e6

    @property
    def is_async(self) -> bool:
        """Events on async lines are DMA issue->completion WINDOWS that
        overlap compute (and each other); their durations must not be read
        as exclusive device time."""
        return "Async" in self.line

    @property
    def total_bytes(self) -> int:
        return self.bytes_accessed * self.count


def aggregate_ops(
    planes: list[XPlane], plane_filter: str = "", line_filter: str = ""
) -> list[OpRow]:
    """Aggregate event durations by op name, sorted by total time descending.

    plane_filter/line_filter: substring filters (e.g. "TPU", "XLA Ops").
    """
    rows: dict[tuple[str, str], OpRow] = {}
    for plane in planes:
        if plane_filter and plane_filter not in plane.name:
            continue
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                name = plane.event_names.get(ev.metadata_id, f"#{ev.metadata_id}")
                key = (name, line.name)
                row = rows.get(key)
                occurrences = max(int(ev.num_occurrences), 1)
                if row is None:
                    stats = plane.event_stats.get(ev.metadata_id, {})
                    ba = stats.get("bytes_accessed", 0)
                    cat = stats.get("hlo_category", "")
                    src = stats.get("source", "")
                    tf_op = stats.get("tf_op", "")
                    if isinstance(src, str) and src:
                        # keep package-relative tail: pkg/module.py:line
                        origin = "/".join(src.split("/")[-2:])
                    elif isinstance(tf_op, str) and tf_op:
                        origin = "/".join(tf_op.rstrip(":").split("/")[-3:])
                    else:
                        origin = ""
                    rows[key] = OpRow(
                        name,
                        line.name,
                        occurrences,
                        ev.duration_ps,
                        bytes_accessed=int(ba) if isinstance(ba, int) else 0,
                        category=cat if isinstance(cat, str) else "",
                        origin=origin,
                    )
                else:
                    row.count += occurrences
                    row.total_ps += ev.duration_ps
    return sorted(rows.values(), key=lambda r: -r.total_ps)


def find_xplane_files(trace_dir: str | pathlib.Path) -> list[pathlib.Path]:
    return sorted(pathlib.Path(trace_dir).rglob("*.xplane.pb"))


def device_plane_filter(planes: list[XPlane]) -> str:
    """Pick the accelerator plane if present, else the host plane."""
    for token in ("/device:TPU", "/device:GPU"):
        if any(token in p.name for p in planes):
            return token
    return ""


def _fmt_bytes(n: int) -> str:
    if n <= 0:
        return "-"
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024.0
    return f"{n:.1f}GB"


def format_report(
    rows: list[OpRow], top: int = 60, title: str = "per-op profile"
) -> str:
    """Render the tf-profile.txt-style table: time AND memory per op
    (reference parity: /root/reference/benchmark.py:44-54 time_and_memory).

    ``mem/call`` is XLA's cost-analysis bytes_accessed (requested HBM
    traffic per execution). Rows on Async lines are flagged ``ovl``: their
    durations are DMA issue->completion windows that OVERLAP compute and
    each other, so they are excluded from the share denominator — a 40%+
    "async-copy share" in earlier reports was this double-counting, not
    stalled device time.
    """
    # exclusive device-time rows: the "XLA Ops" line, minus async DMA
    # windows. "Steps" / "XLA Modules" rows are CONTAINERS whose spans
    # double-count their member ops — as do control-flow HLOs on the op
    # line itself (a `while` over the lax.map chunk loop spans its whole
    # body, whose ops are listed separately). CPU traces have no "XLA Ops"
    # line at all — there, every non-async row counts (nothing is
    # double-counted within one line).
    _CONTAINER_CATEGORIES = {"while", "conditional", "call", "fusion loop"}
    has_op_line = any("XLA Ops" in r.line and not r.is_async for r in rows)

    def _is_op(r):
        if r.is_async or r.category in _CONTAINER_CATEGORIES:
            return False
        return "XLA Ops" in r.line if has_op_line else True

    sync_ps = sum(r.total_ps for r in rows if _is_op(r)) or 1
    out = [
        f"# {title}",
        "",
        f"{'op':60s} {'line':>18s} {'count':>8s} {'total_ms':>10s} "
        f"{'avg_us':>10s} {'mem/call':>10s} {'share':>7s}",
    ]
    for r in rows[:top]:
        name = r.name if len(r.name) <= 60 else r.name[:57] + "..."
        if r.is_async:
            share = "   ovl "
        elif not _is_op(r):
            share = "   agg "
        else:
            share = f"{100 * r.total_ps / sync_ps:6.2f}%"
        out.append(
            f"{name:60s} {r.line[:18]:>18s} {r.count:8d} {r.total_ms:10.3f} "
            f"{r.avg_us:10.1f} {_fmt_bytes(r.bytes_accessed):>10s} {share}"
            + (f"  {r.origin[:48]}" if r.origin else "")
        )
    if len(rows) > top:
        rest = sum(r.total_ps for r in rows[top:] if _is_op(r))
        out.append(
            f"{'... ' + str(len(rows) - top) + ' more ops':60s} "
            f"{'':>18s} {'':>8s} {rest / 1e9:10.3f} {'':>10s} {'':>10s} "
            f"{100 * rest / sync_ps:6.2f}%"
        )
    out.append("")
    out.append(
        "# share denominator = exclusive 'XLA Ops' device time. 'ovl' rows: "
        "async DMA windows (issue->completion), overlapped with compute and "
        "each other. 'agg' rows: container spans (Steps / XLA Modules) that "
        "double-count their member ops."
    )
    return "\n".join(out) + "\n"


def write_op_report(
    trace_dir: str | pathlib.Path,
    out_path: str | pathlib.Path,
    line_filter: str = "",
    top: int = 60,
) -> list[OpRow]:
    """Parse every xplane file under trace_dir and write the per-op table.

    Returns the aggregated rows (device plane preferred). Equivalent of the
    reference's tf-profile.txt (/root/reference/benchmark.py:44-54).
    """
    files = find_xplane_files(trace_dir)
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    planes: list[XPlane] = []
    for f in files:
        planes.extend(parse_xspace(f))
    pfilter = device_plane_filter(planes)
    rows = aggregate_ops(planes, plane_filter=pfilter, line_filter=line_filter)
    title = (
        f"per-op profile — planes matching '{pfilter or 'all'}'"
        f"{', lines matching ' + repr(line_filter) if line_filter else ''}"
        f" — from {len(files)} xplane file(s)"
    )
    pathlib.Path(out_path).write_text(format_report(rows, top=top, title=title))
    return rows
