"""Parse a JAX profiler xplane.pb and print per-op device-time stats.

The environment's tensorboard_plugin_profile is incompatible with the
installed protobuf (descriptor-codegen mismatch), so this implements the
few fields we need of the XSpace wire format directly (protobuf wire
parsing only — varints + length-delimited submessages, no codegen).

Schema subset (tsl/profiler/protobuf/xplane.proto):
  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; repeated XEvent events=4;
             string display_name=11; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; string display_name=4; }

Usage:
  python tools/bench/xplane_stats.py <trace_dir_or_xplane.pb> [--top N]

Prints one row per op name aggregated over the TPU device plane's
"XLA Ops" lines: total self-time ms, count, and a coarse category.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


# --- minimal protobuf wire reader -----------------------------------------


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


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.

    value is int for varint/fixed, bytes for length-delimited.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at {pos}")
        yield field, wire, val


# --- xplane walking ---------------------------------------------------------


def parse_event(buf: bytes) -> tuple[int, int]:
    mid = dur = 0
    for field, _, val in iter_fields(buf):
        if field == 1:
            mid = val
        elif field == 3:
            dur = val
    return mid, dur


def parse_line(buf: bytes) -> tuple[str, list[bytes]]:
    name = ""
    events: list[bytes] = []
    for field, _, val in iter_fields(buf):
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 11 and val:
            name = val.decode("utf-8", "replace")
        elif field == 4:
            events.append(val)
    return name, events


def parse_stat(buf: bytes) -> tuple[int, object]:
    """XStat { int64 metadata_id=1; double=2 / uint64=3 / int64=4 /
    string=5 / bytes=6 / uint64 ref=7 }."""
    mid = 0
    val: object = None
    for field, wire, v in iter_fields(buf):
        if field == 1:
            mid = v
        elif field == 5:
            val = v.decode("utf-8", "replace")
        elif field in (2, 3, 4, 6, 7):
            val = v
    return mid, val


def parse_event_metadata(buf: bytes) -> tuple[int, str, str, list[bytes]]:
    mid = 0
    name = ""
    display = ""
    stats: list[bytes] = []
    for field, _, val in iter_fields(buf):
        if field == 1:
            mid = val
        elif field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 4:
            display = val.decode("utf-8", "replace")
        elif field == 5:
            stats.append(val)
    return mid, display or name, name, stats


def parse_plane(buf: bytes):
    """Returns (plane_name, line_bufs, {event_metadata_id: OpMeta}).

    OpMeta is (display_name, hlo_category, source, full_hlo_text) — the
    category and source come from the XEventMetadata's XStat list, keyed
    through the plane's stat_metadata name table ('hlo_category',
    'source'); the full HLO text (field 2, the instruction dump with
    shapes) is kept for --hlo inspection of the top ops."""
    name = ""
    lines: list[bytes] = []
    raw_meta: dict[int, bytes] = {}
    stat_names: dict[int, str] = {}
    for field, _, val in iter_fields(buf):
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3:
            lines.append(val)
        elif field == 4:
            # map entry { int64 key=1; XEventMetadata value=2; }
            key = 0
            meta = b""
            for f2, _, v2 in iter_fields(val):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    meta = v2
            raw_meta[key] = meta
        elif field == 5:
            # map entry { int64 key=1; XStatMetadata value=2; }
            key = 0
            meta = b""
            for f2, _, v2 in iter_fields(val):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    meta = v2
            sname = ""
            for f3, _, v3 in iter_fields(meta):
                if f3 == 2:
                    sname = v3.decode("utf-8", "replace")
            stat_names[key] = sname
    metadata: dict[int, tuple[str, str, str, str]] = {}
    for key, meta in raw_meta.items():
        mid, mname, full, stats = parse_event_metadata(meta)
        cat = src = ""
        for sbuf in stats:
            smid, sval = parse_stat(sbuf)
            sname = stat_names.get(smid, "")
            if sname == "hlo_category" and isinstance(sval, str):
                cat = sval
            elif sname == "source" and isinstance(sval, str):
                src = sval
        metadata[key or mid] = (mname, cat, src, full)
    return name, lines, metadata


def categorize(op: str) -> str:
    low = op.lower()
    if "flash" in low or "pallas" in low or "custom-call" in low:
        return "pallas/custom"
    if "conv" in low:
        return "conv"
    if "dot" in low or "einsum" in low or "matmul" in low:
        return "matmul"
    if "convert" in low:
        return "convert"
    if "reduce" in low or "norm" in low:
        return "reduce/norm"
    if "dynamic" in low or "slice" in low or "pad" in low or "concat" in low:
        return "datamove"
    if "copy" in low or "transpose" in low or "reshape" in low or "bitcast" in low:
        return "datamove"
    if "fusion" in low or "add" in low or "mul" in low or "sub" in low:
        return "elementwise/fusion"
    return "other"


def collect(path: str, device_only: bool = True):
    """Aggregate device-plane 'XLA Ops' self time per op.

    Returns {op_name: (ms, count, hlo_category, source, full_hlo)}."""
    with open(path, "rb") as f:
        space = f.read()
    per_op: dict[str, list] = {}
    for field, _, plane_buf in iter_fields(space):
        if field != 1:
            continue
        pname, lines, metadata = parse_plane(plane_buf)
        is_device = pname.startswith("/device:TPU") and "SparseCore" not in pname
        if device_only and not is_device:
            continue
        for line_buf in lines:
            lname, events = parse_line(line_buf)
            # exact match: 'Async XLA Ops' is the DMA line whose events
            # overlap compute — adding it double-counts the step
            if lname != "XLA Ops":
                continue
            for ev in events:
                mid, dur_ps = parse_event(ev)
                name, cat, src, full = metadata.get(mid, (f"op#{mid}", "", "", ""))
                row = per_op.setdefault(name, [0.0, 0, cat, src, full])
                row[0] += dur_ps / 1e9  # ps -> ms
                row[1] += 1
    return per_op


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 40
    show_hlo = "--hlo" in sys.argv
    by_source = "--by-source" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    path = find_xplane(args[0] if args else "/tmp/jax_trace")
    per_op = collect(path)

    total = sum(row[0] for row in per_op.values())
    by_cat: dict[str, float] = defaultdict(float)
    for op, (ms, _, cat, _, _) in per_op.items():
        by_cat[cat or categorize(op)] += ms

    print(f"xplane: {path}")
    print(f"total device op time: {total:.2f} ms\n")
    print("by hlo category:")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28} {ms:9.2f} ms  {100 * ms / total:5.1f}%")

    if by_source:
        by_src: dict[str, float] = defaultdict(float)
        for op, (ms, _, _, src, _) in per_op.items():
            by_src[src or "<no source>"] += ms
        print(f"\ntop {top} source lines:")
        for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms  {src[:130]}")
        return

    print(f"\ntop {top} ops:")
    for op, (ms, n, cat, src, full) in sorted(
        per_op.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        loc = f"  [{src.rsplit('/', 1)[-1]}]" if src else ""
        print(f"  {ms:9.3f} ms  x{n:<5} {cat:<18} {op[:80]}{loc}")
        if show_hlo:
            print(f"      {full[:360]}")


if __name__ == "__main__":
    main()
