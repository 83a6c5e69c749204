#!/usr/bin/env python
"""Summarize a jax.profiler trace: top ops by device self-time.

Parses the ``*.xplane.pb`` a `jax.profiler.start_trace/stop_trace` capture
writes (via ``utils.profiling.trace``) with a minimal protobuf wire-format
reader — no tensorflow/xprof dependency — and prints, per device plane,
the top-k event types by total duration with their share of device time.

The reference has no profiling story at all (SURVEY §5.1); here a capture
plus this summary is the standard "where did the step time go" loop:

  with profiling.trace("/tmp/prof"):  # or tools/bench_train.py BENCH_TRACE=1
      step()
  python tools/trace_summary.py /tmp/prof --top 25
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

# ---------------------------------------------------------------- wire format


def _read_varint(buf: memoryview, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a serialized message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # fixed64
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


# ------------------------------------------------------------- xplane schema
# XSpace.planes = 1; XPlane.name = 2, .lines = 3, .event_metadata = 4 (map);
# XLine.events = 4, .name = 2; XEvent.metadata_id = 1, .duration_ps = 3;
# XEventMetadata.id = 1, .name = 2.


def _parse_event_metadata(mv):
    """XPlane.event_metadata map entry -> (id, name)."""
    meta_id, name = 0, ""
    for f, _, v in _fields(mv):
        if f == 2:  # value: XEventMetadata
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    meta_id = v2
                elif f2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return meta_id, name


def _parse_line(mv):
    """XLine -> (line_name, [(metadata_id, duration_ps)])."""
    name = ""
    events = []
    for f, _, v in _fields(mv):
        if f == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 11 and not name:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 4:  # XEvent
            mid, dur = 0, 0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            events.append((mid, dur))
    return name, events


def parse_plane(mv):
    """XPlane -> (plane_name, {event_name: (total_ps, count)}, line_names)."""
    plane_name = ""
    meta = {}
    lines = []
    for f, _, v in _fields(mv):
        if f == 2:
            plane_name = bytes(v).decode("utf-8", "replace")
        elif f == 4:
            mid, name = _parse_event_metadata(v)
            meta[mid] = name
        elif f == 3:
            lines.append(_parse_line(v))
    # Umbrella events ("XLA Modules" line, jit_* wrappers) span the whole
    # program and async copies overlap compute: summing every line double
    # counts.  Keep only the op-level line when present.
    op_lines = [ev for lname, ev in lines if lname == "XLA Ops"]
    use = op_lines if op_lines else [ev for _, ev in lines]
    totals = defaultdict(lambda: [0, 0])
    for events in use:
        for mid, dur in events:
            name = meta.get(mid, f"#{mid}")
            # control-flow umbrellas contain their body ops' events; their
            # duration double-counts every child
            low = name.lstrip("%")
            if low.startswith(("while", "conditional", "jit_", "jit(")):
                continue
            t = totals[name]
            t[0] += dur
            t[1] += 1
    return plane_name, totals, [lname for lname, _ in lines]


def parse_xspace(path: str):
    with open(path, "rb") as f:
        data = memoryview(f.read())
    planes = []
    for f_, _, v in _fields(data):
        if f_ == 1:
            planes.append(parse_plane(v))
    return planes


# ------------------------------------------------------------------ reporting

_CATEGORIES = (
    ("convolution", "conv"),
    ("fusion", "fusion"),
    ("dot", "matmul"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("reduce-scatter", "collective"),
    ("copy", "copy/relayout"),
    ("transpose", "copy/relayout"),
    ("dynamic-update-slice", "dus"),
    ("custom-call", "custom-call"),
    ("scatter", "scatter"),
    ("reduce", "reduce"),
)


def category(name: str) -> str:
    low = name.lower()
    for key, cat in _CATEGORIES:
        if key in low:
            return cat
    return "other"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir", help="dir passed to profiling.trace (or an .xplane.pb)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--plane", default="TPU", help="substring of the device plane name")
    args = ap.parse_args(argv)

    path = args.trace_dir
    if os.path.isdir(path):
        pbs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
        if not pbs:
            sys.exit(f"no .xplane.pb under {path}")
        path = pbs[-1]
    print(f"# {path}")

    shown = False
    for plane_name, totals, _ in parse_xspace(path):
        if args.plane.lower() not in plane_name.lower():
            continue
        if not totals:
            continue
        shown = True
        device_ps = sum(t[0] for t in totals.values())
        print(f"\n== plane: {plane_name}  (total event time {device_ps/1e9:.3f} ms)")
        by_cat = defaultdict(float)
        for name, (ps, _cnt) in totals.items():
            by_cat[category(name)] += ps
        cats = ", ".join(
            f"{c} {100*v/device_ps:.1f}%" for c, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        )
        print(f"   by category: {cats}")
        print(f"   {'time ms':>9}  {'%':>5}  {'count':>6}  op")
        for name, (ps, cnt) in sorted(totals.items(), key=lambda kv: -kv[1][0])[: args.top]:
            print(f"   {ps/1e9:9.3f}  {100*ps/device_ps:5.1f}  {cnt:6d}  {name[:110]}")
    if not shown:
        names = [p[0] for p in parse_xspace(path)]
        sys.exit(f"no plane matching {args.plane!r}; planes: {names}")


if __name__ == "__main__":
    main()
