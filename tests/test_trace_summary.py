"""tools/trace_summary.py: minimal protobuf wire parsing on a hand-built
XSpace fixture (no tensorflow/xprof needed)."""

import io
import struct
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import trace_summary as ts


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes) -> bytes:
    tag = _varint((num << 3) | wt)
    if wt == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _msg(num: int, payload: bytes) -> bytes:
    return _field(num, 2, payload)


def _event(metadata_id: int, duration_ps: int) -> bytes:
    return _field(1, 0, _varint(metadata_id)) + _field(3, 0, _varint(duration_ps))


def _event_metadata(mid: int, name: str) -> bytes:
    inner = _field(1, 0, _varint(mid)) + _field(2, 2, name.encode())
    return _msg(2, inner)  # map entry value


def build_xspace() -> bytes:
    # plane "/device:TPU:0" with metadata {1: %fusion.1, 2: %copy.2, 3: %while.9}
    meta = _msg(4, _event_metadata(1, "%fusion.1 = f32[8,128] fusion(...)"))
    meta += _msg(4, _event_metadata(2, "%copy.2 = f32[8,128] copy(...)"))
    meta += _msg(4, _event_metadata(3, "%while.9 = (...) while(...)"))
    # "XLA Modules" line (umbrella, must be ignored when XLA Ops exists)
    mod_line = _field(2, 2, b"XLA Modules") + _msg(4, _event(3, 999_000_000))
    # "XLA Ops" line: fusion 3x 2000ps, copy 1x 1000ps, while (filtered) 500ps
    ops_line = _field(2, 2, b"XLA Ops")
    for _ in range(3):
        ops_line += _msg(4, _event(1, 2000))
    ops_line += _msg(4, _event(2, 1000))
    ops_line += _msg(4, _event(3, 500))
    plane = _field(2, 2, b"/device:TPU:0") + meta + _msg(3, mod_line) + _msg(3, ops_line)
    return _msg(1, plane)


def test_parse_xspace_totals(tmp_path):
    pb = tmp_path / "t.xplane.pb"
    pb.write_bytes(build_xspace())
    planes = ts.parse_xspace(str(pb))
    assert len(planes) == 1
    name, totals, lines = planes[0]
    assert name == "/device:TPU:0"
    assert lines == ["XLA Modules", "XLA Ops"]
    # umbrella while filtered out, module line ignored
    assert set(totals) == {"%fusion.1 = f32[8,128] fusion(...)", "%copy.2 = f32[8,128] copy(...)"}
    assert totals["%fusion.1 = f32[8,128] fusion(...)"] == [6000, 3]
    assert totals["%copy.2 = f32[8,128] copy(...)"] == [1000, 1]


def test_category():
    assert ts.category("%fusion.12 = ...") == "fusion"
    assert ts.category("%copy-start.7 = ...") == "copy/relayout"
    assert ts.category("%convolution.3 = ...") == "conv"
    assert ts.category("%custom-call.1 = ...") == "custom-call"


def test_cli_output(tmp_path, capsys):
    pb = tmp_path / "t.xplane.pb"
    pb.write_bytes(build_xspace())
    ts.main([str(tmp_path), "--top", "5"])
    out = capsys.readouterr().out
    assert "plane: /device:TPU:0" in out
    assert "%fusion.1" in out
    assert "fusion 85.7%" in out  # 6000/7000
