"""trace_census parsing — the device-trace gate bench.py --full and the
3D probes rely on (VERDICT r4 #5). The parser is pinned against a
hand-built chrome-trace file (deterministic; no profiler needed)."""
import gzip
import json
import os

from cvssl_tpu.utils.trace_census import parse_trace, wall_vs_trace


def _write_trace(root, events):
    d = os.path.join(root, "plugins", "profile", "2026_08_20")
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_parse_trace_aggregates_tpu_pids_only(tmp_path):
    ev = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host"}},
        # enclosing events: excluded from total, reported as containers
        {"ph": "X", "pid": 7, "name": "jit_steps_fn", "dur": 50_000},
        {"ph": "X", "pid": 7, "name": "while", "dur": 49_000},
        {"ph": "X", "pid": 7, "name": "fusion.12", "dur": 30_000},
        {"ph": "X", "pid": 7, "name": "fusion.12", "dur": 10_000},
        {"ph": "X", "pid": 7, "name": "convolution.3", "dur": 5_000},
        # host-pid event must NOT count
        {"ph": "X", "pid": 9, "name": "fusion.99", "dur": 99_000},
    ]
    _write_trace(str(tmp_path), ev)
    c = parse_trace(str(tmp_path))
    assert c["total_ms"] == 45.0            # 30 + 10 + 5 (us -> ms)
    assert c["containers_ms"] == {"jit_steps_fn": 50.0, "while": 49.0}
    assert c["cats"] == {"fusion": 40.0, "convolution": 5.0}
    assert c["ops"]["fusion.12"] == 40.0


def test_parse_trace_none_without_file(tmp_path):
    assert parse_trace(str(tmp_path)) is None


def test_wall_vs_trace_flags():
    ok = wall_vs_trace(110.0, 100.0)
    assert not ok["trace_disagrees"] and ok["wall_vs_trace"] == 1.1
    stall = wall_vs_trace(150.0, 100.0)   # tunnel stall inflating wall
    assert stall["trace_disagrees"]
    scope = wall_vs_trace(70.0, 100.0)    # mis-scoped trace window
    assert scope["trace_disagrees"]
