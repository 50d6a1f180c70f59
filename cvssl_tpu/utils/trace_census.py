"""Device-trace census: per-op TPU time attribution from a
``jax.profiler.trace`` capture.

This is the repo's trustworthy-measurement primitive (CLAUDE.md): through
the tunneled TPU relay, wall-clock readings drift +-15-30% with transient
stalls, while the profiler's /device:TPU X-events time the hardware
directly and are immune to tunnel jitter. Every perf adjudication goes
through this; wall-clock is only the dispatch/fetch overhead check.

Reference analog: none (the torch reference never profiles); the census
doubles as the regression gate VERDICT r4 item 5 asked for on the 3D and
sliding-window paths.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile
import time
from typing import Callable, Optional


def parse_trace(trace_root: str) -> Optional[dict]:
    """Aggregate the newest ``*.trace.json.gz`` under ``trace_root``.

    Returns {"total_ms": device-time sum over the traced window,
             "containers_ms": {name: ms} for enclosing events (the jitted
             program / scan loop — each spans the window, excluded from
             total), "cats": {category: ms}, "ops": {hlo_name: ms}} or
    None if no trace file was written (e.g. profiler unsupported)."""
    paths = sorted(glob.glob(os.path.join(trace_root, "**/*.trace.json.gz"),
                             recursive=True))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        ev = json.load(f).get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e["name"]] += e.get("dur", 0)  # microseconds
    containers = {n: agg[n] / 1e3 for n in list(agg)
                  if n.startswith(("jit_", "while", "body", "condition"))
                  or n.isdigit()}
    for n in containers:
        del agg[n]
    cats = collections.Counter()
    for name, d in agg.items():
        m = re.match(r"([a-zA-Z_\-]+)", name)
        cats[m.group(1) if m else name] += d
    return {"total_ms": sum(agg.values()) / 1e3,
            "containers_ms": containers,
            "cats": {k: v / 1e3 for k, v in cats.items()},
            "ops": {k: v / 1e3 for k, v in agg.most_common()}}


def traced_device_ms(run_and_sync: Callable[[], None],
                     trace_dir: Optional[str] = None) -> Optional[dict]:
    """Run ``run_and_sync`` (which must VALUE-FETCH its result — through the
    relay only a fetch is an honest sync) under the profiler and return
    parse_trace of the capture. None if tracing failed — callers treat the
    census as optional and fall back to wall-clock."""
    import jax
    out = trace_dir or tempfile.mkdtemp(prefix="trace_census_")
    try:
        with jax.profiler.trace(out):
            run_and_sync()
        time.sleep(2)  # the trace file lands asynchronously
        return parse_trace(out)
    except Exception:
        return None


def wall_vs_trace(wall_ms: float, device_ms: float,
                  tol: float = 0.15) -> dict:
    """Cross-check fields for bench records: wall-clock should exceed
    device time by at most dispatch overhead; >``tol`` disagreement in
    EITHER direction flags the reading (tunnel stall inflating wall, or a
    mis-scoped trace window)."""
    ratio = wall_ms / device_ms if device_ms > 0 else float("inf")
    return {"device_ms": round(device_ms, 3),
            "wall_ms": round(wall_ms, 3),
            "wall_vs_trace": round(ratio, 3),
            "trace_disagrees": not (1.0 - tol <= ratio <= 1.0 + tol)}
