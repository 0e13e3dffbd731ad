#!/usr/bin/env python
"""Profile the bench train step and print a per-op time breakdown.

Runs the same PromptSRC step as bench.py under jax.profiler.trace, then
parses the Chrome trace (works through the axon tunnel) and aggregates
X-phase event durations by op name.  Usage:

    python tools/profile_bench.py [trace_dir]       # default /tmp/fsvlm_prof
    python tools/profile_bench.py --parse-only DIR  # re-parse an old trace
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def parse_trace(trace_dir, top=40):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print(f"no trace under {trace_dir}")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # TPU device "XLA Ops" lanes only: other device threads ("Steps",
    # "XLA Modules") carry whole-run envelope events that would swamp the
    # per-op aggregation
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "Device" in name:
                dev_pids.add(ev["pid"])
    op_lanes = set()
    for ev in trace["traceEvents"]:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("pid") in dev_pids
                and "XLA Ops" in ev.get("args", {}).get("name", "")):
            op_lanes.add((ev["pid"], ev.get("tid")))
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if op_lanes:
            if (ev.get("pid"), ev.get("tid")) not in op_lanes:
                continue
        elif dev_pids and ev.get("pid") not in dev_pids:
            continue
        d = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        durs[name] += d
        counts[name] += 1
        total += d
    print(f"parsed {paths[-1]}")
    print(f"{'op':<72} {'ms':>9} {'n':>5} {'%':>6}")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:72]:<72} {d:9.2f} {counts[name]:5d} {100*d/max(total,1e-9):5.1f}%")
    print(f"{'TOTAL (sum of device X events)':<72} {total:9.2f}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--parse-only":
        parse_trace(sys.argv[2])
        return
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsvlm_prof"
    os.environ.setdefault("BENCH_STEPS", "10")
    os.environ.setdefault("BENCH_LADDER", "0")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import bench

    # warm up/compile happens inside bench.main(); trace only a short run
    with jax.profiler.trace(trace_dir):
        bench.main()
    parse_trace(trace_dir)


if __name__ == "__main__":
    main()
