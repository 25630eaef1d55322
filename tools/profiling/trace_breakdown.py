"""Summarize a jax.profiler trace into a per-component time breakdown.

    python tools/profiling/trace_breakdown.py artifacts/trace_cbspheres

Parses the trace-viewer JSON (trace.json.gz) written by jax.profiler and
sums TPU-op durations grouped by kernel/fusion name — the source of the
BENCH_NOTES step-breakdown tables (r03 CBbunny; r04 CBspheres, VERDICT
item #6).
"""

import collections
import glob
import gzip
import json
import os
import sys


def classify(name: str) -> str:
    n = name.lower()
    if "clustered" in n or "tri_closest" in n:
        return "intersect kernels (pallas)"
    if "brute" in n or "intersect" in n:
        return "brute intersect kernel"
    if "sort" in n:
        return "sort"
    if "threefry" in n or "pcg" in n or "rng" in n:
        return "rng"
    if "scatter" in n:
        return "splat scatter"
    if "fusion" in n or "multiply" in n or "add" in n or "reduce" in n:
        return "fusions (MIS/connections/shading)"
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trace"
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace.json.gz under", trace_dir)
        sys.exit(1)
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device-side complete events: pid groups named like "/device:TPU:0";
    # only the "XLA Ops" thread lane holds leaf ops (the "XLA Modules" /
    # "Steps" lanes are umbrella spans duplicating their children)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "Device" in n}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and "args" in e and "XLA Ops" in e["args"].get("name", "")}

    # SELF time per op: control-flow ops (while/conditional bodies) appear
    # as spans CONTAINING their body ops on the same lane — stack-walk the
    # intervals and charge each parent only its non-child time
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        lanes[(e.get("pid"), e.get("tid"))].append(
            (e.get("ts", 0), e.get("dur", 0), e.get("name", "?")))

    by_class = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda x: (x[0], -x[1]))
        stack = []   # (end_ts, name, child_time_accum_index)
        child_time = []
        for ts, dur, name in lane:
            while stack and ts >= stack[-1][0]:
                end, nm, ci = stack.pop()
                self_s = (child_time[ci][0] - child_time[ci][1]) / 1e6
                by_class[classify(nm)] += self_s
                by_name[nm] += self_s
                total += self_s
            if stack:
                child_time[stack[-1][2]][1] += dur
            child_time.append([dur, 0])
            stack.append((ts + dur, name, len(child_time) - 1))
        while stack:
            end, nm, ci = stack.pop()
            self_s = (child_time[ci][0] - child_time[ci][1]) / 1e6
            by_class[classify(nm)] += self_s
            by_name[nm] += self_s
            total += self_s

    print(f"total device op time: {total:.3f} s "
          f"({len(files)} trace files, using {os.path.basename(files[-1])})")
    for k, v in by_class.most_common():
        print(f"  {k:44s} {v:8.3f} s  {100*v/max(total,1e-9):5.1f}%")
    print("\ntop ops:")
    for k, v in by_name.most_common(14):
        print(f"  {v:8.3f} s  {100*v/max(total,1e-9):5.1f}%  {k[:90]}")


if __name__ == "__main__":
    main()
