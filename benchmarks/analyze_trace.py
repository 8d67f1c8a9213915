"""Aggregate device-op durations from a jax.profiler trace.

Usage: python benchmarks/analyze_trace.py TRACE_DIR [top_n]

Reads the Perfetto trace (plugins/profile/*/... .trace.json.gz) written by
jax.profiler.trace and prints per-op-category and per-op total device time —
the ground truth for "where do the milliseconds go" (round-2 verdict item 3:
audit the train-step backward).
"""

import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace(root):
    hits = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".trace.json.gz") or f.endswith("trace.json.gz"):
                hits.append(os.path.join(dirpath, f))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {root}")
    return max(hits, key=os.path.getmtime)


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        base = n
    else:
        base = n
    for pat, cat in [
        (r"while", "while(scan)"),
        (r"convolution|conv", "conv"),
        (r"dot|gemm|matmul", "matmul"),
        (r"custom-call.*mosaic|tpu_custom_call", "pallas"),
        (r"all-reduce|all-gather|reduce-scatter|collective", "collective"),
        (r"copy|transpose|reshape|bitcast", "layout"),
        (r"reduce", "reduce"),
        (r"scatter|gather|dynamic", "gather/scatter"),
        (r"fusion", "fusion(elementwise)"),
    ]:
        if re.search(pat, base):
            return cat
    return "other"


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pick pids whose name mentions TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"tpu|device|/device", n, re.I)}
    if not device_pids:
        device_pids = set(pid_names)

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        if dur <= 0:
            continue
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device-op time: {total/1000:.1f} ms "
          f"(all iterations in the trace)")
    print("\nby category:")
    for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:22s} {t/1000:9.2f} ms  {100*t/max(total,1e-9):5.1f}%")
    print(f"\ntop {top_n} ops:")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {t/1000:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
