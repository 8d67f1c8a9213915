"""Join a device trace with compiled-HLO metadata: time per source line.

Usage: python benchmarks/trace_source_map.py TRACE_DIR HLO_DUMP.txt [top_n]

For every device op event in the trace, looks up its HLO definition in the
dump (by op name) and aggregates total device time by (source_file:line,
op_name prefix). Parent/wrapper events (jit_*, numbered iterations, while
bodies) are skipped so leaves sum to ~the real device time.
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
            if f.endswith("trace.json.gz"):
                hits.append(os.path.join(dirpath, f))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {root}")
    return max(hits, key=os.path.getmtime)


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    # HLO: op name -> (source, op_name hint, shape)
    meta = {}
    pat = re.compile(r"^\s*%([\w.\-]+) = ([^ ]+)")
    mpat = re.compile(
        r'op_name="([^"]*)".*?source_file="([^"]*)".*?source_line=(\d+)')
    with open(hlo_path) as f:
        for line in f:
            m = pat.match(line)
            if not m:
                continue
            name, shape = m.group(1), m.group(2)
            mm = mpat.search(line)
            if mm:
                src = f"{os.path.basename(mm.group(2))}:{mm.group(3)}"
                opn = mm.group(1)
            else:
                src, opn = "?", "?"
            meta[name] = (src, opn, shape[:44])

    path = find_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and re.search(r"TPU|device|/device",
                              str(e.get("args", {}).get("name", "")), re.I)):
            pids.add(e.get("pid"))

    skip = re.compile(r"^(jit_|\d+$|while\.?\d*$|copy-start|copy-done)")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    grand = 0.0
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        name = e.get("name", "")
        if skip.match(name):
            continue
        dur = e.get("dur", 0) / 1000.0
        key = name
        tot[key] += dur
        cnt[key] += 1
        grand += dur

    print(f"trace: {path}")
    print(f"total leaf device time: {grand:.1f} ms (all steps)")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]
    by_src = defaultdict(float)
    print(f"{'ms':>9} {'n':>4}  {'op':<44} {'shape':<40} src | op_name")
    for name, ms in rows:
        src, opn, shape = meta.get(name, ("?", "?", "?"))
        by_src[src] += ms
        print(f"{ms:9.2f} {cnt[name]:4d}  {name:<44.44} {shape:<40.40} "
              f"{src} | {opn[-70:]}")
    print("\nby source line (top ops only):")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f}  {src}")


if __name__ == "__main__":
    main()
