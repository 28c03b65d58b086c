#!/usr/bin/env python
"""Summarize per-op device time from a ``jax.profiler.trace`` dir.

The nvprof-summation analog (``scripts/cuda_profile.sh:20-37``) for TPU:
parses the newest ``*.trace.json.gz`` under the trace dir and prints the
top ops by total device time on the TPU op tracks.

    python scripts/tpu_profile.py -w 4096 --trace-dir /tmp/tr
    python scripts/xplane_summary.py /tmp/tr [top_n]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/recfilter_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        sys.exit(f"no trace.json.gz under {d}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # process/thread names identify the device op tracks
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        tname = tid_names.get((ev["pid"], ev["tid"]), "")
        if "Steps" in tname or "step" in tname:
            continue
        tot[ev["name"]] += ev.get("dur", 0) / 1e3  # us -> ms
        cnt[ev["name"]] += 1
    if not tot:
        sys.exit(f"no TPU op events in {path} (pids: {pid_names})")
    print(f"== {path} (total {sum(tot.values()):.3f} ms) ==")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {ms:8.3f} ms  x{cnt[name]:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
