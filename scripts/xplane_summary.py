#!/usr/bin/env python
"""Summarize per-op device time from a ``jax.profiler.trace`` xplane dir.

The nvprof-summation analog (``scripts/cuda_profile.sh:20-37``) for TPU:
parses the newest ``*.xplane.pb`` under the trace dir, finds the TPU device
plane, and prints the top ops by total device time.

    python scripts/tpu_profile.py -w 4096 --trace-dir /tmp/tr
    python scripts/xplane_summary.py /tmp/tr [top_n]
"""

import glob
import os
import sys
from collections import defaultdict


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/recfilter_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {d}")
    path = max(paths, key=os.path.getmtime)
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        if not tot:
            continue
        print(f"== {plane.name} (total {sum(tot.values()):.3f} ms) ==")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:8.3f} ms  x{cnt[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
