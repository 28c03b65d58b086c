#!/usr/bin/env python
"""Xplane-trace the gaussian3 pipeline at a given matmul precision and
report per-op device-time buckets (where does HIGHEST's premium go?).

    nohup python scripts/trace_precision.py highest > /tmp/trace_prec.log 2>&1 &
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="highest")
    p.add_argument("--width", "-w", type=int, default=4096)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace-dir", default="/tmp/trace_prec")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recfilter_tpu import apps, planner

    planner.set_default_matmul_precision(ns.mode)
    F = apps.gaussian_3xy(ns.width, ns.width, 128)
    fn = F.as_func()

    @jax.jit
    def loop(x, n):
        def body(i, v):
            return 0.5 * fn(v)

        out = jax.lax.fori_loop(0, n, body, x)
        return out[0, 0] + out[-1, -1]

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((ns.width, ns.width)) * 0.01,
        jnp.float32,
    )
    print(float(loop(img, jnp.int32(2))), flush=True)  # compile + warm
    with jax.profiler.trace(ns.trace_dir):
        print(float(loop(img, jnp.int32(ns.iters))), flush=True)

    # Parse the trace: sum device-op durations by name.
    paths = glob.glob(os.path.join(ns.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    buckets = collections.Counter()
    counts = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            buckets[e["name"]] += e["dur"]
            counts[e["name"]] += 1
    total = sum(buckets.values())
    print(f"\ntotal device us: {total}  (~{total/ns.iters/1000:.3f} ms/iter)")
    for name, us in buckets.most_common(25):
        print(f"{us/ns.iters:10.1f} us/iter  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
