#!/usr/bin/env python
"""3-D volumetric benchmark: 3rd-order Gaussian IIR on a 256^3 volume.

Exercises the n-D rotation-chaining executor (all three dims scanned as
the trailing axis group — see ``dimfuse._last_axis_pass_t``). Slope-timed
inside one jit like ``bench.py`` (see its docstring for why).
Measured on one v5e chip: 0.668 ms = 25.1 Gvox/s (throughput mode).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", "-n", type=int, default=256)
    p.add_argument("--tile", "-t", type=int, default=128)
    p.add_argument("--sigma", type=float, default=5.0)
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    import recfilter_tpu as rf
    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    n = ns.size
    wts = rf.gaussian_weights(ns.sigma, 3)
    b0, a = float(wts[0]), tuple(float(v) for v in wts[1:])
    scans = []
    for ax in range(3):
        scans.append(Scan(ax, True, b0, a))
        scans.append(Scan(ax, False, b0, a))
    spec = FilterSpec(
        "Gaussian3D", (Dim("z", n), Dim("y", n), Dim("x", n)),
        tuple(scans), tile_widths=(ns.tile,) * 3,
    )

    def fn(v):
        return dimfuse.apply_filter_fused(spec, v, matmul_precision="default")

    @jax.jit
    def loop(x, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), x)
        return out[0, 0, 0] + out[-1, -1, -1]

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n, n)) * 0.01,
        jnp.float32,
    )
    t0 = time.time()
    float(loop(img, jnp.int32(1)))
    print(f"compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    def timed(k):
        t0 = time.perf_counter()
        s = float(loop(img, jnp.int32(k)))
        assert np.isfinite(s)
        return (time.perf_counter() - t0) * 1000.0

    rough = max((timed(64) - timed(2)) / 62.0, 1e-4)
    spread = int(min(max(80.0 / rough, 50), 20000))
    slopes = []
    for _ in range(3):
        t1, t2 = timed(2), timed(2 + spread)
        slopes.append((t2 - t1) / spread)
    ms = float(np.median(slopes))
    print(json.dumps({
        "metric": f"gaussian3_vol{n}_gvox_s",
        "value": round(n ** 3 / ms / 1e9 * 1e3, 2),
        "unit": "Gvox/s",
        "ms_per_iter": round(ms, 3),
    }))


if __name__ == "__main__":
    main()
