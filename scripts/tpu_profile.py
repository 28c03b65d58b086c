#!/usr/bin/env python
"""Per-kernel TPU profiling — analog of ``scripts/cuda_profile.sh`` (nvprof
kernel-time summation). Captures an xplane trace of the headline pipeline
with jax.profiler and reports per-op device times, or falls back to
slope-timing when the profiler plugin is unavailable over the tunnel."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", "-w", type=int, default=4096)
    # 0 = auto (128 on TPU). A literal 32 here once gated every px kernel
    # off and produced a 4x-slow dog_sat "regression" that wasn't one.
    p.add_argument("--tile", "-t", type=int, default=0)
    p.add_argument("--trace-dir", default="/tmp/recfilter_trace")
    p.add_argument("--app", default="", help="time_app registry name "
                   "(default: the bench headline filter)")
    p.add_argument("--precision", default="")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _build_filter, slope_ms_per_iter

    if ns.precision:
        from recfilter_tpu import planner

        planner.set_default_matmul_precision(ns.precision)
    if ns.app:
        from time_app import _apps

        entry = _apps(ns.width, ns.width, ns.tile)[ns.app]
        fn = entry[0]()
    else:
        F = _build_filter(ns.width, ns.width, tile=ns.tile)
        fn = F.as_func()
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((ns.width, ns.width)) * 0.01,
        dtype=jnp.float32,
    )

    ms = slope_ms_per_iter(fn, img)
    mpix = ns.width * ns.width / 1e6
    print(f"pipeline: {ms:.3f} ms/iter  {mpix/ms*1000:.0f} Mpix/s")

    try:
        with jax.profiler.trace(ns.trace_dir):
            jax.block_until_ready(jax.jit(fn)(img))
        print(f"xplane trace written to {ns.trace_dir}")
    except Exception as e:  # tunnel targets may lack the profiler plugin
        print(f"(profiler trace unavailable: {e})")


if __name__ == "__main__":
    main()
