#!/usr/bin/env python
"""Tiled vs non-tiled comparison — the analog of the reference's external
baseline runs (``scripts/profile_non_tiled_gpu.sh``: NVIDIA SDK / Thrust
comparators). Here the non-tiled baseline is our own ``lax.scan`` executor
(sequential along the scan axis, the best a scan-style implementation does
on TPU), against the tiled ``dimfuse`` path."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", "-w", type=int, default=2048)
    p.add_argument("--tile", "-t", type=int, default=128)
    ns = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from bench import _build_filter, slope_ms_per_iter
    from recfilter_tpu import dimfuse, scan_core

    w = ns.width
    spec = _build_filter(w, w, tile=ns.tile).spec
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01,
        dtype=jnp.float32,
    )

    ms_tiled = slope_ms_per_iter(
        lambda v: dimfuse.apply_filter_fused(spec, v), img
    )
    print(f"tiled   : {ms_tiled:.3f} ms  {w*w/ms_tiled/1000:.0f} Mpix/s")
    ms_scan = slope_ms_per_iter(
        lambda v: scan_core.apply_filter(spec, v), img, min_window_ms=200.0
    )
    print(f"nontiled: {ms_scan:.3f} ms  {w*w/ms_scan/1000:.0f} Mpix/s  "
          f"(speedup {ms_scan/ms_tiled:.1f}x)")


if __name__ == "__main__":
    main()
