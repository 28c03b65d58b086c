#!/usr/bin/env python
"""A/B: 3-touch px overlapped 2-D path vs the 5-touch rotation-chained px
pipeline, on the shipping gaussian3 headline filter.

    python scripts/px_overlap_exp.py [width] [precision]

Measures both executors (dimfuse._OVERLAP_PX_2D flipped at trace time) with
the slope-timing harness; one process, two remote compiles.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    prec = sys.argv[2] if len(sys.argv) > 2 else "px6"
    import jax.numpy as jnp

    from bench import _build_filter, slope_ms_per_iter
    from recfilter_tpu import dimfuse, planner

    planner.set_default_matmul_precision(prec)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01, jnp.float32
    )
    modes = os.environ.get("PX_EXP_MODES", "fused,chain").split(",")
    for mode in modes:
        dimfuse._OVERLAP_PX_2D = mode == "fused"
        dimfuse._MOMENTS_CHAIN = mode == "moments"
        F = _build_filter(w, w, tile=128)
        fn = F.as_func()
        ms = slope_ms_per_iter(fn, img, per_body=4)
        print(
            json.dumps(
                {
                    "mode": mode,
                    "precision": prec,
                    "width": w,
                    "ms": round(ms, 4),
                    "gpix_s": round(w * w / ms / 1e6, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
