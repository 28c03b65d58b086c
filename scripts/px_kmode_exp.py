#!/usr/bin/env python
"""A/B: final2d_px/moments2d_px kernel modes on the 4K px6 headline.

    python scripts/px_kmode_exp.py [width] [configs]

configs: comma-separated ``fmode:mmode[:lb]`` triples (kernel mode for
final2d, moments mode, optional final2d lane-block cap). Env knobs are
read at trace time, so one process measures every config with the
slope-timing harness (run-to-run drift cancels).
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
    cfgs = (sys.argv[2] if len(sys.argv) > 2 else "0:0,3:0,3:1,3:1:4096"
            ).split(",")
    import jax.numpy as jnp

    from bench import _build_filter, slope_ms_per_iter

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01, jnp.float32
    )
    for cfg in cfgs:
        parts = cfg.split(":")
        os.environ["RECFILTER_PX2D_KMODE"] = parts[0]
        os.environ["RECFILTER_PXM_KMODE"] = parts[1]
        os.environ["RECFILTER_PX2D_LB"] = parts[2] if len(parts) > 2 else "2048"
        F = _build_filter(w, w, tile=128)
        fn = F.as_func()
        ms = slope_ms_per_iter(fn, img, per_body=4)
        print(
            json.dumps(
                {
                    "cfg": cfg,
                    "width": w,
                    "ms": round(ms, 4),
                    "gpix_s": round(w * w / ms / 1e9, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
