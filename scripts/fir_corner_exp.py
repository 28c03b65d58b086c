#!/usr/bin/env python
"""A/B: fir_band corner-dot decomposition vs full-window neighbour dots,
box1 at both precision grades (one process, 4 compiles).

    python scripts/fir_corner_exp.py [width]
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
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    from recfilter_tpu import apps, planner

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01, jnp.float32
    )
    for prec in ("default", "px6"):
        planner.set_default_matmul_precision(prec)
        for fw in ("0", "1"):
            os.environ["RECFILTER_FIR_FULLWIN"] = fw
            fn = apps.box_filter_order_1(w, w, 5, 128)[0]
            ms = slope_ms_per_iter(fn, img, scale=1e-7, per_body=4)
            print(json.dumps({"prec": prec, "fullwin": fw,
                              "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
