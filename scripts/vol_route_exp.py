#!/usr/bin/env python
"""A/B: 3-D volume through rows-pass + 3-touch 2-D executor vs the
rotation chain (dimfuse._OVERLAP_PX_2D flipped at trace time).

    python scripts/vol_route_exp.py [size] [precisions]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    precs = (sys.argv[2] if len(sys.argv) > 2 else "px6,default").split(",")
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    import recfilter_tpu as rf
    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    wts = rf.gaussian_weights(5.0, 3)
    b0, a = float(wts[0]), tuple(float(v) for v in wts[1:])
    scans = []
    for ax in range(3):
        scans.append(Scan(ax, True, b0, a))
        scans.append(Scan(ax, False, b0, a))
    spec = FilterSpec(
        "Gaussian3D", (Dim("z", n), Dim("y", n), Dim("x", n)),
        tuple(scans), tile_widths=(128,) * 3,
    )
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n, n)) * 0.01,
        jnp.float32)
    for prec in precs:
        for route in ("rows2d", "chain"):
            dimfuse._OVERLAP_PX_2D = route == "rows2d"
            try:
                fn = (lambda pr: lambda v: dimfuse.apply_filter_fused(
                    spec, v, matmul_precision=pr))(prec)
                ms = slope_ms_per_iter(fn, img, per_body=4)
            finally:
                dimfuse._OVERLAP_PX_2D = True
            print(json.dumps({"prec": prec, "route": route, "size": n,
                              "ms": round(ms, 4),
                              "gvox_s": round(n**3 / ms / 1e6, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
