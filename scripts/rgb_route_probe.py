#!/usr/bin/env python
"""Same-process A/B of the RGB (leading-batch) gaussian routes (4K).

The round-4 sweep shows gaussian3_rgb at default costing 1.25 ms for 3
planes — 1.5x three independent single-plane runs (3 x 0.28 = 0.84).
The batch DOES fold into ``fused_2d_px``'s grid (verified by spy on
CPU), so the folded executor itself carries the overhead. Variants:

  folded   the shipping route: leading c folds into the kernel grid
  loop     jit of a python loop over the 3 planes (3 independent
           single-plane 3-touch pipelines in one program)
  vmap     jax.vmap of the single-plane fn over the leading axis

Precision from RGB_PROBE_PREC (default: "default").

    python scripts/rgb_route_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

W = int(os.environ.get("RGB_PROBE_W", "4096"))
PREC = os.environ.get("RGB_PROBE_PREC", "default")


def main():
    import jax
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    from recfilter_tpu import apps, planner

    planner.set_default_matmul_precision(PREC)

    def build_folded():
        return apps.gaussian_3xy_rgb(W, W, 0).as_func()

    def build_loop():
        fn1 = apps.gaussian_3xy(W, W, 0).as_func()

        def fn(v):
            return jnp.stack([fn1(v[i]) for i in range(3)])

        return jax.jit(fn)

    def build_vmap():
        fn1 = apps.gaussian_3xy(W, W, 0).as_func()
        return jax.jit(jax.vmap(fn1))

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, W, W)) * 0.01,
        jnp.float32,
    )
    for name, build in [("folded", build_folded), ("loop", build_loop),
                        ("vmap", build_vmap)]:
        try:
            fn = build()
            ms = slope_ms_per_iter(fn, img, scale=0.5, per_body=4)
        except Exception as e:  # vmap-of-pallas may be unsupported
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
            continue
        print(
            json.dumps(
                {"variant": name, "ms": round(ms, 4), "w": W, "prec": PREC}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
