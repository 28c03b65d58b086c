#!/usr/bin/env python
"""Same-process A/B of the USM routes in throughput mode (4K, default).

The round-4 app sweep left an anomaly: fused USM in throughput mode
measures 0.66 ms while its underlying staged cascade measures 0.35 —
and px6 fused USM (6x the MXU work) beats it at 0.51. A pointwise
combine must not cost 0.3-0.75 ms. Variants isolate where the cost is:

  cascade    staged gaussian_3x_3y, no combine        (baseline ~0.35)
  usm_self   staged + epilogue-style combine(blur, blur) — pointwise on
             the blur only, no second input stream
  usm_naive  staged + combine(blur, image) as its own stage (README 1.10)
  usm_epi    staged, combine as the LAST stage's as_func epilogue (0.66)
  usm_fc     fuse_cascade(fc, epilogue=combine) — the px-gated route,
             forced at default precision

Run on the chip (one process, ~5 compiles):
    python scripts/usm_route_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

W = int(os.environ.get("USM_PROBE_W", "4096"))
WEIGHT = 1.0


def main():
    import jax
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    from recfilter_tpu import apps, planner
    from recfilter_tpu.api import fuse_cascade

    planner.set_default_matmul_precision("default")

    def combine(blur, image):
        return (1.0 + WEIGHT) * image - WEIGHT * blur

    def build_cascade():
        fc = apps.gaussian_3x_3y(W, W, 0)
        fns = [f.as_func() for f in fc]

        def fn(v):
            for f in fns:
                v = f(v)
            return v

        return fn

    def build_usm_self():
        fc = apps.gaussian_3x_3y(W, W, 0)
        fns = [f.as_func() for f in fc[:-1]]
        # Non-collapsible self-only epilogue (advisor r4): `2*b - 0.5*b`
        # folds to one scale at trace/XLA time, so it under-measured the
        # control. tanh keeps a genuine extra VPU op while still reading
        # only the dot output — the control isolates the second-input
        # stream cost, which is the thing the real combine adds.
        last = fc[-1].as_func(epilogue=lambda b: 2.0 * b - 0.5 * jnp.tanh(b))

        def fn(v):
            b = v
            for f in fns:
                b = f(b)
            return last(b)

        return jax.jit(fn)

    def build_usm_naive():
        return jax.jit(apps.unsharp_mask(W, W, 0, fused=False))

    def build_usm_epi():
        fc = apps.gaussian_3x_3y(W, W, 0)
        fns = [f.as_func() for f in fc[:-1]]
        last = fc[-1].as_func(epilogue=combine)

        def fn(v):
            b = v
            for f in fns:
                b = f(b)
            return last(b, v)

        return jax.jit(fn)

    def build_usm_fc():
        fc = apps.gaussian_3x_3y(W, W, 0)
        fn = fuse_cascade(fc, epilogue=combine)
        return jax.jit(lambda image: fn(image, image))

    variants = {
        "cascade": build_cascade,
        "usm_self": build_usm_self,
        "usm_naive": build_usm_naive,
        "usm_epi": build_usm_epi,
        "usm_fc": build_usm_fc,
    }

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((W, W)) * 0.01, jnp.float32
    )
    for name, build in variants.items():
        fn = build()
        ms = slope_ms_per_iter(fn, img, scale=1e-2, per_body=4)
        print(
            json.dumps({"variant": name, "ms": round(ms, 4), "w": W}),
            flush=True,
        )


if __name__ == "__main__":
    main()
