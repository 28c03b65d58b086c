#!/usr/bin/env python
"""Round-3 precision-ladder refresh: px3/px4/bf16-storage gaussian3 4K
(the 3-touch executor now carries all of them). One process, 3 compiles."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    from recfilter_tpu import apps, planner

    w = 4096
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01, jnp.float32
    )
    for mode in ("px3", "px4"):
        planner.set_default_matmul_precision(mode)
        fn = apps.gaussian_3xy(w, w, 128).as_func()
        ms = slope_ms_per_iter(fn, img, per_body=8)
        print(json.dumps({"mode": mode, "ms": round(ms, 4)}), flush=True)
    planner.set_default_matmul_precision("px6")
    F = apps.gaussian_3xy(w, w, 128)
    F._dtype = "bfloat16"
    import dataclasses

    F._spec = dataclasses.replace(F._spec, dtype="bfloat16")
    fn = F.as_func()
    ms = slope_ms_per_iter(fn, img.astype(jnp.bfloat16), per_body=8)
    print(json.dumps({"mode": "bf16-storage", "ms": round(ms, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
