#!/usr/bin/env python
"""A/B: sublane tile height Ta of the 3-touch px executor (4K px6 headline).

The dim-A completion's MXU cost scales linearly with Ta (T MACs per output
pixel); only Tb is pinned to the 128-lane quantum. Smaller Ta trades A-side
MXU products against more grid steps, skinnier moments dots, and a longer
carry chain (na grows).

    python scripts/ta_sweep.py [width] [ta_list]

Env knobs are read at trace time, so one process measures every config with
the slope-timing harness (run-to-run drift cancels).
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
    tas = (sys.argv[2] if len(sys.argv) > 2 else "128,64,32").split(",")
    import jax.numpy as jnp

    from bench import _build_filter, slope_ms_per_iter

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((w, w)) * 0.01, jnp.float32
    )
    for ta in tas:
        os.environ["RECFILTER_PX2D_TA"] = ta
        F = _build_filter(w, w, tile=128)
        fn = F.as_func()
        ms = slope_ms_per_iter(fn, img, per_body=4)
        print(
            json.dumps(
                {
                    "Ta": int(ta),
                    "width": w,
                    "ms": round(ms, 4),
                    "gpix_s": round(w * w / ms / 1e9, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
