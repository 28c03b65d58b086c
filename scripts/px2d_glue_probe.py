#!/usr/bin/env python
"""Round-5 headline probe: carry-glue form and kernel block geometry.

The 4K px6 device step decomposes as final2d 0.319 ms (≈94% of the
MEASURED MXU rate — scripts/int8_rate_probe.py's 172 TFLOP/s pallas bf16,
not the nameplate 197), moments 0.094 (≈ its read floor), and 0.059 ms of
carry-glue fusions (xplane r5: NA solve 19µs, GN 8µs, term-add 7µs,
NB solve 17µs, relayout copies 9µs). This sweeps the remaining knobs in
ONE process (same-process A/B, compile cache shared):

  * RECFILTER_PX2D_GLUE 0/1 — classic two-einsum GN/term2 chain vs the
    single three-operand einsum with slot-prepadded Gb (no pad op, no GN
    relayout).
  * RECFILTER_PX2D_LB — final2d row-block (2048 default vs 4096: half the
    grid steps, half the per-step constant refetch).
  * RECFILTER_PXM_LB — moments lane block.

    nohup python scripts/px2d_glue_probe.py > /tmp/px2d_glue.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    import jax.numpy as jnp

    from bench import _build_filter, slope_ms_per_iter

    h = w = 4096
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((h, w)) * 0.01,
        dtype=jnp.float32,
    )

    variants = [
        {"RECFILTER_PX2D_GLUE": "0"},
        {"RECFILTER_PX2D_GLUE": "1"},
        {"RECFILTER_PX2D_GLUE": "1", "RECFILTER_PX2D_LB": "4096"},
        {"RECFILTER_PX2D_GLUE": "1", "RECFILTER_PXM_LB": "2048"},
        {"RECFILTER_PX2D_GLUE": "0", "RECFILTER_PX2D_LB": "4096"},
    ]
    keys = ["RECFILTER_PX2D_GLUE", "RECFILTER_PX2D_LB", "RECFILTER_PXM_LB"]
    for v in variants:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(v)
        F = _build_filter(h, w, tile=128)
        fn = F.as_func()
        ms = slope_ms_per_iter(fn, img, per_body=8)
        print(json.dumps({"variant": v, "ms": round(ms, 4),
                          "mpix_s": round(h * w / ms / 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
