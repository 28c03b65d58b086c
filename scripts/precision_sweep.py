#!/usr/bin/env python
"""Accuracy + throughput sweep of the matmul precision modes on the chip.

For each mode: (a) max relative error of a single gaussian3 realize vs the
numpy oracle (measured ON DEVICE — the bf16-dot behavior this sweep is
about only exists on the TPU MXU), (b) slope-timed ms/iter on a 4K image.
One JSON line per mode. Run detached (remote compiles take minutes each):

    nohup python scripts/precision_sweep.py > /tmp/prec_sweep.log 2>&1 &

The compensated split-bf16 modes (f32x3/f32x4/f32x6, dimfuse._split_einsum)
exist to close VERDICT r1 item #1: the reference checks float32 SNR
(``lib/recfilter.h:793-855``) and runs float32 throughout
(``lib/split.cpp:59-60``); XLA's HIGHEST costs ~2.7x, the default 1-pass
bf16 dot fails the bar at ~1e-2.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

MODES = ("default", "f32x3", "f32x4", "f32x6", "high", "highest")


def main():
    import jax
    import jax.numpy as jnp

    from bench import slope_ms_per_iter
    from recfilter_tpu import apps, planner, scan_core

    p = argparse.ArgumentParser()
    p.add_argument("modes", nargs="*", default=None)
    p.add_argument("--acc-width", type=int, default=1024)
    p.add_argument("--perf-width", type=int, default=4096)
    ns = p.parse_args()

    w_acc, w_perf = ns.acc_width, ns.perf_width
    rng = np.random.default_rng(0)
    img_acc = rng.standard_normal((w_acc, w_acc)).astype(np.float32)
    img_perf = jnp.asarray(
        rng.standard_normal((w_perf, w_perf)) * 0.01, jnp.float32
    )

    # Oracle once (numpy, float64 accumulate under the hood).
    planner.set_default_matmul_precision("highest")
    F_acc = apps.gaussian_3xy(w_acc, w_acc, 128)
    ref = scan_core.oracle_apply(F_acc.spec, img_acc)
    scale = np.abs(ref).max()

    modes = ns.modes or MODES
    for mode in modes:
        planner.set_default_matmul_precision(mode)

        F = apps.gaussian_3xy(w_acc, w_acc, 128)
        out = np.asarray(F.as_func()(jnp.asarray(img_acc)))
        err = float(np.abs(out - ref).max() / scale)

        Fp = apps.gaussian_3xy(w_perf, w_perf, 128)
        ms = slope_ms_per_iter(Fp.as_func(), img_perf, scale=0.5, per_body=4)
        print(
            json.dumps(
                {
                    "mode": mode,
                    "max_rel_err": err,
                    "ms_per_iter_4k": round(ms, 4),
                    "mpix_s": round(w_perf * w_perf / 1e6 / ms * 1000.0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
