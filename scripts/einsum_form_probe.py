#!/usr/bin/env python
"""Time the exact einsum forms dimfuse uses, per precision, on chip.

Decomposes where Precision.HIGHEST loses its 3x vs the default mode: the
bare 2-D dot costs only +20% at HIGHEST (scripts/pallas_split_matmul.py),
so the suspects are the composite forms — rotated-emit output ordering,
the G-tails contraction, the small-contraction Rcat injection.

Methodology: each form is timed as ``v + eps * form(v).sum()`` inside the
slope loop — the sum-reduce and the elementwise add cost the same across
precisions, so differences isolate the form's own cost. ``B_inplace`` is
also timed bare (self-composable) as the anchor.

    nohup python scripts/einsum_form_probe.py > /tmp/einsum_probe.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recfilter_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_ms_per_iter

W, T, S = 4096, 128, 8
n = W // T
PRECS = {"default": None, "highest": jax.lax.Precision.HIGHEST}


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((W, n, T)) * 0.01).astype(np.float32))
    B = jnp.asarray((rng.standard_normal((T, T)) / 12.0).astype(np.float32))
    G = jnp.asarray((rng.standard_normal((S, T)) * 0.1).astype(np.float32))
    R = jnp.asarray((rng.standard_normal((T, S)) * 0.1).astype(np.float32))
    Nc = jnp.asarray((rng.standard_normal((W, n, S)) * 0.01).astype(np.float32))

    def run(name, fn, bare=False):
        if bare:
            ms = slope_ms_per_iter(fn, x, scale=0.5)
        else:
            def fn2(v):
                return v * 0.5 + 1e-30 * fn(v).sum()

            ms = slope_ms_per_iter(fn2, x, scale=1.0)
        print(json.dumps({"form": name, "ms": round(ms, 4)}), flush=True)

    # Constant overhead reference: elementwise + scalar broadcast only.
    run("overhead_ref", lambda v: v[0, 0, :2], bare=False)

    for pname, prec in PRECS.items():
        kw = dict(preferred_element_type=jnp.float32, precision=prec)
        run(f"B_inplace[{pname}]",
            lambda v, kw=kw: jnp.einsum("os,qns->qno", B, v, **kw), bare=True)
        run(f"B_rot[{pname}]",
            lambda v, kw=kw: jnp.einsum("os,qns->noq", B, v, **kw))
        run(f"G_tails[{pname}]",
            lambda v, kw=kw: jnp.einsum("ks,qns->qnk", G, v, **kw))
        run(f"R_inject_rot[{pname}]",
            lambda v, kw=kw: jnp.einsum(
                "ok,qnk->noq", R, Nc + 1e-30 * v[..., :S], **kw))
        run(f"B_plus_R_rot[{pname}]",
            lambda v, kw=kw: (
                jnp.einsum("os,qns->noq", B, v, **kw)
                + jnp.einsum("ok,qnk->noq", R, Nc + 1e-30 * v[..., :S], **kw)
            ))


if __name__ == "__main__":
    main()
