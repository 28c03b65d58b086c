"""Sharded-vs-unsharded headline on the real chip (VERDICT r3 #2).

Runs the 4K gaussian3 px6 headline through BOTH the plain executor and a
1-device-mesh shard_map (the only mesh this environment exposes) — the
sharded path must ride the SAME shipping 3-touch px executor, so the two
must land within ~10% of each other.

    python scripts/sharded_headline.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _build_filter, slope_ms_per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from recfilter_tpu.parallel import sharding
    from recfilter_tpu.planner import Plan

    h = w = 4096
    F = _build_filter(h, w, tile=128)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((h, w)) * 0.01,
        dtype=jnp.float32,
    )

    fn_plain = F.as_func()
    mesh = sharding.make_mesh((1,), ("data",))
    fn_shard = sharding.make_sharded_filter(
        F.spec, Plan(), mesh, data_axis=0
    )

    def row(name, fn):
        t0 = time.time()
        ms = slope_ms_per_iter(fn, img, per_body=8)
        print(f"{name}: {ms:.3f} ms  {h * w / ms / 1e3:.0f} Mpix/s  "
              f"(compile+measure {time.time() - t0:.0f}s)", flush=True)

    row("unsharded", fn_plain)
    row("sharded-1dev", fn_shard)

    # Round-5 (VERDICT r4 #3): the SEQ-sharded route on the same 1-device
    # mesh — RECFILTER_SEQ1_PROBE forces the full seq machinery (the
    # hook-seeded 3-touch executor with a D=1 exchange) so its real
    # overhead vs the plain executor is on the clock. The env is set ONLY
    # after the rows above are measured: tracing happens at first call,
    # and the probe flag would otherwise reroute the data row too.
    import os

    os.environ["RECFILTER_SEQ1_PROBE"] = "1"
    mesh_s = sharding.make_mesh((1,), ("seq",))
    fn_seq = sharding.make_sharded_filter(
        F.spec, Plan(), mesh_s, seq_axis=1
    )
    row("seq-sharded-1dev", fn_seq)


if __name__ == "__main__":
    main()
