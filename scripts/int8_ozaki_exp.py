"""int8-Ozaki dual-completion prototype — the VERDICT r3 #1 experiment.

The px6 true-f32 completion costs 6 single-pass bf16 MXU products per
dense dot (2 dots per pixel in the 2-D pipeline = 12). The int8 route
slices the f32 mantissa into four 7-bit int8 slices (constants pre-sliced
free at trace time), keeps the product levels i+j <= 3 (10 int8 products,
exact int32 accumulation, dropped level ~2^-28), and rides the MXU's 2x
int8 rate (scripts/int8_rate_probe.py: 342 vs 172 TOP/s in pallas) —
10 products / 2 = 5 bf16-equivalents vs px6's 6.

What this measures: the A-dot + per-sub-tile B-dot structure of
kernels/final2d._final_px_kernel (mode 0) at the real 4K geometry
(Ta=Tb=128, Lb=2048), carries omitted (identical tiny cost either way):

  * px6 twin   — 3-chunk bf16 splits, 6-pair concat dots (the shipping
    scheme's product schedule).
  * int8 Ozaki — per-block power-of-2 scale (bit-twiddled exponent),
    4x int8 mantissa slices, per-level contiguous stacked dots, exact
    int32 accumulation, f32 recombination.

Cost model it tests: int8 MXU saves ~17% of product time, but the VPU
slicing is ~2-3x the bf16 split cost (4 round/sub/scale chains + level
recombination vs 3 casts/2 subs) AND must run twice (x and the VMEM
intermediate z). The verdict decides whether the headline takes the
int8 route or records the measured loss (ROADMAP).

Run: python scripts/int8_ozaki_exp.py          (TPU, ~2 remote compiles)
     RECFILTER_PLATFORM=cpu ... --check-only   (interpret-mode accuracy)

MEASURED VERDICT (v5e-class chip, 2026-08-20): the int8 route LOSES.
  accuracy (interpret, 2048 block): px6 2.04e-7, int8 1.14e-7 max rel err
    (exact int32 accumulation is actually MORE accurate than px6);
  time (4K dual completion):        px6 0.382 ms, int8 0.564 ms.
The 2x MXU rate is real (rate probe: 342 vs 172 TOP/s) but buys only
10/12 = 17% of product time, while the runtime costs the scheme adds are
structural: 4-slice round/sub/scale chains on x AND on the VMEM
intermediate z (vs px6's 3-cast/2-sub splits), int32->f32 conversion +
scaled add per level, and 4 separate small-K level dots per completion
(levels cannot share one dot — their int32 accumulations carry different
binary scales, and no integral per-slice pre-scaling can unify them:
a_i + b_j = 7(3-i-j) has no non-negative solution). The px6 headline
keeps the 6-product bf16 scheme; this script stays as the reproducible
A/B (VERDICT r3 #1 resolution).
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def _prods6():
    return [(0, 2), (1, 1), (2, 0), (0, 1), (1, 0), (0, 0)]


def _split_const_np(M, nchunks):
    import ml_dtypes

    rem = np.asarray(M, np.float64)
    out = []
    for _ in range(nchunks):
        c = rem.astype(np.float32).astype(ml_dtypes.bfloat16)
        out.append(c)
        rem = rem - c.astype(np.float64)
    return out


def _int8_const_np(M, nslices=4):
    """Trace-time int8 slicing of a constant matrix: one global power-of-2
    scale, 7-bit slices s_i with M = eB * sum_i s_i * 2^(21-7i) * 2^-27
    (round-to-nearest residuals, float64-exact bookkeeping)."""
    M = np.asarray(M, np.float64)
    m = np.abs(M).max()
    e = int(np.ceil(np.log2(m))) if m > 0 else 0
    eB = 2.0 ** e  # |M/eB| <= 1
    xs = M / eB * (2.0 ** 27)
    slices = []
    for i in range(nslices):
        sh = 2.0 ** (21 - 7 * i)
        s = np.round(xs / sh)
        slices.append(s.astype(np.int8))
        assert np.abs(s).max() <= 127, np.abs(s).max()
        xs = xs - s * sh
    return slices, eB


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--w", type=int, default=4096)
    args = ap.parse_args()

    import os
    if os.environ.get("RECFILTER_PLATFORM") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import slope_ms_per_iter
    from recfilter_tpu import dimfuse, iir
    from recfilter_tpu.spec import Scan

    interpret = jax.default_backend() != "tpu"
    W = args.w
    Ta = Tb = 128
    na, nb = W // Ta, W // Tb
    Lb = 2048 if W % 2048 == 0 else W
    kb = Lb // Tb

    # Realistic completion matrices: the gaussian3 causal+anticausal pair.
    wts = iir.gaussian_weights(5.0, 3)
    scans = [Scan(1, True, wts[0], tuple(wts[1:])),
             Scan(1, False, wts[0], tuple(wts[1:]))]
    ma = dimfuse.prepare_dim_pass(scans, Ta, na, False)
    Ba_np = np.asarray(ma.Btot, np.float64)[0]      # (Ta, Ta) dense
    Bb_np = Ba_np.copy()

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, na, Ta, W)) * 0.7).astype(np.float32)

    # ---------------- px6 twin ----------------
    pairs = _prods6()
    Ba_ch = _split_const_np(Ba_np, 3)
    Bb_ch = _split_const_np(Bb_np, 3)
    Ba_cat = jnp.asarray(np.concatenate([Ba_ch[i] for i, _ in pairs], 1))
    Bb_cat = jnp.asarray(np.concatenate([Bb_ch[i] for i, _ in pairs], 1))

    def _split3(v):
        out, rem = [], v
        for _ in range(2):
            c = rem.astype(jnp.bfloat16)
            out.append(c)
            rem = rem - c.astype(jnp.float32)
        out.append(rem.astype(jnp.bfloat16))
        return out

    def k_px6(Ba_ref, Bb_ref, x_ref, o_ref):
        xs = _split3(x_ref[:])
        xcat = jnp.concatenate([xs[j] for _, j in pairs], axis=0)
        z = jax.lax.dot_general(Ba_ref[:], xcat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        for c in range(kb):
            sl = slice(c * Tb, (c + 1) * Tb)
            zs = _split3(z[:, sl])
            zcat = jnp.concatenate([zs[j] for _, j in pairs], axis=1)
            y = jax.lax.dot_general(zcat, Bb_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[:, sl] = y

    def f_px6(v):
        return pl.pallas_call(
            k_px6,
            out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
            grid=(1, na, W // Lb),
            in_specs=[
                pl.BlockSpec(Ba_cat.shape, lambda i, a, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(Bb_cat.shape, lambda i, a, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, Ta, Lb),
                             lambda i, a, l: (i, a, 0, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, None, Ta, Lb),
                                   lambda i, a, l: (i, a, 0, l),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )(Ba_cat, Bb_cat, v)

    # ---------------- int8 Ozaki ----------------
    NS = 4          # data slices (28 bits >= f32's 24)
    LMAX = 3        # keep levels i+j <= 3: 10 products
    Ba_sl, eBa = _int8_const_np(Ba_np, NS)
    Bb_sl, eBb = _int8_const_np(Bb_np, NS)
    # level-d A-const: [B0; B1; ...; Bd] along K (matches the data stack's
    # contiguous j = d..0 slice, highest slice index first)
    BaL = [jnp.asarray(np.concatenate(Ba_sl[: d + 1], axis=1))
           for d in range(LMAX + 1)]
    BbL = [jnp.asarray(np.concatenate(Bb_sl[: d + 1], axis=1))
           for d in range(LMAX + 1)]

    def _exp_scale(m):
        # power-of-2 scale: m < 2^(e-126) -> xs = x * 2^(153-e) in (-2^27, 2^27)
        bits = jax.lax.bitcast_convert_type(m, jnp.int32)
        e = jnp.clip((bits >> 23) & 0xFF, 32, 253)
        up = jax.lax.bitcast_convert_type(((280 - e) << 23), jnp.float32)
        dn = jax.lax.bitcast_convert_type(((e - 26) << 23), jnp.float32)
        return up, dn  # up = 2^(153-e), dn = 2^(e-153)·2^... inverse

    def _slice_int8(v, axis):
        """(up, dn, [s0..s3]) with v = dn * sum_i s_i 2^(21-7i)."""
        m = jnp.max(jnp.abs(v), axis=(0, 1), keepdims=True)
        up, dn = _exp_scale(m)
        xs = v * up
        slices = []
        for i in range(NS):
            sh = 2.0 ** (21 - 7 * i)
            s = jnp.round(xs * (1.0 / sh))
            slices.append(s.astype(jnp.int8))
            if i < NS - 1:
                xs = xs - s * sh
        # stack highest index first along the contraction axis
        stk = jnp.concatenate(slices[::-1], axis=axis)
        return dn, stk

    # per-level consts packed into ONE int8 operand each (levels along K)
    BaCat = jnp.concatenate(BaL, axis=1)   # (Ta, 10*Ta)
    BbCat = jnp.concatenate(BbL, axis=1)   # (Tb, 10*Tb)
    offs = np.cumsum([0] + [d + 1 for d in range(LMAX + 1)])  # level starts

    def k_i8(Ba_ref, Bb_ref, x_ref, o_ref):
        Ba, Bb = Ba_ref[:], Bb_ref[:]
        dnx, xstk = _slice_int8(x_ref[:], axis=0)
        z = None
        for d in range(LMAX + 1):
            # data slice j = d..0 lives at stack rows (NS-1-d)..NS-1
            p = jax.lax.dot_general(
                Ba[:, offs[d] * Ta:offs[d + 1] * Ta],
                xstk[(NS - 1 - d) * Ta:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            t = p * (2.0 ** (42 - 7 * d - 27))
            z = t if z is None else z + t
        z = z * (dnx * eBa)
        for c in range(kb):
            sl = slice(c * Tb, (c + 1) * Tb)
            dnz, zstk = _slice_int8(z[:, sl], axis=1)
            y = None
            for d in range(LMAX + 1):
                p = jax.lax.dot_general(
                    zstk[:, (NS - 1 - d) * Tb:],
                    Bb[:, offs[d] * Tb:offs[d + 1] * Tb],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                t = p * (2.0 ** (42 - 7 * d - 27))
                y = t if y is None else y + t
            o_ref[:, sl] = y * (dnz * eBb)

    def f_i8(v):
        return pl.pallas_call(
            k_i8,
            out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
            grid=(1, na, W // Lb),
            in_specs=[
                pl.BlockSpec(BaCat.shape, lambda i, a, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(BbCat.shape, lambda i, a, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, Ta, Lb),
                             lambda i, a, l: (i, a, 0, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, None, Ta, Lb),
                                   lambda i, a, l: (i, a, 0, l),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )(BaCat, BbCat, v)

    # ---------------- accuracy (both, vs f64 oracle) ----------------
    xa = jnp.asarray(x)
    xs_small = x[:, :1, :, :Lb]
    z64 = np.einsum("os,pasw->paow", Ba_np, xs_small.astype(np.float64))
    z5 = z64.reshape(1, 1, Ta, kb, Tb)
    y64 = np.einsum("ot,pasct->pasco", Bb_np, z5).reshape(1, 1, Ta, Lb)
    scale = np.abs(y64).max()

    if args.check_only:
        xsj = jnp.asarray(xs_small)
        for name, f in [("px6", f_px6), ("int8", f_i8)]:
            got = np.asarray(f(xsj))
            err = np.abs(got - y64).max() / scale
            print(f"{name}: max rel err vs f64 = {err:.3e}", flush=True)
        return

    # ---------------- timing (accuracy is validated in interpret mode;
    # each kernel timed independently so one failure doesn't kill the A/B)
    for name, f in [("px6", f_px6), ("int8", f_i8)]:
        t0 = time.time()
        try:
            ms = slope_ms_per_iter(f, xa, scale=1e-3)
            print(f"{name}: {ms:.3f} ms/image-pass at {W}x{W} "
                  f"(compile+measure {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
