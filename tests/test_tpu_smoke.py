"""On-chip smoke tests for the Pallas kernels (Mosaic alignment paths).

The CPU suite exercises these kernels in interpret mode only; Mosaic's
lane/sublane alignment constraints (128-wide lane tiles, 8-aligned sublane
slices, scoped-VMEM limits) exist only on real hardware. Run once per round:

    RECFILTER_TEST_TPU=1 python -m pytest tests -m tpu -q

Each test is one distinct remote compile (minutes over the tunnel), so the
suite is deliberately tiny: one 2-D filter through the fused row+col Pallas
kernels, and one through the overlap_k (final2d) 3-touch pipeline.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend available")


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((h, w)) * 0.01).astype(np.float32)


def test_pallas_fused_row_col_on_chip():
    """Row (lane-scan) + col (sublane-scan) fused kernels, mixed causality,
    vs the numpy oracle — exercises the T=128 lane-tile override, selector
    matmuls, and the strip pipeline on real Mosaic."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import scan_core
    from recfilter_tpu.kernels import fused
    from recfilter_tpu.planner import Plan
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKE1",
        (Dim("y", 256), Dim("x", 512)),
        (
            Scan(1, True, 0.9, (0.6, 0.25)),
            Scan(1, False, 1.1, (0.5,)),
            Scan(0, True, 1.0, (0.5, 0.2)),
        ),
        tile_widths=(64, 128),
    )
    img = _img(256, 512)
    got = np.asarray(fused.apply_filter(spec, Plan(backend="pallas"), img))
    want = scan_core.oracle_apply(spec, img).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_overlap_k_final2d_on_chip():
    """The overlap_k backend's Pallas final2d kernel (cross-dimension
    2-D completion) on real Mosaic vs the oracle."""
    _require_tpu()
    from recfilter_tpu import overlap2d, scan_core
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKE2",
        (Dim("y", 256), Dim("x", 256)),
        (Scan(1, True, 1.0, (0.5, 0.2)), Scan(0, True, 1.0, (0.4,))),
        tile_widths=(128, 128),
    )
    img = _img(256, 256, seed=1)
    got = np.asarray(
        overlap2d.apply_filter_overlap(spec, img, use_kernels=True)
    )
    want = scan_core.oracle_apply(spec, img).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_px4_completion_kernel_on_chip():
    """The split-bf16 completion kernel (px4 precision mode) must hold its
    ~1e-5 error bound with real Mosaic lowering — in-VMEM bf16 chunking,
    per-tile variant indexing, rotated emit."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, scan_core
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKE3",
        (Dim("y", 256), Dim("x", 512)),
        (
            Scan(1, True, 0.9, (0.6, 0.25, -0.1)),
            Scan(1, False, 1.1, (0.5, 0.2, 0.05)),
            Scan(0, True, 1.0, (0.5, 0.2)),
            Scan(0, False, 1.0, (0.4,)),
        ),
        tile_widths=(128, 128),
    )
    img = _img(256, 512, seed=2)
    got = np.asarray(
        dimfuse.apply_filter_fused(spec, jnp.asarray(img),
                                   matmul_precision="px4")
    )
    want = scan_core.oracle_apply(spec, img)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 8e-5 * scale


def test_px6_volume_tails_chaining_on_chip():
    """3-D px6 chain with the volume-regime fused tails (second kernel
    output shaped (n2*8, r_a, nT), ka-wide sub-tile blocks): Mosaic must
    accept the 3-D out blockspec, and the chain must hold true-f32 error."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, scan_core
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKEVOL",
        (Dim("z", 128), Dim("y", 256), Dim("x", 128)),
        (
            Scan(2, True, 1.0, (0.5,)),
            Scan(1, True, 0.9, (0.4, 0.1)),
            Scan(0, False, 1.05, (0.3,)),
        ),
        tile_widths=(128, 128, 128),
    )
    rng = np.random.default_rng(31)
    vol = (rng.standard_normal((128, 256, 128)) * 0.01).astype(np.float32)
    got = np.asarray(
        dimfuse.apply_filter_fused(spec, jnp.asarray(vol),
                                   matmul_precision="px6")
    )
    want = scan_core.oracle_apply(spec, vol.astype(np.float64))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-6 * scale


def test_fir_band_kernel_on_chip():
    """The fused banded-FIR kernel on real Mosaic: clamped neighbour-strip
    index maps, per-sub-tile dots, bank (1→2) rot emit + contract (2→1) —
    the DoG pipeline's two kernel shapes — vs the float64 oracle."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import fir

    img = _img(256, 512, seed=3)
    t1, t2 = fir.box_taps(3, 3), fir.box_taps(5, 3)
    got = np.asarray(fir.fir_separable_2d(
        jnp.asarray(img), [t1, t2], signs=[1.0, -1.0], tile_width=128,
        matmul_precision="px6"))
    tb = fir._align_taps([t1, t2])

    def sep(taps):
        return fir.fir_oracle(fir.fir_oracle(img, taps, 1), taps, 0)

    want = sep(tb[0]) - sep(tb[1])
    scale = np.abs(sep(tb[0])).max()
    assert np.abs(got - want).max() <= 1e-5 * scale


def test_bf16_kernel_and_epilogue_on_chip():
    """bf16 storage mode through the completion kernels (nprod=1, bf16
    blocks) with an in-kernel epilogue — real-Mosaic bf16 block I/O."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, scan_core
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKEBF", (Dim("y", 256), Dim("x", 256)),
        (Scan(1, True, 0.9, (0.6, 0.2)), Scan(0, False, 1.05, (0.4,))),
        tile_widths=(128, 128), dtype="bfloat16",
    )
    img = _img(256, 256, seed=4)
    aux = _img(256, 256, seed=5)

    def combine(blur, image):
        return 2.0 * image - 0.5 * blur

    got = np.asarray(dimfuse.apply_filter_fused(
        spec, jnp.asarray(img, jnp.bfloat16),
        epilogue=combine, eaux=(jnp.asarray(aux, jnp.bfloat16),),
    ).astype(jnp.float32))
    spec32 = FilterSpec("SMOKEBF32", spec.dims, spec.scans,
                        tile_widths=spec.tile_widths)
    want = 2.0 * aux - 0.5 * scan_core.oracle_apply(spec32,
                                                    img.astype(np.float64))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 3e-2 * scale


def test_grad_f32_grade_on_chip():
    """The kernel custom-VJP einsum twins must pin HIGHEST: on real TPU the
    default f32 dot is bf16-grade, so an unpinned twin silently degrades
    gradients ~1e-2 — invisible to the CPU suite (exact f32 dots there)."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, fir
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    spec = FilterSpec(
        "SMOKEGRAD", (Dim("y", 256), Dim("x", 256)),
        (Scan(1, True, 0.9, (0.5,)), Scan(0, True, 1.0, (0.4,))),
        tile_widths=(128, 128),
    )
    x = jnp.asarray(_img(256, 256, seed=6))
    ct = jnp.asarray(_img(256, 256, seed=7))

    def g(mode):
        return jax.grad(lambda v: (dimfuse.apply_filter_fused(
            spec, v, matmul_precision=mode) * ct).sum())(x)

    g_px, g_hi = g("px6"), g("highest")
    assert float(jnp.abs(g_px - g_hi).max()) <= 1e-5 * float(
        jnp.abs(g_hi).max())

    taps = fir.box_taps(4, 3)
    ct2 = np.asarray(ct)
    g_true = fir.fir_oracle(ct2, taps[::-1], 1)
    g_k = np.asarray(jax.grad(lambda v: (fir.fir_pass_last(
        v, taps, tile_width=128, matmul_precision="px6") * ct).sum())(x))
    assert np.abs(g_k - g_true).max() <= 1e-5 * np.abs(g_true).max()


def test_learnable_training_step_kernel_speed_on_chip():
    """VERDICT r2 #8: one training step (value_and_grad) of the 2-D
    learnable Gaussian must run through the px tails/completion kernels
    and land within 2x of the inference px6 pipeline's time on chip."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    import recfilter_tpu as rf
    from recfilter_tpu import learnable
    from recfilter_tpu.spec import Dim, FilterSpec, Scan
    from bench import slope_ms_per_iter

    h = w = 2048
    wts = rf.gaussian_weights(4.0, 3)
    spec = FilterSpec(
        "LG", (Dim("y", h), Dim("x", w)),
        (
            Scan(1, True, wts[0], tuple(wts[1:])),
            Scan(1, False, wts[0], tuple(wts[1:])),
            Scan(0, True, wts[0], tuple(wts[1:])),
            Scan(0, False, wts[0], tuple(wts[1:])),
        ),
        tile_widths=(128, 128),
    )
    L = learnable.LearnableRecFilter(spec, tile_width=128)
    params = L.init_params()
    x = jnp.asarray(_img(h, w, seed=3))
    target = jnp.asarray(_img(h, w, seed=4))

    @jax.jit
    def train_step(p, v):
        def loss(p):
            return ((L.apply(p, v) - target) ** 2).mean()

        l, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g), l

    def step_body(v):
        p2, l = train_step(params, v)
        return v + 0.0 * (l + p2["scan0"]["b0"])

    ms_train = slope_ms_per_iter(step_body, x, per_body=1)
    ms_fwd = slope_ms_per_iter(lambda v: L.apply(params, v), x, per_body=1)
    print(f"train {ms_train:.3f} ms vs learnable forward {ms_fwd:.3f} ms")
    # A training step is one forward + the backward's image-sized
    # transposes and coefficient reductions — structurally ~2-3 forwards.
    # Regression guard: the associative-scan solve's backward once cost
    # 6 ms of 40x-padded interior pads here (fixed by the dense
    # traced-powers solve — 8.5 -> 0.59 ms measured); the absolute cap
    # catches any return of that class of pathology.
    assert ms_train <= 3.0 * ms_fwd, (ms_train, ms_fwd)
    assert ms_train <= 1.5, ms_train


def test_overlap_px_and_stencil_on_chip():
    """Round-3 kernels on real Mosaic: the 3-touch overlapped px executor
    (moments2d_px + final2d_px, clamp edge variants selected by grid
    position) and an in-kernel shifted-tap stencil consumer — both vs the
    numpy oracle at f32 grade. One compile each."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, overlap2d, scan_core
    from recfilter_tpu.spec import BorderMode, Dim, FilterSpec, Scan
    import recfilter_tpu as rf

    h, w = 256, 384
    wts = rf.gaussian_weights(2.0, 3)
    spec = FilterSpec(
        "PXC", (Dim("y", h), Dim("x", w)),
        (
            Scan(1, True, wts[0], tuple(wts[1:])),
            Scan(1, False, wts[0], tuple(wts[1:])),
            Scan(0, True, wts[0], tuple(wts[1:])),
            Scan(0, False, wts[0], tuple(wts[1:])),
        ),
        border=BorderMode.CLAMP, tile_widths=(128, 128),
    )
    x = _img(h, w, seed=11)
    y = overlap2d.fused_2d_px(
        jnp.asarray(x), 0, [spec.scans[2], spec.scans[3]],
        1, [spec.scans[0], spec.scans[1]], spec.border, 6, False,
    )
    assert y is not None
    want = scan_core.oracle_apply(spec, x.astype(np.float64))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(y) - want).max() <= 1e-5 * scale

    # in-kernel stencil consumer on a rotated single-dim pass
    sspec = FilterSpec("ST", (Dim("y", 64), Dim("x", 256)),
                       (Scan(1, True, 1.0, (2.0, -1.0)),),
                       tile_widths=(0, 128))
    xs = _img(64, 256, seed=12)
    taps = [(10, 0.25), (-1, -2.0), (-12, 1.0)]
    got = np.asarray(dimfuse.apply_filter_rotated(
        sspec, jnp.asarray(xs), rot_axes=2, matmul_precision="px6",
        stencil={"taps": taps, "start": "zero", "end": "clamp"}))
    plain = scan_core.oracle_apply(sspec, xs.astype(np.float64))
    ref = np.asarray(dimfuse.apply_stencil(
        jnp.asarray(plain.T.astype(np.float32)), -2, taps, "zero", "clamp"))
    zscale = np.abs(plain).max()
    assert np.abs(got - ref).max() <= 1e-5 * zscale


def test_fused_2d_stencil_on_chip():
    """The fused 2-D stencil-consumer path on real Mosaic: extended-band
    pltpu.roll lane shifts, misaligned sublane tap slices, lane-edge
    neighbor sub-tile completions, moments edge partials — all things
    interpret mode cannot validate. One compile; vs the f64 SAT+shift
    oracle."""
    _require_tpu()
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse
    from recfilter_tpu.spec import BorderMode, Dim, FilterSpec, Scan

    H, W = 256, 2560  # two 1280-wide lane blocks: edge sub-tiles live
    spec = FilterSpec(
        "SST", (Dim("y", H), Dim("x", W)),
        (Scan(1, True, 1.0, (1.0,)), Scan(0, True, 1.0, (1.0,))),
        border=BorderMode.ZERO, tile_widths=(128, 128),
    )
    x = _img(H, W, seed=13) * 0.01

    def taps(B):
        s = 1.0 / float((2 * B + 1) ** 2)
        return [(B, B, s), (B, -B - 1, -s), (-B - 1, B, -s),
                (-B - 1, -B - 1, s)]

    out = dimfuse.apply_filter_fused(
        spec, jnp.asarray(x), matmul_precision="px6",
        stencil2d=[taps(5), taps(9)])
    sat = x.astype(np.float64).cumsum(1).cumsum(0)

    def shift(f, off, ax):
        n = f.shape[ax]
        lo, hi = max(off, 0), max(-off, 0)
        pads = [(0, 0)] * 2
        pads[ax] = (hi, lo)
        g = np.pad(f, pads, mode="edge" if off > 0 else "constant")
        sl = [slice(None)] * 2
        sl[ax] = slice(lo, lo + n)
        return g[tuple(sl)]

    for got, B in zip(out, (5, 9)):
        ref = None
        for dy, dx, c in taps(B):
            t = shift(shift(sat, dy, 0), dx, 1) * c
            ref = t if ref is None else ref + t
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(got, np.float64) - ref).max() <= 2e-5 * scale


def test_int_unit_and_segmented_kernels_on_chip():
    """Round 4: the wrapping additive integer kernels have Mosaic-only
    lowering paths (pad/slice doubling adds, ragged grids, 128-lane carry
    slots) with no CPU equivalent — one small full-extent SAT and one
    segmented lane case, bit-exact on chip."""
    import jax.numpy as jnp

    from recfilter_tpu import dimfuse
    from recfilter_tpu.kernels import int_scan
    from recfilter_tpu.spec import Dim, FilterSpec, Scan

    rng = np.random.default_rng(77)
    spec = FilterSpec(
        "IS", (Dim("y", 256), Dim("x", 256)),
        (Scan(1, True, 1, (1,)), Scan(0, True, 1, (2, -1))),
        dtype="int32", tile_widths=(128, 128),
    )
    x = rng.integers(-2 ** 20, 2 ** 20, (256, 256)).astype(np.int32)
    got = np.asarray(dimfuse.apply_filter_fused(spec, jnp.asarray(x)))
    sat = x.astype(np.int64).cumsum(1)
    w = sat.cumsum(0).cumsum(0)  # (2,-1) = double integration along y
    assert np.array_equal(got.astype(np.int64) & 0xFFFFFFFF,
                          w & 0xFFFFFFFF)

    sig = rng.integers(-1000, 1000, (8, 70_001)).astype(np.int32)
    got = np.asarray(int_scan.int_unit_dim_pass(
        jnp.asarray(sig), [(1, 1, True)], 1, False))
    assert np.array_equal(got.astype(np.int64) & 0xFFFFFFFF,
                          sig.astype(np.int64).cumsum(1) & 0xFFFFFFFF)


def test_multislot_and_seq_seeded_on_chip():
    """Round 5 on real Mosaic: (a) multi-slot kernel carries (ΣK=12 → 2
    sublane slots through tails/pad_solve/completion) vs the oracle at
    f32 grade; (b) the carry-seeded seq route at D=1
    (RECFILTER_SEQ1_PROBE) — the seq_seed_maps Out/K dots and the hook
    path compile and hold the px6 bound on hardware."""
    _require_tpu()
    import os

    import jax.numpy as jnp

    from recfilter_tpu import dimfuse, scan_core
    from recfilter_tpu.parallel import sharding
    from recfilter_tpu.planner import Plan
    from recfilter_tpu.spec import BorderMode, Dim, FilterSpec, Scan

    rng = np.random.default_rng(31)
    # (a) order-12 scan on 128-lane geometry: 2 carry slots
    fb = tuple(float(v) for v in rng.uniform(-0.05, 0.05, 12))
    s = Scan(1, True, 1.1, fb)
    x = (rng.standard_normal((16, 512)) * 0.1).astype(np.float32)
    got = np.asarray(dimfuse.fused_dim_pass(
        jnp.asarray(x), 1, [s], 128, BorderMode.ZERO,
        matmul_precision="px6"))
    want = scan_core.oracle_apply_scan(
        x.astype(np.float64), 1, True, 1.1, list(fb), BorderMode.ZERO)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-6 * scale

    # (b) seq-seeded executor at D=1 on the real chip
    spec = FilterSpec(
        "SeqChip", (Dim("y", 256), Dim("x", 256)),
        (Scan(0, True, 1.0, (0.5, 0.2)), Scan(1, True, 0.8, (0.4,))),
        tile_widths=(128, 128))
    x2 = (rng.standard_normal((256, 256)) * 0.1).astype(np.float32)
    os.environ["RECFILTER_SEQ1_PROBE"] = "1"
    try:
        mesh = sharding.make_mesh((1,), ("seq",))
        got2 = np.asarray(sharding.sharded_apply_filter(
            spec, Plan(matmul_precision="px6"), mesh, jnp.asarray(x2),
            seq_axis=1))
    finally:
        os.environ.pop("RECFILTER_SEQ1_PROBE", None)
    want2 = scan_core.oracle_apply(spec, x2.astype(np.float64))
    scale2 = np.abs(want2).max()
    assert np.abs(got2 - want2).max() <= 4e-6 * scale2
