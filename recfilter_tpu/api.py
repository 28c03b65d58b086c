"""Public API: the RecFilter builder.

TPU-native rebuild of the reference's user-facing surface
(``lib/recfilter.h:146-510``): declare dimensions, set a pure initialization,
append causal/anticausal scans, tile, (optionally) cascade or overlap, then
realize/profile. Construction mutates a FilterSpec; execution dispatches to a
jitted executor chosen by the Plan (see :mod:`recfilter_tpu.planner`).

Reference → TPU mapping of the main entry points:

    F(x,y) = image(x,y)         →  F[x, y] = image
    F.add_filter(+x, coeff)     →  F.add_filter(+x, coeff)     (:264-392)
    F.split(x, 32, y, 32)       →  F.split(x, 32, y, 32)       (split.cpp:1850)
    F.realize() / F.profile(n)  →  F.realize() / F.profile(n)  (:984-1016)
    F.as_func()                 →  F.as_func() → jitted callable (:886)
    F.cascade* / overlap        →  same names (reorder.cpp)
    F.intra/inter_schedule()    →  tag-addressed Plan handles (schedule.cpp)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import graph, iir, planner, scan_core, tiling
from .spec import BorderMode, Dim, DimAndCausality, FilterSpec, Scan, make_scan
from .utils import timing

_max_threads_per_warp = 128  # parity knob (lib/recfilter.cpp:36-46)
_vectorization_width = 8  # parity knob (lib/recfilter.cpp:48-57)

# Primitives an epilogue-fusable consumer may contain (elementwise maps,
# dtype casts, scalar broadcasts). Anything outside this set makes
# compute_at fall back to jit composition — recorded, never silent.
_ELEMENTWISE_PRIMS = frozenset({
    "add", "sub", "mul", "div", "neg", "abs", "sign", "max", "min",
    "pow", "integer_pow", "exp", "log", "log1p", "expm1", "tanh", "sqrt",
    "rsqrt", "square", "logistic", "erf", "sin", "cos", "floor", "ceil",
    "round", "clamp", "select_n", "convert_element_type", "and", "or",
    "xor", "not", "eq", "ne", "ge", "gt", "le", "lt", "is_finite",
    "broadcast_in_dim", "copy", "stop_gradient", "custom_jvp_call",
    "custom_vjp_call", "pjit",
})


def _consumer_arity(fn) -> int:
    import inspect

    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        return 1
    n = 0
    for p in params:
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind == p.VAR_POSITIONAL:
            return max(n, 1)
    return max(n, 1)


def _is_elementwise(fn, spec: FilterSpec, n_aux: int) -> bool:
    """True when ``fn(out, *aux)`` provably lowers to elementwise work on
    arrays of the filter's output shape: every jaxpr primitive is in
    :data:`_ELEMENTWISE_PRIMS` (recursing into pjit/custom-call bodies),
    broadcasts only expand scalars/size-1 operands, and the output shape
    equals the input shape."""
    shape = tuple(d.extent for d in spec.dims)
    aval = jax.ShapeDtypeStruct(shape, jnp.dtype(spec.dtype))
    try:
        jaxpr = jax.make_jaxpr(fn)(*([aval] * (1 + n_aux)))
    except Exception:
        return False

    def walk(jx) -> bool:
        for eqn in jx.eqns:
            if eqn.primitive.name not in _ELEMENTWISE_PRIMS:
                return False
            if eqn.primitive.name == "broadcast_in_dim":
                if int(np.prod(eqn.invars[0].aval.shape)) != 1:
                    return False
            for v in eqn.params.values():
                sub = getattr(v, "jaxpr", None)
                if sub is not None and not walk(sub):
                    return False
        return True

    outs = jaxpr.out_avals
    # dtype must be preserved too: the fused executor emits in the
    # FILTER's dtype, so a dtype-changing consumer (comparisons, casts)
    # must take the composed route to keep consumer(filter(x)) semantics.
    return (len(outs) == 1 and tuple(outs[0].shape) == shape
            and outs[0].dtype == jnp.dtype(spec.dtype)
            and walk(jaxpr.jaxpr))


def _tuple_linear_coeffs(epilogue, k: int):
    """Scalar coefficients [c_0..c_k-1] when ``epilogue`` is provably a
    LINEAR scalar combine ``Σ c_i·y_i`` of the Tuple components, else
    None. Probed numerically at build time on tiny arrays: g(0)=0,
    additivity on two independent random draws, per-component basis
    responses constant across positions, and exact reconstruction on both
    draws — a nonlinear or spatially-varying combine fails at least one.
    Linear scalar combines commute with the (linear) filter, so the Tuple
    consumer folds into the input (see ``as_func``)."""
    rng = np.random.default_rng(0)
    shape = (2, 3)
    try:
        a = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
             for _ in range(k)]
        b = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
             for _ in range(k)]
        z = [jnp.zeros(shape, jnp.float32) for _ in range(k)]
        g0 = np.asarray(epilogue(*z))
        if g0.shape != shape or np.abs(g0).max() > 1e-7:
            return None
        ga, gb = np.asarray(epilogue(*a)), np.asarray(epilogue(*b))
        coeffs = []
        for i in range(k):
            ei = list(z)
            ei[i] = jnp.ones(shape, jnp.float32)
            w = np.asarray(epilogue(*ei))
            if np.abs(w - w.flat[0]).max() > 1e-6 * (np.abs(w).max() + 1e-9):
                return None
            coeffs.append(float(w.flat[0]))
        sc = max(np.abs(ga).max(), np.abs(gb).max(), 1e-6)
        for g, vs in ((ga, a), (gb, b)):
            rec = sum(c * np.asarray(v) for c, v in zip(coeffs, vs))
            if np.abs(rec - g).max() > 1e-5 * sc:
                return None
        return coeffs
    except Exception:
        return None


class RecFilter:
    """An n-D recursive filter under construction / ready to run."""

    def __init__(self, name: str = "RecFilter"):
        self._name = name
        self._spec: Optional[FilterSpec] = None
        self._image: Optional[np.ndarray] = None
        self._init_fn: Optional[Callable] = None
        self._plan = planner.Plan()
        self._schedule_log: List[str] = []
        self._clamped_border = False
        self._dtype = "float32"
        self._cached_fn = None

    # ------------------------------------------------------------------ name
    @property
    def name(self) -> str:
        return self._name

    @property
    def spec(self) -> FilterSpec:
        if self._spec is None:
            raise RuntimeError(
                f"Recursive filter {self._name} has no definition yet; "
                "set one with F[x, y] = image"
            )
        return self._spec

    # ---------------------------------------------------------------- define
    def __setitem__(self, dims, value):
        """``F[x, y] = image`` — the pure initialization
        (``RecFilterRefVar::operator=``, ``lib/recfilter.cpp:64-66`` →
        ``RecFilter::define``, ``:192-248``).

        ``dims`` are Dim objects in array-axis order; ``value`` is an array
        whose shape matches the dim extents, or a callable taking index grids
        (one per dim) and returning the initial array.
        """
        if not isinstance(dims, tuple):
            dims = (dims,)
        self.define(dims, value)

    def define(self, dims: Sequence[Dim], value):
        if self._spec is not None and self._spec.scans:
            raise RuntimeError(
                f"Recursive filter {self._name} already defined"
            )
        dims = tuple(dims)
        if callable(value) and not hasattr(value, "shape"):
            grids = np.meshgrid(
                *[np.arange(d.extent) for d in dims], indexing="ij"
            )
            value = value(*grids)
        tuple_width = 0
        if isinstance(value, (tuple, list)):
            # Tuple definition (Halide ``Tuple(expr, ...)``): components
            # must agree in shape/dtype; stacked on a leading channel axis.
            # Device-resident components stay on device (jnp.stack).
            tuple_width = len(value)
            comps = [
                v if isinstance(v, jax.Array) else np.asarray(v)
                for v in value
            ]
            if any(
                tuple(c.shape) != tuple(comps[0].shape)
                or np.dtype(c.dtype) != np.dtype(comps[0].dtype)
                for c in comps
            ):
                raise ValueError(
                    "Tuple components must have identical shape and dtype"
                )
            if any(isinstance(c, jax.Array) for c in comps):
                value = jnp.stack(comps)
            else:
                value = np.stack(comps)
        else:
            value = (
                np.asarray(value) if not isinstance(value, jax.Array)
                else value
            )
        expect = tuple(d.extent for d in dims)
        got = value.shape[1:] if tuple_width else value.shape
        if tuple(got[: len(dims)]) != expect:
            raise ValueError(
                f"Initialization shape {value.shape} does not match dim "
                f"extents {expect} for filter {self._name}"
            )
        self._dtype = str(value.dtype)
        self._image = value
        self._spec = FilterSpec(
            name=self._name,
            dims=dims,
            scans=(),
            border=BorderMode.CLAMP if self._clamped_border else BorderMode.ZERO,
            dtype=self._dtype,
            tile_widths=(0,) * len(dims),
            tuple_width=tuple_width,
        )
        self._cached_fn = None
        return self

    def set_image(self, image):
        """Bind (or rebind) the input image without redefining the filter —
        the analog of re-setting an ImageParam (``lib/recfilter.h``)."""
        if self._spec is not None:
            expect = tuple(d.extent for d in self._spec.dims)
            if tuple(np.asarray(image).shape[: len(expect)]) != expect:
                raise ValueError(
                    f"image shape {np.asarray(image).shape} does not match "
                    f"dim extents {expect}"
                )
        self._image = image
        return self

    def set_clamped_image_border(self):
        """Clamp out-of-range taps to the image edge
        (``lib/recfilter.cpp:252-258``). Must precede scan definitions."""
        if self._spec is not None and self._spec.scans:
            raise RuntimeError(
                f"Recursive filter {self._name} already defined"
            )
        self._clamped_border = True
        if self._spec is not None:
            self._spec = dataclasses.replace(self._spec, border=BorderMode.CLAMP)
        self._cached_fn = None

    # ----------------------------------------------------------------- scans
    def add_filter(self, x: Union[Dim, DimAndCausality], coeff):
        """Append a scan ``v[x] = b0 v[x] + Σ a_j v[x∓(j+1)]``
        (``lib/recfilter.cpp:264-392``). ``x`` may be ``+dim``/``-dim`` or a
        bare Dim (causal, ``lib/recfilter.cpp:260-262``)."""
        if isinstance(x, Dim):
            x = DimAndCausality(x, True)
        self._spec = self.spec.with_scan(make_scan(self.spec, x, coeff))
        self._cached_fn = None
        return self

    # ---------------------------------------------------------------- tiling
    def split(self, *args, **kwargs):
        """Tile dimensions: ``split(x, 32, y, 32)`` or ``split({x: 32})``
        (``RecFilter::split``, ``lib/split.cpp:1850-2080``).

        Unlike the reference, tile widths need not divide extents (inputs are
        zero-padded, which is exact for these scans) and splitting is
        metadata-only — the blocked algebra is applied at trace time.
        """
        spec = self.spec
        tiles = list(spec.tile_widths or (0,) * spec.ndim)
        if len(args) == 1 and isinstance(args[0], dict):
            for d, t in args[0].items():
                tiles[spec.axis_of(d)] = int(t)
        else:
            if len(args) % 2:
                raise ValueError("split expects (dim, width) pairs")
            for d, t in zip(args[::2], args[1::2]):
                tiles[spec.axis_of(d)] = int(t)
        self._spec = spec.with_tiles(tuple(tiles))
        self._cached_fn = None
        return self

    def split_all_dimensions(self, tile_width: int):
        """Tile every scanned dimension with one width
        (``lib/split.cpp:2082``)."""
        spec = self.spec
        scanned = {s.axis for s in spec.scans}
        tiles = [
            tile_width if i in scanned else t
            for i, t in enumerate(spec.tile_widths or (0,) * spec.ndim)
        ]
        self._spec = spec.with_tiles(tuple(tiles))
        self._cached_fn = None
        return self

    # ------------------------------------------------------------- execution
    def as_func(self, epilogue: Optional[Callable] = None,
                stencil=None, stencil2d=None) -> Callable:
        """Jittable function array→array running the filter
        (``RecFilter::as_func``, ``lib/recfilter.cpp:886``).

        For a Tuple filter (``F[x, y] = (img_a, img_b)``), the returned
        function accepts a tuple/list of component arrays (or the stacked
        array) and returns a tuple of component outputs — every scan applies
        identically to each component, as Halide Tuples do
        (``apps/DoG/diff_gauss.cpp:84``, ``demo_gaussian_filter.cpp:57``).

        ``epilogue(out, *eaux)`` — optional elementwise combine; the
        returned function then takes ``(x, *eaux)`` and the combine is fused
        into the filter's final completion matmul on the einsum backends —
        the TPU analog of the reference's ``compute_at`` fusion of a
        pointwise consumer into the filter's last CUDA kernel
        (``apps/usm/unsharp_mask_optimized.cpp:61-71``). eaux arrays share
        the OUTPUT layout (rotated when ``Plan.rotate_emit`` is set).

        ``stencil`` — optional SHIFTED-tap consumer fused into the filter's
        final pass: ``{"taps": [(offset, coeff), ...], "start": ..,
        "end": ..}`` with offsets along the scanned axis — the analog of
        the reference's ``compute_at`` of a stencil consumer into the
        producer's kernel (``lib/recfilter.cpp:507-573``, used by DoG's
        differencing stages ``apps/DoG/diff_gauss.cpp:93-101``). Requires
        ``Plan.rotate_emit`` (single-dimension filters); the px kernel
        modes fold the taps into the completion kernel via neighbor halo
        strips at zero extra image streams. Applies before ``epilogue``.

        ``stencil2d`` — per-channel 2-D shifted-tap consumer banks
        ``[[(dy, dx, coeff), ...], ...]`` over the trailing two axes
        (positive offsets clamp at the far edges, negative offsets read
        zero — the SAT-differencing contract,
        ``apps/DoG/diff_gauss.cpp:29-38``). The returned function emits a
        TUPLE of per-channel arrays; on the 3-touch 2-D px executor the
        bank fuses into the final kernel so the filter output never
        touches HBM, elsewhere it runs as the standalone fused stencil
        kernel / XLA shifts. Mutually exclusive with epilogue/stencil."""
        spec = self.spec
        if stencil is not None and not self._plan.rotate_emit:
            raise ValueError(
                "stencil consumers require Plan.rotate_emit "
                "(single-dimension filters)"
            )
        if stencil2d is not None and (epilogue is not None
                                      or stencil is not None):
            raise ValueError(
                "stencil2d is mutually exclusive with epilogue/stencil")
        if spec.tuple_width:
            k = spec.tuple_width
            if epilogue is not None:
                # Tuple epilogue (round-5, VERDICT r4 #6): a pointwise
                # consumer of ALL components, ``epilogue(c_0, …, c_k-1) →
                # array`` — the reference fuses such consumers into the
                # Tuple producer (``apps/DoG/diff_gauss.cpp:84-110``,
                # ``apps/usm/unsharp_mask_optimized.cpp:61-71``). Every
                # component runs the SAME scans here (Halide Tuple
                # contract), so a LINEAR scalar combine commutes with the
                # filter: g(F(x_0),…) = F(Σ c_i·x_i) — the combine folds
                # into the INPUT and ONE single-channel pass (the 3-touch
                # executor where its gates hold) replaces the k-channel
                # stacked pass + combine stream. Non-linear combines run
                # staged (the combine fuses into XLA's epilogue where it
                # can).
                lin = _tuple_linear_coeffs(epilogue, k)
                if lin is not None:
                    inner1 = self._executor(
                        dataclasses.replace(spec, tuple_width=0))

                    def tuple_lin_fn(value):
                        comps = ([jnp.asarray(v) for v in value]
                                 if isinstance(value, (tuple, list))
                                 else [jnp.asarray(value)[i]
                                       for i in range(k)])
                        xc = comps[0] * lin[0]
                        for c, v in zip(lin[1:], comps[1:]):
                            xc = xc + c * v
                        return inner1(xc)

                    tuple_lin_fn.tuple_route = "linear-folded"
                    return tuple_lin_fn
                inner = self._executor(spec.stacked())

                def tuple_epi_fn(value):
                    if isinstance(value, (tuple, list)):
                        x = jnp.stack([jnp.asarray(v) for v in value])
                    else:
                        x = jnp.asarray(value)
                    y = inner(x)
                    return epilogue(*(y[i] for i in range(k)))

                tuple_epi_fn.tuple_route = "staged"
                return tuple_epi_fn
            inner = self._executor(spec.stacked())

            def tuple_fn(value):
                if isinstance(value, (tuple, list)):
                    x = jnp.stack([jnp.asarray(v) for v in value])
                else:
                    x = jnp.asarray(value)
                y = inner(x)
                return tuple(y[i] for i in range(k))

            return tuple_fn
        return self._executor(spec, epilogue, stencil, stencil2d)

    def _executor(self, spec: FilterSpec, epilogue=None,
                  stencil=None, stencil2d=None) -> Callable:
        plan = self._plan
        if stencil2d is not None and plan.rotate_emit:
            raise ValueError(
                "stencil2d applies to the natural output layout; "
                "unset Plan.rotate_emit")
        if plan.rotate_emit and plan.backend != "oracle":
            # The rotated-layout contract must survive backend fallback:
            # apply_filter_rotated itself routes integers / untiled widths /
            # clamp-prime cases to the right executor WITH the rotated emit.
            from . import dimfuse

            return lambda x, *eaux: dimfuse.apply_filter_rotated(
                spec, x, rot_axes=plan.rotate_emit,
                matmul_precision=plan.matmul_precision,
                epilogue=epilogue, eaux=eaux, stencil=stencil,
            )
        backend = planner.resolve_backend(
            spec, plan, jax.default_backend()
        )
        if backend == "einsum":
            from . import dimfuse

            return lambda x, *eaux: dimfuse.apply_filter_fused(
                spec, x, matmul_precision=plan.matmul_precision,
                epilogue=epilogue, eaux=eaux, stencil2d=stencil2d,
            )
        if stencil2d is not None:
            # Non-einsum backends: the bank runs as the standalone fused
            # stencil kernel (TPU, 2-D) or XLA shifts after the filter.
            from .kernels import stencil2d as st2d

            inner = self._executor(spec)

            def _with_stencil(x):
                y = inner(x)
                if y.ndim == 2 and jax.default_backend() == "tpu":
                    out = st2d.stencil2d_pass(y, stencil2d)
                    if out is not None:
                        return out if isinstance(out, tuple) else (out,)
                return st2d.stencil2d_ref(y, stencil2d)

            return _with_stencil
        if epilogue is not None:
            # Non-einsum backends: run the combine after the filter (one jit
            # program — XLA still fuses the elementwise stream, just not
            # into the completion matmul's output tiles).
            inner = self._executor(spec)
            return lambda x, *eaux: epilogue(inner(x), *eaux)
        if backend == "oracle":
            return lambda x: scan_core.oracle_apply(spec, np.asarray(x))
        if backend == "scan":
            return lambda x: scan_core.apply_filter(spec, x)
        if backend == "pallas":
            try:
                from .kernels import fused as _fused

                return lambda x: _fused.apply_filter(spec, plan, x)
            except ImportError:
                backend = "einsum"
                from . import dimfuse

                return lambda x: dimfuse.apply_filter_fused(
                    spec, x, matmul_precision=plan.matmul_precision
                )
        if backend in ("overlap", "overlap_k"):
            from . import overlap2d

            uk = backend == "overlap_k"
            interp = plan.interpret or jax.default_backend() != "tpu"
            mmd = jnp.dtype(plan.matmul_dtype).type
            return lambda x: overlap2d.apply_filter_overlap(
                spec, x, use_kernels=uk, interpret=interp,
                matmul_dtype=mmd,
                matmul_precision=plan.matmul_precision,
            )
        if backend == "blocked":
            return lambda x: tiling.apply_filter(spec, x)
        raise ValueError(f"unknown backend {backend}")

    def compile_jit(self, filename: Optional[str] = None) -> Callable:
        """Trace + compile now; optionally dump the lowered/optimized HLO to
        ``filename`` (``RecFilter::compile_jit``, ``lib/recfilter.cpp:918-930``,
        which dumps lowered Halide HTML)."""
        fn = self.as_func()
        jitted = jax.jit(fn)
        lowered = jitted.lower(jax.ShapeDtypeStruct(self._image.shape, self._image.dtype))
        compiled = lowered.compile()
        if filename:
            with open(filename, "w") as fh:
                fh.write(lowered.as_text())
        self._cached_fn = compiled
        return compiled

    def realize(self, input: Optional[np.ndarray] = None):
        """Run the filter on the bound (or given) image
        (``RecFilter::realize``, ``lib/recfilter.cpp:984-989``)."""
        if input is None and getattr(self, "_chain_parent", None) is not None:
            input = self._chain_parent.realize()
        x = self._image if input is None else input
        if x is None:
            raise RuntimeError(f"filter {self._name} has no bound image")
        if self._cached_fn is None:
            fn = self.as_func()
            self._cached_fn = jax.jit(fn) if self._plan.backend != "oracle" else fn
        return self._cached_fn(jnp.asarray(x))

    def profile(self, iterations: int = 1) -> float:
        """Warm-up + timed loop; prints and returns total ms
        (``RecFilter::profile``, ``lib/recfilter.cpp:991-1016``)."""
        x = jnp.asarray(self._image)
        if self._cached_fn is None:
            self._cached_fn = jax.jit(self.as_func())
        ms = timing.benchmark(self._cached_fn, x, iterations=iterations)
        pixels = int(np.prod([d.extent for d in self.spec.dims])) * iterations
        print(
            f"{self._name}: {ms:.3f} ms for {iterations} iterations "
            f"({timing.throughput(ms, pixels):.2f} MiP/s)"
        )
        return ms

    def func(self, name: str):
        """Evaluate one internal stage by name for debugging
        (``RecFilter::func``, ``lib/recfilter.h:296-302``). Returns the
        stage's output array for the bound image.

        Stage values come from the SHIPPING dimfuse executor's matrices
        (``dimfuse.dim_pass_stages``): the G-tails, H-coupled carry
        solves, and injection residuals you inspect here are exactly what
        the fused pipeline computes (at HIGHEST-einsum grade). Dimensions
        evaluate group-major in first-appearance order, matching the
        executor (cross-dimension scans commute)."""
        from . import dimfuse

        spec = self.spec.stacked()
        stages = {st.name: st for st in graph.build_graph(spec)}
        if name not in stages:
            raise KeyError(
                f"no stage {name}; available: {sorted(stages)}"
            )
        st = stages[name]
        x = jnp.asarray(self._image)
        if st.scan_id is None:
            return x
        tiles = spec.tile_widths or (0,) * spec.ndim
        groups = spec.scans_by_axis()
        order = list(groups)
        ax = st.axis

        def run_group(x, a):
            ids = groups[a]
            if tiles[a]:
                return dimfuse.fused_dim_pass(
                    x, a, [spec.scans[i] for i in ids], tiles[a],
                    spec.border, matmul_precision="highest",
                )
            for i in ids:
                sc = spec.scans[i]
                x = scan_core.apply_scan(
                    x, a, sc.causal, sc.feedfwd, sc.feedback, spec.border
                )
            return x

        for a in order[: order.index(ax)]:
            x = run_group(x, a)
        ids = groups[ax]
        pos = ids.index(st.scan_id)
        if not tiles[ax] or st.tag == graph.INTRA_1:
            for i in ids[: pos + 1]:
                sc = spec.scans[i]
                x = scan_core.apply_scan(
                    x, ax, sc.causal, sc.feedfwd, sc.feedback, spec.border
                )
            return x
        vals = dimfuse.dim_pass_stages(
            x, ax, [spec.scans[i] for i in ids], tiles[ax], spec.border
        )
        kind = ("tdeps" if "_Intra_TDeps_" in name else
                "ctail" if "_Intra_CTail_" in name else
                "intra" if "_Intra_" in name else
                "deps" if "_Deps_" in name else "final")
        return vals[kind][pos]

    # ------------------------------------------------------------ scheduling
    def full_schedule(self) -> planner.RecFilterSchedule:
        if self.spec.tiled:
            raise RuntimeError(
                "Filter is tiled, use intra_schedule() and inter_schedule()"
            )
        return planner.RecFilterSchedule(self, "full")

    def intra_schedule(self, id: int = 1) -> planner.RecFilterSchedule:
        if not self.spec.tiled:
            raise RuntimeError("Filter is not tiled, use full_schedule()")
        return planner.RecFilterSchedule(self, f"intra({id})")

    def inter_schedule(self) -> planner.RecFilterSchedule:
        if not self.spec.tiled:
            raise RuntimeError("Filter is not tiled, use full_schedule()")
        return planner.RecFilterSchedule(self, "inter")

    def auto_schedule(self, tile_width: int = 0):
        """Auto planner (``gpu_auto_schedule``/``cpu_auto_schedule``,
        ``lib/recfilter.cpp:577-870``): optionally tile every scanned dim and
        let the Plan resolve backend/layout automatically."""
        if tile_width:
            self.split_all_dimensions(tile_width)
        self._plan = self._plan.with_(backend="auto")
        self._schedule_log.append(f"auto_schedule({tile_width})")
        self._cached_fn = None
        return self

    # GPU/CPU aliases for source-level parity with reference apps.
    def gpu_auto_schedule(self, tile_width: int = 0):
        return self.auto_schedule(tile_width)

    def cpu_auto_schedule(self, tile_width: int = 0):
        return self.auto_schedule(tile_width)

    def set_plan(self, **kw):
        """Directly set Plan fields (backend=, line_block=, interpret=, …)."""
        self._plan = self._plan.with_(**kw)
        self._cached_fn = None
        return self

    @property
    def plan(self) -> planner.Plan:
        return self._plan

    # Schedule-var handles (VarTag addressing, lib/recfilter.h:568-640).
    def full(self, i: Optional[int] = None):
        return planner.ScheduleVar("FULL", i)

    def inner(self, i: Optional[int] = None):
        return planner.ScheduleVar("INNER", i)

    def outer(self, i: Optional[int] = None):
        return planner.ScheduleVar("OUTER", i)

    def tail(self):
        return planner.ScheduleVar("TAIL")

    def inner_scan(self):
        return planner.ScheduleVar("INNER_SCAN")

    def outer_scan(self):
        return planner.ScheduleVar("OUTER_SCAN")

    def inner_channels(self):
        return planner.ScheduleVar("CHANNEL")

    @staticmethod
    def set_max_threads_per_cuda_warp(n: int):
        """Parity shim (``lib/recfilter.cpp:36-46``); informs default
        line-block sizing on TPU."""
        global _max_threads_per_warp
        assert n % 32 == 0, "max threads must be a multiple of 32"
        _max_threads_per_warp = n

    @staticmethod
    def set_vectorization_width(n: int):
        """Parity shim (``lib/recfilter.cpp:48-57``)."""
        global _vectorization_width
        assert n > 0 and (n & (n - 1)) == 0 and n <= 64
        _vectorization_width = n

    def apply_bounds(self):
        """Parity shim for ``RecFilter::apply_bounds``
        (``lib/recfilter.cpp``): Halide needs explicit output bounds before
        fusing pipelines; JAX shapes are static by construction, so this is
        a recorded no-op."""
        self._schedule_log.append("apply_bounds()")
        return self

    def compute_at(self, consumer, level=None):
        """Fuse this filter into a consumer stage — parity for
        ``RecFilter::compute_at`` (``lib/recfilter.cpp:507-573``), which the
        USM app uses to merge the blur's last kernel into the pointwise
        unsharp mask (``apps/usm/unsharp_mask_optimized.cpp:61-71``).

        The consumer is DISPATCHED to the real fusion machinery:

        * an elementwise callable ``consumer(filter_out, *aux)`` (verified
          by jaxpr inspection — every primitive elementwise, output shape
          preserved) fuses as the executor EPILOGUE: an in-VMEM out-block
          combine in the px kernel modes, dot-output fusion on the einsum
          path — the filter output never takes an extra HBM stream;
        * a 2-D shifted-tap bank ``[[(dy, dx, coeff), ...], ...]`` fuses
          as ``stencil2d`` into the 3-touch executor's emit;
        * anything else composes under one jit (XLA-level fusion), and the
          schedule log records WHY the in-kernel route was not taken.

        ``level`` maps the reference's loop-level Var: None or an
        inner/intra tag fuses at the filter's final kernel (the analog of
        ``compute_at(..., Var::gpu_threads())``); an outer/inter/root tag
        explicitly requests HBM materialization between the stages
        (``compute_root``-like) and forces jit composition; other values
        are rejected.

        Returns jitted ``fn(input, *aux) -> consumer(filter(input), *aux)``
        with the chosen route recorded on ``fn.fused_route``.
        """
        tag = None if level is None else str(getattr(level, "tag", level))
        if tag is not None:
            inner = any(k in tag.lower()
                        for k in ("intra", "inner", "thread", "vector"))
            outer = any(k in tag.lower()
                        for k in ("inter", "outer", "block", "root", "full"))
            if not inner and not outer:
                raise ValueError(
                    f"compute_at level {level!r}: expected an inner/intra "
                    "or outer/inter loop tag")
        else:
            inner, outer = True, False

        # Tap-bank consumer -> stencil2d fusion (an OUTER level explicitly
        # requests HBM materialization between the stages: filter first,
        # then the XLA-shift stencil on the materialized output).
        if isinstance(consumer, (list, tuple)):
            if outer:
                from .kernels.stencil2d import stencil2d_ref

                taps = [[(int(dy), int(dx), float(c)) for dy, dx, c in bank]
                        for bank in consumer]
                producer = self.as_func()
                fn = jax.jit(lambda x: stencil2d_ref(producer(x), taps))
                fn.fused_route = "composed"
                self._schedule_log.append(
                    "compute_at(<tap bank>)  # -> jit composition (XLA "
                    "shifts): level requests HBM materialization "
                    "(compute_root analog)")
                return fn
            fn = jax.jit(self.as_func(stencil2d=list(consumer)))
            fn.fused_route = "stencil2d"
            self._schedule_log.append(
                "compute_at(<tap bank>)  # -> stencil2d fusion "
                "(in-kernel emit)")
            return fn

        name = getattr(consumer, "__name__", "consumer")
        n_aux = max(_consumer_arity(consumer) - 1, 0)
        if inner and _is_elementwise(consumer, self.spec, n_aux):
            inner_fn = self.as_func(epilogue=consumer)
            fn = jax.jit(lambda x, *aux: inner_fn(x, *aux))
            fn.fused_route = "epilogue"
            self._schedule_log.append(
                f"compute_at({name})  # -> epilogue fusion into the final "
                "kernel (in-VMEM out-block combine / dot-output fusion)")
            return fn

        producer = self.as_func()
        fn = jax.jit(lambda x, *aux: consumer(producer(x), *aux))
        fn.fused_route = "composed"
        why = ("level requests HBM materialization (compute_root analog)"
               if outer else "consumer is not provably elementwise")
        self._schedule_log.append(
            f"compute_at({name})  # -> jit composition (XLA fusion): {why}")
        return fn

    # ------------------------------------------------------- reorder/cascade
    def cascade(self, *scan_groups) -> List["RecFilter"]:
        """Split this filter's scans into a chain of filters
        (``RecFilter::cascade``, ``lib/reorder.cpp:28-176``), with the same
        legality checks: every scan appears exactly once, and the relative
        order of opposite-causality scans in the same dimension is preserved.
        """
        spec = self.spec
        if len(scan_groups) == 1 and isinstance(scan_groups[0], (list, tuple)) \
                and scan_groups[0] and isinstance(scan_groups[0][0], (list, tuple)):
            scan_groups = tuple(scan_groups[0])
        groups = [list(g) for g in scan_groups]

        flat = [i for g in groups for i in g]
        if sorted(flat) != list(range(len(spec.scans))):
            raise ValueError(
                "cascade: each scan must appear in exactly one group"
            )
        # Opposite-causality same-dim scans must not be reordered
        # (lib/reorder.cpp:36-98).
        order_of = {s: gi for gi, g in enumerate(groups) for s in g}
        pos_in = {s: groups[order_of[s]].index(s) for s in flat}
        for i in range(len(spec.scans)):
            for j in range(i + 1, len(spec.scans)):
                si, sj = spec.scans[i], spec.scans[j]
                if si.axis == sj.axis and si.causal != sj.causal:
                    if (order_of[j], pos_in[j]) < (order_of[i], pos_in[i]):
                        raise ValueError(
                            "cascade: cannot swap opposite-causality scans "
                            f"{i} and {j} in the same dimension"
                        )

        out: List[RecFilter] = []
        for gi, g in enumerate(groups):
            f = RecFilter(f"{self._name}_{gi}")
            if self._clamped_border:
                f.set_clamped_image_border()
            f._image = self._image
            f._dtype = self._dtype
            f._spec = FilterSpec(
                name=f._name,
                dims=spec.dims,
                scans=tuple(spec.scans[i] for i in g),
                border=spec.border,
                dtype=spec.dtype,
                tile_widths=spec.tile_widths,
                tuple_width=spec.tuple_width,
            )
            f._plan = self._plan
            # Chain realization: each filter's input is the previous one's
            # output (lib/reorder.cpp:110-133).
            f._chain_parent = out[-1] if out else None
            out.append(f)
        return out

    def fuse_cascade(self, *others: "RecFilter",
                     epilogue: Optional[Callable] = None) -> Callable:
        """Fuse this filter and the following cascade stages back into ONE
        executor (module-level :func:`fuse_cascade`)."""
        return fuse_cascade([self, *others], epilogue=epilogue)

    def cascade_by_causality(self) -> List["RecFilter"]:
        """One filter per causality class (``lib/reorder.cpp:188-209``)."""
        spec = self.spec
        causal = [i for i, s in enumerate(spec.scans) if s.causal]
        anticausal = [i for i, s in enumerate(spec.scans) if not s.causal]
        groups = [g for g in (causal, anticausal) if g]
        return self.cascade(*groups)

    def cascade_by_dimension(self) -> List["RecFilter"]:
        """One filter per scanned dimension (``lib/reorder.cpp:211-229``)."""
        spec = self.spec
        groups = [g for g in spec.scans_by_axis().values() if g]
        return self.cascade(*groups)

    def overlap_to_higher_order_filter(
        self, other: "RecFilter", name: str = "O"
    ) -> "RecFilter":
        """Merge this filter with ``other`` into a single higher-order filter
        (``lib/reorder.cpp:231-381``): per-dimension, per-causality, the
        feedforward coefficients multiply and the feedback polynomials
        convolve (``overlap_feedback_coeff``, ``lib/iir_coeff.cpp:236-263``).
        """
        a, b = self.spec, other.spec
        if tuple(d.extent for d in a.dims) != tuple(d.extent for d in b.dims):
            raise ValueError("overlap: filters must have identical dims")
        if a.border != b.border:
            raise ValueError("overlap: filters must have identical border")
        if len(a.scans) != len(b.scans):
            raise ValueError("overlap: filters must have matching scan lists")
        merged: List[Scan] = []
        for sa, sb in zip(a.scans, b.scans):
            if sa.axis != sb.axis or sa.causal != sb.causal:
                raise ValueError(
                    "overlap: scans must match in dimension and causality"
                )
            fb = iir.overlap_feedback_coeff(list(sa.feedback), list(sb.feedback))
            merged.append(
                Scan(sa.axis, sa.causal, sa.feedfwd * sb.feedfwd, tuple(fb))
            )
        f = RecFilter(name)
        if self._clamped_border:
            f.set_clamped_image_border()
        f._image = self._image
        f._dtype = self._dtype
        f._spec = FilterSpec(
            name=name,
            dims=a.dims,
            scans=tuple(merged),
            border=a.border,
            dtype=a.dtype,
            tile_widths=a.tile_widths,
            tuple_width=a.tuple_width,
        )
        f._plan = self._plan
        return f

    # ------------------------------------------------------------- printing
    def print_synopsis(self) -> str:
        s = graph.synopsis(self.spec)
        print(s)
        return s

    def print_functions(self) -> str:
        s = graph.print_functions(self.spec)
        print(s)
        return s

    def print_schedule(self) -> str:
        s = "\n".join(self._schedule_log) or "(no schedule directives)"
        print(s)
        return s

    def print_hl_code(self) -> str:
        """Emit a re-runnable Python program reconstructing this filter —
        the analog of the reference's re-runnable Halide C++ dump
        (``lib/recfilter_utils.cpp:121-222``)."""
        spec = self.spec
        lines = ["import recfilter_tpu as rf", ""]
        for d in spec.dims:
            lines.append(f"{d.name} = rf.Dim({d.name!r}, {d.extent})")
        lines.append(f"F = rf.RecFilter({spec.name!r})")
        if spec.border == BorderMode.CLAMP:
            lines.append("F.set_clamped_image_border()")
        dimlist = ", ".join(d.name for d in spec.dims)
        lines.append(f"F[{dimlist}] = image  # bind your input here")
        for s in spec.scans:
            sign = "+" if s.causal else "-"
            co = [s.feedfwd] + list(s.feedback)
            lines.append(
                f"F.add_filter({sign}{spec.dims[s.axis].name}, {co!r})"
            )
        if spec.tiled:
            pairs = ", ".join(
                f"{d.name}, {t}"
                for d, t in zip(spec.dims, spec.tile_widths)
                if t
            )
            lines.append(f"F.split({pairs})")
        # Plan replay (VERDICT r2 #9): a dumped program must reproduce the
        # PERFORMANCE configuration, not just the semantics — the analog of
        # the reference's print_schedule emitting re-runnable scheduling
        # C++ (``lib/recfilter_utils.cpp:121-222``). Only non-default knobs
        # are emitted, so a default filter round-trips to a default Plan.
        default = planner.Plan()
        plan_kw = []
        for field in ("backend", "line_block", "unroll", "matmul_dtype",
                      "matmul_precision", "rotate_emit", "interpret"):
            v = getattr(self._plan, field)
            if field == "matmul_precision":
                if v != planner._DEFAULT_MATMUL_PRECISION[0]:
                    plan_kw.append(f"{field}={v!r}")
            elif v != getattr(default, field):
                plan_kw.append(f"{field}={v!r}")
        if plan_kw:
            lines.append(f"F.set_plan({', '.join(plan_kw)})")
        code = "\n".join(lines)
        print(code)
        return code

    def __repr__(self) -> str:
        if self._spec is None:
            return f"RecFilter({self._name!r}, undefined)"
        return graph.synopsis(self._spec)


def fuse_cascade(filters: Sequence["RecFilter"],
                 epilogue: Optional[Callable] = None) -> Callable:
    """Fuse a cascade chain back into ONE executor.

    A filter IS an ordered scan list, so the cascade ``Fk∘…∘F1`` (each
    stage's input the previous stage's output, ``lib/reorder.cpp:110-133``)
    equals a single filter whose scan list is the stages' concatenation.
    Running that merged filter through the fused executor recovers the
    cross-pass optimizations that stage boundaries break: rotation chaining
    and px tails chaining span what were separate jitted stages, so e.g. the
    cascaded-by-dimension Gaussian drops from 6 HBM touches (3 per stage in
    px modes) to the overlapped filter's 5. This is the TPU analog of the
    reference's ``compute_at`` fusion of cascade stages into the consumer's
    kernels (``apps/usm/unsharp_mask_optimized.cpp:61-71``) — there it saves
    kernel launches and shared-memory round-trips; here, whole HBM passes.

    Stages must share dims, border, dtype, and Tuple width. ``epilogue``
    fuses a pointwise combine into the LAST pass (see
    :meth:`RecFilter.as_func`).
    """
    fs = list(filters)
    if not fs:
        raise ValueError("fuse_cascade: no filters given")
    specs = [f.spec for f in fs]
    base = specs[0]
    for s in specs[1:]:
        if s.dims != base.dims:
            raise ValueError("fuse_cascade: stages must share dimensions")
        if s.border != base.border or s.dtype != base.dtype:
            raise ValueError("fuse_cascade: stages must share border/dtype")
        if s.tuple_width != base.tuple_width:
            raise ValueError("fuse_cascade: stages must share Tuple width")
    f = RecFilter("_".join(x._name for x in fs))
    if fs[0]._clamped_border:
        f.set_clamped_image_border()
    f._image = fs[0]._image
    f._dtype = fs[0]._dtype
    f._spec = FilterSpec(
        name=f._name,
        dims=base.dims,
        scans=tuple(sc for s in specs for sc in s.scans),
        border=base.border,
        dtype=base.dtype,
        tile_widths=base.tile_widths,
        tuple_width=base.tuple_width,
    )
    # Inherit the first stage's Plan, but never its rotated-emit contract:
    # the merged filter chains layouts internally and must emit naturally.
    f._plan = dataclasses.replace(fs[0]._plan, rotate_emit=0)
    return f.as_func(epilogue)
