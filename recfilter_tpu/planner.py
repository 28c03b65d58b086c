"""Execution planner: the TPU-native replacement for the collective scheduler.

The reference's scheduler (``lib/schedule.cpp``) applies Halide scheduling
primitives to *sets* of generated functions selected by FunctionTag, with loop
variables addressed by VarTag — because on a GPU the user must hand-place
loops onto blocks/threads/registers. On TPU, XLA owns fusion and loop
placement, so the planner's real decisions are different and fewer:

  * tile width per dimension        (≙ split factors, ``lib/split.cpp:1850``)
  * executor backend                (einsum matmul path, fused Pallas kernels,
                                     or the lax.scan core)
  * line-block size for kernels     (≙ warp/thread shaping,
                                     ``lib/recfilter.cpp:825-853``)
  * storage layout between passes   (≙ ``storage_layout``,
                                     ``lib/schedule.cpp:835-913``)
  * device mesh + sharding          (no reference analog — single-GPU there)

``RecFilterSchedule`` keeps the reference's tag-addressed, chainable directive
API (``lib/recfilter.h:516-566``) for source-level parity: every directive is
recorded (replayable via ``print_schedule``, like
``lib/recfilter.cpp:1034-1079``) and the ones with a real TPU meaning update
the underlying :class:`Plan`; the rest are accepted as documented no-ops
because XLA subsumes them.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .spec import FilterSpec


# Shipping default: px6 — true-f32 accuracy (1.4e-6 max rel err at 4K,
# marginally better than Precision.HIGHEST's 1.6e-6) via the VMEM-split
# completion/tails kernels at 1.6x HIGHEST's speed (0.94 vs 1.47 ms,
# gaussian3 4K measured). Where the kernels' static gates don't apply
# (non-128 tiles, CPU, audio-scale tile counts) px6 degrades to HIGHEST
# einsums — same accuracy, the round-1 default. Opt-outs: "px3" (~5e-5,
# 0.62 ms), "default" (1-pass bf16 dots, ~5e-2, 0.40 ms), bf16 storage.
_DEFAULT_MATMUL_PRECISION = ["px6"]


def set_default_matmul_precision(p: str) -> None:
    """Process-wide default for Plan.matmul_precision
    ("highest" | "high" | "f32x6" | "f32x4" | "f32x3" | "px3" | "px4" | "px6" |
    "default"). Composite apps build internal filters with fresh Plans;
    this is how a benchmark or serving config switches them all to the
    fast modes at once."""
    assert p in ("highest", "high", "f32x6", "f32x4", "f32x3", "f32x9",
                 "px3", "px4", "px6", "default")
    _DEFAULT_MATMUL_PRECISION[0] = p


@dataclasses.dataclass(frozen=True)
class Plan:
    """Static execution plan for a filter (hashable; jit-static)."""

    backend: str = "auto"  # auto | einsum | pallas | scan | oracle
    line_block: int = 0  # pallas strip height in lines; 0 = auto from the
    # VMEM budget (kernels/fused._pick_line_block); a request is quantized
    # to the layout alignment and clamped to the budget. Set via
    # ``schedule.vectorize(var, width)``.
    unroll: int = 1  # pallas in-kernel unroll of the tile-carry loop
    # (lax.fori_loop unroll). Set via ``schedule.unroll(var, factor)``.
    mesh_axes: Tuple[str, ...] = ()  # e.g. ("data",) or ("data", "seq")
    mesh_shape: Tuple[int, ...] = ()
    data_axis: Optional[int] = None  # array axis sharded over "data"
    seq_axis: Optional[int] = None  # array axis sharded over "seq" (scan dim)
    interpret: bool = False  # pallas interpreter mode (CPU tests)
    matmul_dtype: str = "float32"  # bfloat16 = fast B matmuls, f32 accumulate
    matmul_precision: str = dataclasses.field(
        default_factory=lambda: _DEFAULT_MATMUL_PRECISION[0]
    )  # highest | high | f32x6 | f32x4 | f32x3 | px3 | px4 | default
    # (TPU f32 dots default to single-pass bf16 at ~1e-2 rel error; highest
    # restores true f32 at ~2.7x matmul cost; f32x6/f32x4/f32x3 are the
    # compensated split-bf16 einsum modes — see dimfuse._split_einsum;
    # px3/px4/px6 run the split products inside the Pallas completion kernel
    # (kernels/completion.py) with VMEM-resident chunking — accurate mode
    # at near-throughput cost)
    rotate_emit: int = 0
    # Layout chaining for single-dimension filters (the TPU meaning of the
    # reference's ``storage_layout`` directive, ``lib/schedule.cpp:835-913``):
    # nonzero opts into the contract that the INPUT array carries the scanned
    # dimension as its LAST axis, and the result is emitted with the trailing
    # ``rotate_emit`` axes rotated one step (free in the matmul epilogue).
    # Chaining an x-scan and a y-scan filter with rotate_emit=2 runs both in
    # lanes-contraction form with no relayout copy between them — see
    # ``dimfuse.apply_filter_rotated``.

    def with_(self, **kw) -> "Plan":
        return dataclasses.replace(self, **kw)


def resolve_backend(spec: FilterSpec, plan: Plan, platform: str) -> str:
    """Pick the executor for ``auto``: the fused einsum/px path for tiled
    filters (integers included — the exact limb decomposition,
    ``dimfuse.apply_filter_int_exact``, runs them through the SAME tiled
    pipeline as the reference does by casting coefficients into the image
    type, ``lib/recfilter.cpp:324-341``; it falls back to lax.scan itself
    when exactness is not provable), lax.scan for untiled specs."""
    import jax.numpy as jnp

    if plan.backend != "auto":
        return plan.backend
    if jnp.issubdtype(jnp.dtype(spec.dtype), jnp.integer):
        return "einsum" if spec.tiled else "scan"
    if spec.tiled:
        # The fused per-dimension einsum path (dimfuse) has no sequential
        # device code at all and measures faster than the strip-resident
        # Pallas kernels (whose in-VMEM tile loop is a dependent-matmul
        # latency chain); it is the default everywhere. "pallas" remains
        # selectable via Plan/compute_locally.
        return "einsum"
    return "scan"


def default_tile_width(extent: int, platform: str) -> int:
    """Auto tile width. The reference defaults to 32
    (``lib/recfilter_utils.cpp:32-36``); on TPU the fused-dimension einsum
    path measures fastest at 128 (the einsums are bandwidth-bound and a
    128-contraction fills the MXU)."""
    t = 128 if platform == "tpu" else 32
    return max(min(t, extent), 1)


def auto_tile_width(extent: int) -> int:
    """Platform-resolved :func:`default_tile_width` (4K DoG measures 5.0 ms
    at T=128 vs 6.9 ms at the reference's T=32 on one v5e chip)."""
    import jax

    return default_tile_width(extent, jax.default_backend())


class ScheduleVar:
    """A tag-addressed loop variable handle (VarTag analog,
    ``lib/recfilter_internals.h:31-44``)."""

    def __init__(self, tag: str, index: Optional[int] = None):
        self.tag = tag
        self.index = index

    def split_var(self) -> "ScheduleVar":
        return ScheduleVar(self.tag + "_split", self.index)

    def __repr__(self) -> str:
        i = "" if self.index is None else f"({self.index})"
        return f"{self.tag}{i}"


class RecFilterSchedule:
    """Chainable, recorded schedule over a set of stages selected by tag.

    Parity object for ``RecFilterSchedule`` (``lib/recfilter.h:516-566``,
    impl ``lib/schedule.cpp``). Directives that map to real TPU knobs mutate
    the owner's Plan; all are recorded for ``print_schedule``.
    """

    def __init__(self, owner, selector: str):
        self._owner = owner  # RecFilter
        self._selector = selector  # "intra(1)" | "intra(2)" | "inter" | "full"
        self._log: List[str] = []

    # -- recording helper ---------------------------------------------------
    def _rec(self, directive: str, mapping: str = "") -> "RecFilterSchedule":
        """Record ``directive`` with its TPU-mapping report.

        The reference applies every directive literally (GPU loop
        placement); here each one is annotated with what it did — a Plan
        knob it set, or WHY it is subsumed on TPU — so a user porting a
        reference schedule sees a mapping report, never a silent no-op.
        """
        self._log.append(directive)
        note = f"  # {mapping}" if mapping else ""
        self._owner._schedule_log.append(
            f"{self._selector}: {directive}{note}")
        return self

    # -- directives with a real TPU mapping ---------------------------------
    def compute_locally(self) -> "RecFilterSchedule":
        """Stage in VMEM next to its consumer (≙ ``compute_at`` into
        gpu_blocks, ``lib/schedule.cpp:219-293``): selects the fused Pallas
        backend where intra-tile terms never touch HBM."""
        if self._selector.startswith("intra"):
            self._owner._plan = self._owner._plan.with_(backend="pallas")
            return self._rec("compute_locally()", "-> Plan.backend='pallas'")
        return self._rec(
            "compute_locally()",
            "no-op: inter-tile carries are HBM-global by construction")

    def compute_globally(self) -> "RecFilterSchedule":
        """Materialize the stage in HBM (≙ ``compute_root``,
        ``lib/schedule.cpp:188-217``): the einsum backend's behavior."""
        if self._selector.startswith("intra"):
            self._owner._plan = self._owner._plan.with_(backend="einsum")
            return self._rec("compute_globally()",
                             "-> Plan.backend='einsum'")
        return self._rec("compute_globally()",
                         "no-op: inter-tile stages already HBM-global")

    def unroll(self, var=None, factor: int = 0) -> "RecFilterSchedule":
        if factor:
            self._owner._plan = self._owner._plan.with_(unroll=factor)
            return self._rec(f"unroll({var})",
                             f"-> Plan.unroll={factor} (pallas backend)")
        return self._rec(
            f"unroll({var})",
            "no-op without factor: XLA unrolls traced loops; pass "
            "factor= to set Plan.unroll for the pallas backend")

    def vectorize(self, var=None, width: int = 0) -> "RecFilterSchedule":
        if width:
            self._owner._plan = self._owner._plan.with_(line_block=width)
            return self._rec(
                f"vectorize({var})",
                f"-> Plan.line_block={width} (pallas strip height)")
        return self._rec(
            f"vectorize({var})",
            "no-op without width: the VPU vectorizes lanes implicitly; "
            "pass width= to set Plan.line_block for the pallas backend")

    def gpu_threads(self, *vars) -> "RecFilterSchedule":
        return self._rec(
            f"gpu_threads{vars}",
            "no-op: no thread placement on TPU — Mosaic/XLA own the "
            "lane/sublane mapping")

    def gpu_blocks(self, *vars) -> "RecFilterSchedule":
        return self._rec(
            f"gpu_blocks{vars}",
            "no-op: tile-grid placement is the pallas grid / XLA "
            "fusion's job; tile sizes come from RecFilter.split()")

    def parallel(self, var=None, factor: int = 0) -> "RecFilterSchedule":
        return self._rec(
            f"parallel({var})",
            "no-op single-chip: cross-chip parallelism is "
            "set_plan(mesh_axes=..., mesh_shape=...) sharding")

    def split(self, var, factor: int) -> "RecFilterSchedule":
        return self._rec(
            f"split({var}, {factor})",
            "no-op: loop splitting ≙ tiling — use RecFilter.split(dim, w)")

    def fuse(self, a, b) -> "RecFilterSchedule":
        return self._rec(f"fuse({a}, {b})",
                         "no-op: XLA fuses producer/consumer loops itself")

    def rename(self, a, b=None) -> "RecFilterSchedule":
        """Loop-variable rename (the reference builds gpu_blocks/threads as
        parallel().rename(), ``lib/schedule.cpp:19-29``)."""
        return self._rec(f"rename({a}, {b})",
                         "no-op: loop names don't survive XLA tracing")

    def reorder(self, *vars) -> "RecFilterSchedule":
        return self._rec(
            f"reorder{vars}",
            "no-op: XLA picks loop order inside fusions; pass order is "
            "the scan list order (see RecFilter.cascade)")

    def reorder_storage(self, *vars) -> "RecFilterSchedule":
        """Storage-order directive (``lib/schedule.cpp:915-990``). The real
        TPU layout knob is ``Plan.rotate_emit`` (rotated-emit pipeline
        chaining, set via ``set_plan``); XLA owns intra-pass layouts."""
        return self._rec(
            f"reorder_storage{vars}",
            "no-op: intra-pass layout is XLA's; inter-pass layout is "
            "Plan.rotate_emit (set_plan(rotate_emit=...))")

    def storage_layout(self, *args) -> "RecFilterSchedule":
        """``lib/schedule.cpp:835-913`` analog — see :meth:`reorder_storage`
        and ``Plan.rotate_emit``."""
        return self._rec(
            f"storage_layout{args}",
            "no-op: see reorder_storage — the TPU knob is "
            "Plan.rotate_emit")

    def __repr__(self) -> str:
        body = "\n".join(f"    .{d}" for d in self._log)
        return f"RecFilterSchedule[{self._selector}]\n{body}"
