"""Stage DAG introspection: names, tags, and producer/consumer links.

The reference materializes its tiling transformation as a DAG of generated
Halide Functions, each tagged for the collective scheduler
(``FunctionTag``: INLINE/INTER/INTRA_N/INTRA_1/REINDEX,
``lib/recfilter_internals.h:23-29``; naming scheme ``lib/split.cpp:20-30``).
In the TPU build the "functions" are fused array programs, but the same DAG
is still the right mental model and debugging surface — so we synthesize the
equivalent stage graph from a FilterSpec, use the reference's names/tags, and
let ``RecFilter.func(name)`` evaluate any stage in isolation (parity with
``RecFilter::func``, ``lib/recfilter.h:296-302``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .spec import FilterSpec

# FunctionTag values (lib/recfilter_internals.h:23-29)
INLINE = "INLINE"
INTER = "INTER"
INTRA_N = "INTRA_N"
INTRA_1 = "INTRA_1"
REINDEX = "REINDEX"

# VarTag values (lib/recfilter_internals.h:31-44)
FULL = "FULL"
INNER = "INNER"
OUTER = "OUTER"
TAIL = "TAIL"
SCAN = "SCAN"
CHANNEL = "CHANNEL"


@dataclasses.dataclass(frozen=True)
class Stage:
    """One node of the synthesized stage DAG."""

    name: str
    tag: str
    axis: Optional[int]  # scanned dimension, if any
    scan_id: Optional[int]  # index into spec.scans, if any
    consumes: Tuple[str, ...]
    doc: str

    def __repr__(self) -> str:
        return f"<Stage {self.name} [{self.tag}] reads {list(self.consumes)}>"


def build_graph(spec: FilterSpec) -> List[Stage]:
    """Synthesize the stage DAG for a (possibly tiled) filter.

    Untiled: a single full-scan stage per scan. Tiled: per scan, the intra
    tail extraction (INTRA_N), the completed-carry solve (INTER), and the
    completion term feeding the final result (REINDEX), following the
    reference's naming scheme (``lib/split.cpp:20-30``).
    """
    stages: List[Stage] = [
        Stage(spec.name, INLINE, None, None, (), "pure initialization")
    ]
    prev = spec.name
    tiles = spec.tile_widths or (0,) * spec.ndim
    for i, s in enumerate(spec.scans):
        dim = spec.dims[s.axis]
        cz = "" if s.causal else "a"
        if tiles[s.axis]:
            intra = f"{spec.name}_Intra_{dim.name}_{cz}{i}"
            ctail = f"{spec.name}_Intra_CTail_{dim.name}_{cz}{i}"
            final = f"{spec.name}_Final_{dim.name}_{cz}{i}"
            stages.append(
                Stage(
                    intra, INTRA_N, s.axis, i, (prev,),
                    "per-tile local tails b = P·B·x (MXU matmul)",
                )
            )
            stages.append(
                Stage(
                    ctail, INTER, s.axis, i, (intra,),
                    "cross-tile carry solve s = M·b (block-Toeplitz matmul)",
                )
            )
            stages.append(
                Stage(
                    final, REINDEX, s.axis, i, (prev, ctail),
                    "completion y = [R|B]·[s_prev; x] (fused matmul)",
                )
            )
            prev = final
        else:
            full = f"{spec.name}_Scan_{dim.name}_{cz}{i}"
            stages.append(
                Stage(full, INTRA_1, s.axis, i, (prev,), "full lax.scan pass")
            )
            prev = full
    return stages


def synopsis(spec: FilterSpec) -> str:
    """Human-readable summary — analog of ``print_synopsis``
    (``lib/recfilter.cpp:1024-1032``)."""
    lines = [f"RecFilter {spec.name} [{spec.dtype}, border={spec.border}]"]
    for d, t in zip(spec.dims, spec.tile_widths or (0,) * spec.ndim):
        tiled = f" tiled {t}" if t else ""
        lines.append(f"  dim {d.name}: extent {d.extent}{tiled}")
    for i, s in enumerate(spec.scans):
        sign = "+" if s.causal else "-"
        lines.append(
            f"  scan {i}: {sign}{spec.dims[s.axis].name} order {s.order} "
            f"b0={s.feedfwd:g} a={list(s.feedback)}"
        )
    return "\n".join(lines)


def print_functions(spec: FilterSpec) -> str:
    """Stage-DAG dump — analog of ``print_functions``
    (``lib/recfilter.cpp:1024``)."""
    return "\n".join(repr(st) for st in build_graph(spec))
