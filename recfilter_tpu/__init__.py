"""recfilter_tpu — TPU-native n-D recursive (IIR) filter engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mit-gfx/recfilter
(the Halide overlapped-tiling DSL of Nehab et al. 2011): causal/anticausal
recursive scans of arbitrary order over n-D arrays, tiled into per-tile MXU
matmuls plus a closed-form cross-tile carry solve, with Pallas fused kernels
on the hot path and mesh sharding (data + sequence parallel) across chips.

Public surface mirrors the reference's ergonomics (``lib/recfilter.h``):

    import recfilter_tpu as rf

    x = rf.Dim("x", 4096); y = rf.Dim("y", 4096)
    F = rf.RecFilter("SAT")
    F[x, y] = image                      # F(x,y) = image(x,y)
    F.add_filter(+x, [1.0, 1.0])
    F.add_filter(+y, [1.0, 1.0])
    F.split(x, 32, y, 32)
    out = F.realize()
"""

from .spec import (BorderMode, Dim, DimAndCausality, FilterSpec, Scan,
                   spec_from_json, spec_to_json)
from .iir import (
    gaussian_weights,
    integral_image_coeff,
    overlap_feedback_coeff,
    gaussian_box_filter,
    gaussian,
    gauss_derivative,
    gauss_integral,
    reference_gaussian,
)
from .api import RecFilter
from .planner import Plan, set_default_matmul_precision
from .utils.args import Arguments
from .utils.testing import (
    CheckResult,
    CheckResultVerbose,
    generate_random_image,
)

RecFilterDim = Dim  # reference name alias (lib/recfilter.h:68)
RecFilterDimAndCausality = DimAndCausality  # (lib/recfilter.h:98)

__all__ = [
    "RecFilter",
    "Plan",
    "set_default_matmul_precision",
    "RecFilterDim",
    "RecFilterDimAndCausality",
    "Dim",
    "DimAndCausality",
    "FilterSpec",
    "Scan",
    "BorderMode",
    "spec_to_json",
    "spec_from_json",
    "gaussian_weights",
    "integral_image_coeff",
    "overlap_feedback_coeff",
    "gaussian_box_filter",
    "gaussian",
    "gauss_derivative",
    "gauss_integral",
    "reference_gaussian",
    "Arguments",
    "CheckResult",
    "CheckResultVerbose",
    "generate_random_image",
]

__version__ = "0.1.0"
