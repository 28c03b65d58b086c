"""Fused per-dimension executor: all scans of a dimension in 3 HBM touches.

This is the TPU generalization of the reference's 3-phase tiled execution
(intra kernels → sequential CTail kernel → final kernel,
``lib/recfilter.cpp:991-1016``), extended to ANY number of same-dimension
scans of mixed causality in a FIXED number of passes — the role of the
reference's hardest code, the cross-scan tail-dependency algebra
(``create_tail_residual_term`` ``lib/split.cpp:912-1004`` and
``add_prev_dimension_residual_to_tails`` ``:1215-1633``) — but derived as
plain matrix identities instead of IR rewrites:

Per tile t (natural orientation; anticausal scans carry anti-diagonal
transforms J·B·J, J·R baked into their matrices host-side):

    y⁰ = x_t
    yⁱ = B_i y^{i-1} + RN_i Nⁱ_t                   (scan i completion)

with Nⁱ the solved incoming carries. Expanding:

    yⁱ = Btot_i x_t + Σ_{j≤i} Rhat_{i,j} Nʲ_t
    bⁱ_t = G_i x_t + Σ_{j<i} H_{i,j} Nʲ_t          (local tails of scan i)

    Btot_i   = B_i···B_1
    Rhat_{i,j} = (B_i···B_{j+1}) RN_j,  Rhat_{i,i} = RN_i
    G_i      = Sel_iᵀ Btot_i
    H_{i,j}  = Sel_iᵀ B_i Rhat_{i-1,j}

and Nⁱ = CM_i · stack(bⁱ) solves each scan's cross-tile recurrence with one
small precomputed block-Toeplitz matmul. Execution per dimension:

    pass A (parallel einsum): read X → all bⁱ (tiny, K/T of the data)
    solve   (tiny matmuls):   Nⁱ, sequenced over scans only (m ≤ 4)
    pass B (parallel einsum): read X → Y via one fused (T, T+Σk) matmul

No sequential device code, no latency chains — every large op is an
independent batched MXU matmul. Clamped borders change the matrices of the
globally-first/last tile only (``lib/split.cpp:625-654``); those tiles get
per-tile matrix variants, selected by a static index stack.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import coeffs
from .spec import BorderMode, FilterSpec, Scan


_FORCE_INTERPRET = False


def _interp() -> bool:
    """Pallas interpret mode: non-TPU backends always interpret; a TPU
    backend interprets only under :func:`force_interpret` (how
    ``Plan(interpret=True)`` reaches the executor's internal kernel
    call sites — they have no plan in scope)."""
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


class force_interpret:
    """Context manager: trace everything inside with pallas interpret on.

    Used by the sharded routes (``parallel.sharding``) to honor
    ``Plan(interpret=True)`` on a real TPU backend — the shard_map body
    is traced inside the ``with`` block, so the flag reaches every
    kernel gate without threading an argument through the executor."""

    def __init__(self, on: bool = True):
        self.on = bool(on)

    def __enter__(self):
        global _FORCE_INTERPRET
        self.prev = _FORCE_INTERPRET
        _FORCE_INTERPRET = _FORCE_INTERPRET or self.on
        return self

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self.prev
        return False


# ---------------------------------------------------------------------------
# Host-side matrix preparation
# ---------------------------------------------------------------------------


def _scan_base_mats(s: Scan, T: int, clamp: bool):
    """Direction-transformed (natural orientation) per-scan matrices."""
    k = s.order
    B = coeffs.impulse_matrix(s.feedfwd, s.feedback, T)
    Bf = (
        coeffs.impulse_matrix(s.feedfwd, s.feedback, T, clamp_border=True)
        if clamp
        else B
    )
    R = coeffs.state_matrix(s.feedback, T)
    Jk = coeffs.antidiagonal(k)
    Sel = np.zeros((T, k))
    if s.causal:
        RN = R @ Jk  # corr from natural (ascending last-k) prev carry
        for j in range(k):
            Sel[T - k + j, j] = 1.0
    else:
        B = B[::-1, ::-1].copy()
        Bf = Bf[::-1, ::-1].copy()
        RN = R[::-1, :]
        for j in range(k):
            Sel[j, j] = 1.0
    return B, Bf, RN, Sel


def _chain_matrix(s: Scan, T: int, n: int) -> np.ndarray:
    """CM (n·k × n·k): stacked natural local tails b → stacked natural
    incoming vectors N (corr_t = RN · N_t). Direction folded in."""
    k = s.order
    W = coeffs.tail_weight_matrix(s.feedback, T)
    Jk = coeffs.antidiagonal(k)
    powers = [np.eye(k)]
    for _ in range(n):
        powers.append(W @ powers[-1])
    C = np.zeros((n, k, n, k))
    for t in range(n):
        if s.causal:
            for i in range(t):
                C[t, :, i, :] = Jk @ powers[t - 1 - i] @ Jk
        else:
            for i in range(t + 1, n):
                C[t, :, i, :] = powers[i - 1 - t]
    return C.reshape(n * k, n * k)


def pad_rows8(G: np.ndarray) -> np.ndarray:
    """Zero-pad a stacked-G row axis to >= 8 so XLA lowers the contraction
    as a dot — below 8 output rows it emits a broadcast+reduce chain
    costing one full-size stream per row (single source of truth for the
    sublane-quantum threshold; used by dimfuse and overlap2d)."""
    if G.shape[1] >= 8:
        return G
    pad = np.zeros((G.shape[0], 8 - G.shape[1], G.shape[2]))
    return np.concatenate([G, pad], axis=1)


def combined_solve_matrix(mats: "DimPassMats", n: int) -> np.ndarray:
    """Fold every scan's chain solve AND the cross-scan H-couplings into one
    (n·ΣK × n·ΣK) matrix: N_cat = CMfull · b_raw_cat (interleaved per-tile
    layout, matching the stacked-G tails and concatenated Rhat).

    The per-scan system is block-triangular:
        N_i = CM_i (b_i^raw + Σ_{j<i} Hblk_{ij} N_j)
    so CMfull rows build up scan by scan — one device matmul replaces the
    per-scan solve/correction op chain (dispatch overhead dominates the
    small ops on this stack)."""
    m = len(mats.orders)
    S = sum(mats.orders)
    if m == 1:
        # Single scan: the embedding E is the identity and CMfull is the
        # scan's own chain matrix — skip the O((n·k)³) matmul (high-order
        # audio builds n=256/k=29 here: 0.4 TFLOP of float64 saved per
        # trace).
        return np.asarray(mats.CM[0])
    offs = np.cumsum([0] + mats.orders)
    rows: list = [None] * m  # rows[i]: (n*k_i, n*S) mapping braw_cat → N_i

    def hblk(i, j):
        Hs = mats.H[i][j]
        ki, kj = mats.orders[i], mats.orders[j]
        out = np.zeros((n * ki, n * kj))
        for t in range(n):
            Ht = Hs[t if Hs.shape[0] > 1 else 0]
            out[t * ki : (t + 1) * ki, t * kj : (t + 1) * kj] = Ht
        return out

    for i in range(m):
        ki = mats.orders[i]
        E = np.zeros((n * ki, n * S))
        for t in range(n):
            E[t * ki : (t + 1) * ki,
              t * S + offs[i] : t * S + offs[i] + ki] = np.eye(ki)
        acc = E
        for j in range(i):
            acc = acc + hblk(i, j) @ rows[j]
        rows[i] = mats.CM[i] @ acc

    full = np.zeros((n * S, n * S))
    for i in range(m):
        ki = mats.orders[i]
        for t in range(n):
            full[t * S + offs[i] : t * S + offs[i] + ki, :] = rows[i][
                t * ki : (t + 1) * ki, :
            ]
    return full


def seq_seed_maps(scans: Sequence[Scan], T: int, n: int):
    """Maps that connect one dimension's TILE-level chain to the
    DEVICE-level carry exchange (round-5, VERDICT r4 #3), built from a
    virtually-extended (n+2)-tile chain so every convention (J flips,
    cross-scan H couplings, causality) comes from the already-tested
    combined-solve algebra:

    * ``Out`` (ΣK, n·ΣK): maps the device's per-tile raw tails b_cat to
      its OUTGOING natural tails — the would-be incoming vectors of a
      virtual tile past the device edge (tile n+1 for causal scans, tile
      0 for anticausal), which is exactly the ccat the device exchange
      consumes.
    * ``K`` (n, ΣK, ΣK): maps the device's INCOMING natural vectors
      (the exchange's solved N) to per-tile incoming-carry seeds — a
      virtual edge tile whose raw tail IS the incoming vector (b₀ = N
      reproduces N₁ = N since J² = I). Adding ``K[t]·N_dev`` to the
      executor's solved carries makes its completion the exact global
      result: zero extra image streams for sequence sharding.

    Zero border, uniform tiles (the clamp/pad variants keep the cascade
    path)."""
    ne = n + 2
    mats = prepare_dim_pass(scans, T, ne, clamp=False)
    orders = [s.order for s in scans]
    m = len(orders)
    S = int(sum(orders))
    offs = np.cumsum([0] + orders)

    # Combined solve over the extended chain with the cross-scan H
    # couplings ZEROED at the virtual tiles: a real device edge has no
    # tile past it for an earlier scan's carry to be injected into (and
    # carried back by an anticausal later scan) — and the device-level
    # exchange already couples the scans' incoming vectors OUTSIDE the
    # device, so tile-level coupling at the virtual tiles would
    # double-count. Mirrors combined_solve_matrix with that one mask.
    def hblk(i, j):
        Hs = mats.H[i][j]
        ki, kj = orders[i], orders[j]
        out = np.zeros((ne * ki, ne * kj))
        for t in range(1, ne - 1):  # virtual tiles 0 and ne-1 masked
            Ht = Hs[t if Hs.shape[0] > 1 else 0]
            out[t * ki:(t + 1) * ki, t * kj:(t + 1) * kj] = Ht
        return out

    rows: list = [None] * m
    for i in range(m):
        ki = orders[i]
        E = np.zeros((ne * ki, ne * S))
        for t in range(ne):
            E[t * ki:(t + 1) * ki,
              t * S + offs[i]:t * S + offs[i] + ki] = np.eye(ki)
        acc = E
        for j in range(i):
            acc = acc + hblk(i, j) @ rows[j]
        rows[i] = _chain_matrix(scans[i], T, ne) @ acc
    CM = np.zeros((ne * S, ne * S))
    for i in range(m):
        ki = orders[i]
        for t in range(ne):
            CM[t * S + offs[i]:t * S + offs[i] + ki, :] = rows[i][
                t * ki:(t + 1) * ki, :]

    K = np.zeros((n, S, S))
    Out = np.zeros((S, n * S))
    for i, s in enumerate(scans):
        k = orders[i]
        src, outt = (0, n + 1) if s.causal else (n + 1, 0)
        for t in range(n):
            K[t, :, offs[i]:offs[i + 1]] = CM[
                (t + 1) * S:(t + 2) * S,
                src * S + offs[i]:src * S + offs[i] + k]
        Out[offs[i]:offs[i + 1], :] = CM[
            outt * S + offs[i]:outt * S + offs[i] + k, S:(n + 1) * S]
    return Out, K


def banded_solve_blocks(CMfull: np.ndarray, n: int, S: int,
                        tol: float = 1e-9, max_band: int = 16):
    """Block-banded form of the combined solve matrix, or None.

    Tile-to-tile carry influence decays like |pole|^T per tile, so for
    stable (non-integrator) filters the (n·S)² chain matrix is effectively
    block-banded with a handful of non-negligible diagonals — and the dense
    solve matmul grows as O(n²·lines) = O(W³) on images (0.26 ms of the 8K
    gaussian's 3.0 ms). Returns [(offset d, blocks (n, S, S))] where block
    t maps tile t-d's raw tails into tile t's carries; offsets whose
    largest block falls below ``tol``·max are dropped (≤ f32 noise).
    Integrators (poles on the unit circle: SAT, boxes) decay nowhere —
    their band exceeds ``max_band`` and the caller keeps the dense matmul.
    """
    import os as _os

    if _os.environ.get("RECFILTER_NO_BANDED"):
        return None  # A/B hatch: force the dense solve everywhere
    CM = np.asarray(CMfull).reshape(n, S, n, S)
    norms = np.abs(CM).max(axis=(1, 3))  # (n_to, n_from)
    scale = float(norms.max())
    if scale == 0.0:
        return [(0, np.zeros((n, S, S)))]
    offsets = []
    for d in range(-(n - 1), n):
        diag = [norms[t, t - d] for t in range(max(0, d), min(n, n + d))]
        if diag and max(diag) > tol * scale:
            offsets.append(d)
    # Banded wins only at large tile counts: measured on chip (clamped
    # gaussian3 px6) 4K/n=32: 0.616 ms banded vs 0.591 dense (the shift
    # ops cost more than the small dense matmul); 8K/n=64: 2.95 vs 3.01.
    # Integrators' band is as wide as n — always dense.
    if n < 64 or len(offsets) > min(max_band, n // 4):
        return None
    out = []
    for d in offsets:
        blocks = np.zeros((n, S, S))
        for t in range(n):
            i = t - d
            if 0 <= i < n:
                blocks[t] = CM[t, :, i, :]
        out.append((d, blocks))
    return out


def _banded_solve_apply(bands, braw_t, S: int):
    """Apply a banded solve to slot-padded transposed tails (n, 8, q):
    N_t = Σ_d B_d[t] · b_{t−d} — one tiny (n,S,S)×(n,S,q) einsum per
    offset instead of the dense (n·8)² matmul.

    The shifted operands come from ONE padded copy of b sliced per offset
    (XLA fuses a leading-dim slice into the consumer einsum) instead of a
    per-offset zero-concat: each concat materialized a full carry-array
    stream — ~16 MB per offset at 8K, the bulk of the "large-grid glue"
    residual (round-5 xplane)."""
    n, slots, q = braw_t.shape
    b = braw_t[:, :S, :]
    dmax = max(max(d for d, _ in bands), 0)
    dmin = min(min(d for d, _ in bands), 0)
    bpad = (jnp.pad(b, ((dmax, -dmin), (0, 0), (0, 0)))
            if dmax or dmin else b)
    N = None
    for d, blocks in bands:
        shifted = (bpad if (dmax - d == 0 and bpad.shape[0] == n)
                   else jax.lax.slice_in_dim(bpad, dmax - d, dmax - d + n,
                                             axis=0))
        t = jnp.einsum("nab,nbq->naq", jnp.asarray(blocks, jnp.float32),
                       shifted, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        N = t if N is None else N + t
    if S < slots:
        N = jnp.pad(N, ((0, 0), (0, slots - S), (0, 0)))
    return N


def _banded_solve_apply_nat(bands, braw, prec):
    """Banded combined solve on NATURAL-layout tails (..., n, S):
    N_t = Σ_d B_d[t] · b_{t−d} — the einsum-path twin of
    :func:`_banded_solve_apply` (which takes the kernels' slot-padded
    transposed layout). Keeps high-order einsum passes (carry slots past
    the kernels' ΣK ≤ 8 gate, e.g. the audio order-29 sweep) off the dense
    (n·S)² solve matrix, which would be 220 MB at n=256/S=29."""
    n = braw.shape[-2]
    dmax = max(max(d for d, _ in bands), 0)
    dmin = min(min(d for d, _ in bands), 0)
    pads = [(0, 0)] * braw.ndim
    pads[-2] = (dmax, -dmin)
    bpad = jnp.pad(braw, pads) if dmax or dmin else braw
    N = None
    for d, blocks in bands:
        shifted = (bpad if (dmax - d == 0 and bpad.shape[-2] == n)
                   else jax.lax.slice_in_dim(bpad, dmax - d, dmax - d + n,
                                             axis=-2))
        t = jnp.einsum("nab,...nb->...na", jnp.asarray(blocks, jnp.float32),
                       shifted, preferred_element_type=jnp.float32,
                       precision=prec)
        N = t if N is None else N + t
    return N


@dataclasses.dataclass
class DimPassMats:
    """Per-dimension fused-pass matrices (numpy, trace-time constants).

    ``G[i]`` is (n, k_i, T); ``H[i][j]`` is (n, k_i, k_j); ``CM[i]`` is
    (n·k_i, n·k_i); ``Btot`` is (n, T, T); ``Rhat[j]`` is (n, T, k_j).
    The ``n`` axis carries the edge-tile variants (clamp); for zero borders
    every tile is identical and the n axis is collapsed to 1.
    """

    orders: List[int]
    G: List[np.ndarray]
    H: List[List[np.ndarray]]
    CM: List[np.ndarray]
    Btot: np.ndarray
    Rhat: List[np.ndarray]
    uniform: bool  # True → n axis collapsed (no per-tile variants)


def prepare_dim_pass(
    scans: Sequence[Scan], T: int, n: int, clamp: bool, pad_slots: int = 0,
    build_cm: bool = True,
) -> DimPassMats:
    m = len(scans)
    base = [_scan_base_mats(s, T, clamp) for s in scans]

    # Pad projector for the last tile: ``pad_slots`` trailing positions are
    # zero padding, and a causal scan propagates real values into them — a
    # later scan must see zeros there (the zero-border contract). Replacing
    # B with B·Z for the last tile zeroes those slots algebraically between
    # scans; on the raw input x the pad is genuinely zero, so the extra Z
    # before B_1 is harmless.
    Z = np.eye(T)
    if pad_slots:
        Z[np.arange(T - pad_slots, T), np.arange(T - pad_slots, T)] = 0.0

    # Distinct tile variants: interior, first, last (first==last when n==1).
    def mats_for_tile(t: int):
        out = []
        for s, (B, Bf, RN, Sel) in zip(scans, base):
            edge = (t == 0) if s.causal else (t == n - 1)
            Bt = Bf if (clamp and edge) else B
            if pad_slots and t == n - 1:
                Bt = Bt @ Z
            out.append((Bt, RN, Sel))
        return out

    # Representative tile indices to build: interior (a middle tile when one
    # exists) plus the tiles whose matrices differ — globally-first/last for
    # clamp (lib/split.cpp:625-654), last for padding.
    if not clamp and not pad_slots:
        tiles = [0]
    else:
        special = set()
        if clamp:
            special |= {0, n - 1}
        if pad_slots:
            special.add(n - 1)
        interior = {t for t in range(n) if t not in special}
        tiles = sorted(special | ({min(interior)} if interior else set()))

    per_tile = {t: mats_for_tile(t) for t in tiles}

    def build(tile_mats):
        Btot_i = [None] * m
        Rhat_i = [[None] * m for _ in range(m)]
        G = [None] * m
        H = [[None] * m for _ in range(m)]
        acc = np.eye(T)
        for i, (B, RN, Sel) in enumerate(tile_mats):
            for j in range(i):
                Rhat_i[i][j] = B @ Rhat_i[i - 1][j]
            Rhat_i[i][i] = RN
            acc = B @ acc
            Btot_i[i] = acc
            G[i] = Sel.T @ acc
            for j in range(i):
                H[i][j] = Sel.T @ (B @ Rhat_i[i - 1][j])
        return G, H, Btot_i[m - 1], Rhat_i[m - 1]

    built = {t: build(mats) for t, mats in per_tile.items()}

    uniform = not clamp and not pad_slots
    if uniform:
        G1, H1, Btot1, Rhat1 = built[0]
        return DimPassMats(
            orders=[s.order for s in scans],
            G=[g[None] for g in G1],
            H=[[h[None] if h is not None else None for h in row] for row in H1],
            CM=[_chain_matrix(s, T, n) if build_cm else None for s in scans],
            Btot=Btot1[None],
            Rhat=[r[None] for r in Rhat1],
            uniform=True,
        )

    interior_reps = [t for t in tiles if t not in (0, n - 1)] or [tiles[0]]
    interior_t = interior_reps[0]

    def stack(select):
        rows = []
        for t in range(n):
            key = t if t in built else interior_t
            rows.append(select(built[key]))
        return np.stack(rows)

    G = [stack(lambda b, i=i: b[0][i]) for i in range(m)]
    H = [
        [
            (stack(lambda b, i=i, j=j: b[1][i][j]) if j < i else None)
            for j in range(m)
        ]
        for i in range(m)
    ]
    Btot = stack(lambda b: b[2])
    Rhat = [stack(lambda b, j=j: b[3][j]) for j in range(m)]
    return DimPassMats(
        orders=[s.order for s in scans],
        G=G,
        H=H,
        CM=[_chain_matrix(s, T, n) if build_cm else None for s in scans],
        Btot=Btot,
        Rhat=Rhat,
        uniform=False,
    )


# ---------------------------------------------------------------------------
# Device-side passes
# ---------------------------------------------------------------------------

def _matmul_precision(cdt, mmd, choice: str = "highest"):
    """True-f32 matmuls when storage/compute is f32: XLA's default lowers
    f32 dots to single-pass bf16 (~1e-2 relative error measured on chip —
    far off the float32 SNR bound the oracle suite guarantees). HIGHEST
    restores f32-equivalent accuracy (2e-7 measured) at ~2.7x matmul cost;
    HIGH (3-pass) lands at ~3e-5 for nearly the same cost as HIGHEST here.
    bf16 modes always use the fast path."""
    if mmd is not None or cdt in (jnp.bfloat16, jnp.float16):
        return None
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        # Compensated split-bf16 modes: the image-sized matmuls run as
        # explicit hi/lo bf16 products (_split_einsum); everything ELSE
        # (carry solves, injections — tiny FLOPs, error-dominant) stays
        # at true-f32 HIGHEST.
        "f32x6": jax.lax.Precision.HIGHEST,
        "f32x4": jax.lax.Precision.HIGHEST,
        "f32x3": jax.lax.Precision.HIGHEST,
        # Drop-free 3x3 mode (integer-exact limb passes): ALL nine chunk
        # products — no term of any magnitude is dropped, so integer
        # operands < 2^23 flow through in exact f32 arithmetic end to end.
        "f32x9": jax.lax.Precision.HIGHEST,
        # Pallas completion-kernel modes (kernels/completion.py): the
        # split-bf16 products happen in VMEM (no HBM chunk materialization,
        # no HIGHEST operand copies); every non-kernel matmul stays HIGHEST.
        "px3": jax.lax.Precision.HIGHEST,
        "px4": jax.lax.Precision.HIGHEST,
        "px6": jax.lax.Precision.HIGHEST,
        "default": None,
    }[choice]


def _split_passes(cdt, mmd, choice: str) -> int:
    """Number of single-pass bf16 products for the compensated modes.

    0 disables the split path (bf16 storage/matmul modes, or the plain
    precision choices). The split applies only to f32 compute with no
    bf16 matmul_dtype override. The px kernel modes map to the SAME
    product counts here: wherever the Pallas kernels' static gates fail
    (audio-scale tile counts, non-128 tiles, rotated P>1), the einsum
    fallback runs the equivalent compensated split — same accuracy grade,
    without HIGHEST's operand-conversion copies.
    """
    if mmd is not None or cdt != jnp.float32:
        return 0
    return {"f32x3": 3, "f32x4": 4, "f32x6": 6, "f32x9": 9,
            "px3": 3, "px4": 4, "px6": 6}.get(choice, 0)


def _split_chunks(npasses: int) -> int:
    """Chunks per operand for a pass budget: 2 for f32x3/f32x4, 3 for f32x6."""
    return 3 if npasses >= 6 else 2


def _kernel_nprod(cdt, mmd, matmul_precision: str,
                  structural: bool = False) -> int:
    """Completion-kernel product count for this configuration, or 0 when
    the kernel path does not apply. f32 storage: the px modes' compensated
    product counts. bf16 storage (bf16 matmuls): one plain product — the
    kernel is then strictly a bandwidth win over the einsum path (2 bf16
    image touches per pass, chained tails) at identical rounding.

    Throughput mode ("default", f32 storage): ONE plain product, but only
    where the kernel brings a STRUCTURAL win the einsum form cannot
    (``structural=True``): the 3-touch 2-D overlapped executor (4K
    gaussian3 0.389 → 0.277 ms), an in-kernel stencil consumer (dog_sat
    2.2 vs 4.3 ms at default), or cross-pass tails chaining (8K einsum
    chain measured 4.40 ms at default). On plain single passes the
    kernels LOSE at default — XLA fuses the einsum's dot with the stages
    around it, which a pallas_call cannot (staged cascade 0.35 → 0.61 ms
    regression caught by the round-3 app sweep)."""
    if cdt == jnp.float32 and mmd is None:
        n = {"px3": 3, "px4": 4, "px6": 6}.get(matmul_precision, 0)
        if not n and structural and matmul_precision == "default":
            n = 1
        return n
    if cdt == jnp.bfloat16 and mmd is not None and jnp.dtype(mmd) == jnp.bfloat16:
        return 1
    return 0


def _split_input(X, nchunks: int = 2):
    """Exact bf16 chunk decomposition of f32 data: X = Σ chunks, chunk i
    carrying mantissa bits [8i, 8i+8). Two chunks represent X to ~2^-17
    relative; three chunks are EXACT (bf16 keeps 8 of f32's 24 mantissa
    bits, and each residual subtraction is exact in f32). Reading (hi, lo)
    costs the same HBM traffic as reading X in f32."""
    chunks = []
    rem = X
    for _ in range(nchunks - 1):
        c = rem.astype(jnp.bfloat16)
        chunks.append(c)
        rem = rem - c.astype(jnp.float32)
    chunks.append(rem.astype(jnp.bfloat16))
    return tuple(chunks)


def _split_const(M, nchunks: int = 2):
    """Trace-time bf16 chunk split of a matrix constant (free at runtime);
    computed from float64 so three chunks carry the full f32 mantissa."""
    import ml_dtypes

    M64 = np.asarray(M, np.float64)
    chunks = []
    rem = M64
    for _ in range(nchunks):
        c = rem.astype(np.float32).astype(ml_dtypes.bfloat16)
        chunks.append(c)
        rem = rem - c.astype(np.float64)
    return tuple(chunks)


def _split_einsum(eq, M, X, npasses, acc):
    """Compensated f32 matmul from single-pass bf16 MXU products.

    With M = Σ Mi and X = Σ Xj (each chunk bf16-exact, so XLA's default
    single-pass bf16 lowering rounds nothing), the product sums the
    largest ``npasses`` cross terms Mi·Xj in f32 (term magnitude level is
    i+j, each level down ~2^-8):

      3 passes: levels 0,1          (drops ~2^-16 — max rel err ~2e-5)
      4 passes: + M1·X1             (representation-limited, ~2^-17)
      6 passes: 3-chunk operands, levels 0,1,2   (drops ~2^-24 — true f32)

    This is XLA's own HIGH/HIGHEST decomposition done by hand — but applied
    ONLY to the image-sized completion matmuls, with the operand splits
    shared across all of a pass's einsums instead of re-split per dot, and
    with the carry solves kept at true-f32 HIGHEST. f32x6 matches the
    float32 SNR bar of the reference's CheckResult
    (``lib/recfilter.h:793-855``); f32x3/f32x4 trade ~2e-5 worst-case
    relative error for 3-4 MXU passes instead of 6.

    Terms are summed smallest level first to minimise accumulation rounding.

    Takes the RAW f32 operand ``X`` and splits it internally (XLA CSE
    merges the identical split chains of a pass's G/B einsums under jit).
    Differentiation does NOT flow through the bf16 chunk casts — that loses
    ~2^-8 on the cotangent (measured 3.8e-3 grad error) — a custom VJP
    transposes the mathematically-equivalent HIGHEST einsum instead, so
    gradients are f32-grade regardless of the forward product count.
    """
    nc = _split_chunks(npasses)
    Ms = _split_const(M, nc)
    if npasses >= 9:
        # Drop-free: all nine products (exact integer arithmetic for
        # operands < 2^23 — see apply_filter_int_exact).
        idx = [(2, 2), (1, 2), (2, 1), (0, 2), (1, 1), (2, 0),
               (0, 1), (1, 0), (0, 0)]
    elif npasses >= 6:
        idx = [(0, 2), (1, 1), (2, 0), (0, 1), (1, 0), (0, 0)]
    elif npasses >= 4:
        idx = [(1, 1), (0, 1), (1, 0), (0, 0)]
    else:
        idx = [(0, 1), (1, 0), (0, 0)]

    def _run(X):
        Xs = _split_input(X, nc)
        out = None
        for i, j in idx:
            t = jnp.einsum(eq, jnp.asarray(Ms[i]), Xs[j],
                           preferred_element_type=acc)
            out = t if out is None else out + t
        return out

    # NUMPY on purpose: a jnp constant materialized here (inside whatever
    # trace is active — e.g. a shard_map body) leaks into the bwd jaxpr as
    # a tracer-lifted constant and breaks the outer jit's transpose
    # ("No constant handler for DynamicJaxprTracer"); a numpy closure is
    # lifted fresh when the bwd itself is traced.
    Mf = np.asarray(M, np.dtype(acc))

    # The op is linear in X, so its VJP is the explicitly transposed
    # HIGHEST einsum (the M,out->X contraction) and needs NO residuals.
    # (A nested jax.vjp of the reference einsum here fails the same way
    # under shard_map+jit, and the explicit form is what it computes.)
    lhs, osub = eq.split("->")
    msub, xsub = lhs.split(",")
    teq = f"{msub},{osub}->{xsub}"

    f = jax.custom_vjp(_run)
    f.defvjp(
        lambda X: (_run(X), None),
        lambda _, ct: (jnp.einsum(teq, Mf, ct, preferred_element_type=acc,
                                  precision=jax.lax.Precision.HIGHEST),),
    )
    return f(X)


def _retile_aux(a, Ydtype, nat_axis, pad, tile_shape):
    """Reshape an epilogue aux array from the pass's natural output layout
    into the completion matmul's tile layout: pad the scanned axis like the
    pass input, then reshape to ``tile_shape`` (which splits that axis into
    (n, T) at the right spot).

    Applying an ELEMENTWISE epilogue in the tile layout lets XLA fuse it
    into the dot's output instead of spending a separate full-size HBM
    stream on it — the TPU analog of the reference's ``compute_at`` fusion
    of a pointwise consumer into the filter's last kernel
    (``apps/usm/unsharp_mask_optimized.cpp:61-71``). The epilogue must be
    position-independent (pure elementwise over same-shape arrays)."""
    a = jnp.asarray(a).astype(Ydtype)
    if pad:
        cfg = [(0, 0)] * a.ndim
        cfg[nat_axis] = (0, pad)
        a = jnp.pad(a, cfg)
    return a.reshape(tile_shape)


def _plan_tiles(w: int, tile_width: int, kmax: int, clamp: bool):
    """Resolve (T, n, pad) for one dimension, or None when the blocked
    algebra cannot apply (order exceeds any legal tile; clamp with no exact
    divisor — see fused_dim_pass)."""
    T = int(min(max(tile_width, kmax), w))
    n = -(-w // T)
    pad = n * T - w
    # Zero padding at the end is exact for ZERO borders in both directions.
    # For CLAMP the globally-last tile's matrices assume the edge sits at
    # the tile's end, so clamp requires T | w; fall back to a divisor.
    if clamp and pad:
        for cand in range(T, kmax - 1, -1):
            if w % cand == 0:
                T, n, pad = cand, w // cand, 0
                break
    if T < kmax or (clamp and pad):
        return None
    return T, n, pad


# Above this tile count the block-Toeplitz chain matmul (quadratic in n) is
# replaced by a log-depth associative scan over (W, b) affine pairs — the
# ``jax.lax.associative_scan`` form of the carry recurrence (SURVEY §5.7).
_CHAIN_MATMUL_MAX_TILES = 256

# 2-D moments-first tails chain (_moments_tails_2d): MEASURED OFF on chip
# (bench 4K px6: 0.626 ms vs 0.526 with in-kernel extraction —
# final2d.moments2d's HIGHEST f32 dots cost more than the extraction
# saves). Re-enable if/when a split-bf16 moments kernel lands.
_MOMENTS_CHAIN = False

# 2-D split-bf16 overlapped path (overlap2d.fused_2d_px): the 3-touch
# structure (moments kernel → carry solves → VMEM-fused dual completion)
# with the px compensated products — replaces the 5-touch rotation-chained
# pipeline for trailing-2-D px filters where its static gates hold.
_OVERLAP_PX_2D = True


def _chain_solve_assoc(b, scan: Scan, T: int, em, last: bool):
    """Solve one scan's cross-tile recurrence with an associative scan.

    ``b`` is (a, n, k[, t]) natural local tails; returns N of the same shape
    (the natural incoming vector consumed by RN). Equivalent to
    ``b_stacked @ CM.T`` (see ``_chain_matrix``) for any n.
    """
    k = scan.order
    W = em(coeffs.tail_weight_matrix(scan.feedback, T))
    Jk = em(coeffs.antidiagonal(k))
    n = b.shape[1]
    jk_eq = "ij,anj->ani" if last else "ij,anjb->anib"
    mv_eq = "nij,naj->nai" if last else "nij,najb->naib"

    if scan.causal:
        # s_t = W s_{t-1} + Jk b_t ;  N_t = Jk s_{t-1}
        bt = jnp.einsum(jk_eq, Jk, b)
    else:
        # reversed order: run the same recurrence over reversed tiles with
        # identity converters (see _chain_matrix's anticausal branch)
        bt = jnp.flip(b, axis=1)

    A = jnp.broadcast_to(W, (n,) + W.shape)

    # associative_scan carries the tile axis at position 0 of each leaf
    bt_n_first = jnp.moveaxis(bt, 1, 0)  # (n, a, k[, t])
    _, s = jax.lax.associative_scan(
        lambda c1, c2: (
            jnp.einsum("nij,njk->nik", c2[0], c1[0]),
            jnp.einsum(mv_eq, c2[0], c1[1]) + c2[1],
        ),
        (A, bt_n_first),
        axis=0,
    )
    s = jnp.moveaxis(s, 0, 1)  # (a, n, k[, t])
    s_prev = jnp.concatenate([jnp.zeros_like(s[:, :1]), s[:, :-1]], axis=1)

    if scan.causal:
        return jnp.einsum(jk_eq, Jk, s_prev)
    return jnp.flip(s_prev, axis=1)


def fused_dim_pass(
    x,
    axis: int,
    scans: Sequence[Scan],
    tile_width: int,
    border: str = BorderMode.ZERO,
    compute_dtype=jnp.float32,
    matmul_dtype=None,
    matmul_precision: str = "highest",
    epilogue=None,
    eaux=(),
):
    """Apply all ``scans`` (same dimension) to ``x`` along ``axis``.

    ``matmul_dtype=jnp.bfloat16`` casts the LARGE matmuls' inputs (X, B, G)
    to bf16 with f32 accumulation — the carry solves and injections stay in
    ``compute_dtype``. ~1e-3 relative input rounding for several-fold MXU
    throughput.

    ``epilogue(out, *eaux)`` — optional elementwise combine applied in the
    completion matmul's tile layout (see _retile_aux); eaux arrays share
    the pass's natural output shape."""
    clamp = border == BorderMode.CLAMP
    w = x.shape[axis]
    kmax = max(s.order for s in scans)
    plan = _plan_tiles(w, tile_width, kmax, clamp)

    # The blocked algebra needs the order-k carry to fit inside one tile,
    # and clamp needs exact tiling (no divisor ≥ kmax exists for prime-ish
    # widths) — route such cases to the lax.scan core. Carries always run
    # in f32 (never the bf16 storage dtype) — same contract as
    # scan_core.apply_filter.
    if plan is None:
        from . import scan_core

        xs = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
        for s in scans:
            xs = scan_core.apply_scan(
                xs, axis, s.causal, s.feedfwd, s.feedback, border
            )
        if epilogue is not None:
            xs = epilogue(xs, *(jnp.asarray(a).astype(xs.dtype) for a in eaux))
        return xs.astype(x.dtype)

    T, n, pad = plan
    # Audio-scale tile counts: the two-level supertile chain rides the px
    # completion kernels instead of the associative einsum path (gates
    # inside; falls through when not applicable). RECFILTER_NO_HIER=1 is
    # the A/B escape hatch (scripts/audio_sweep.py comparisons).
    import os as _os

    if (n > _CHAIN_MATMUL_MAX_TILES and epilogue is None
            and compute_dtype == jnp.float32 and matmul_dtype is None
            and not _os.environ.get("RECFILTER_NO_HIER")):
        yh = hierarchical_dim_pass(x, axis, list(scans), border,
                                   matmul_precision)
        if yh is not None:
            return yh
    # Scan axes within reach of the trailing group route through the
    # lanes-contraction form: move the scan axis last (one relayout for
    # non-last axes; free for the last) and emit rotated back into place —
    # free in the completion matmuls' output ordering. The direct "ansb"
    # einsums below contract over a non-lane axis and XLA lowers them to
    # convolutions at ~4x off bandwidth on TPU (xplane-measured in the DoG
    # pipeline); the last-axis case (rot_axes=1, in-place emit) shares the
    # same code so the px completion-kernel modes apply everywhere hot.
    if x.ndim >= 2 and x.ndim - axis <= 6:
        xm = jnp.moveaxis(x, axis, -1) if axis != x.ndim - 1 else x
        # the rotated emit puts the scan axis straight back at ``axis``
        # (so the FINAL natural layout equals x's — eaux pass through)
        return _last_axis_pass_t(
            xm, scans, plan, clamp, compute_dtype, matmul_dtype,
            rot_axes=x.ndim - axis, matmul_precision=matmul_precision,
            epilogue=epilogue, eaux=eaux,
        )
    mats = prepare_dim_pass(
        scans, T, n, clamp, pad_slots=pad,
        build_cm=n <= _CHAIN_MATMUL_MAX_TILES,
    )
    m = len(scans)
    cdt = compute_dtype

    if pad:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, pad)
        x = jnp.pad(x, pads)

    shape = x.shape
    lead = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    trail = (
        int(np.prod(shape[axis + 1 :], dtype=np.int64))
        if axis + 1 < len(shape)
        else 1
    )
    # When the scan axis is the last array axis, keep the contracted axis in
    # the lane dimension and emit (a, n, out) — a trailing axis of size 1
    # would put every array on a single vector lane.
    last = trail == 1
    if last:
        X = x.reshape(lead, n, T).astype(cdt)
    else:
        X = x.reshape(lead, n, T, trail).astype(cdt)

    def em(M):  # matrix constant in compute dtype
        return jnp.asarray(M, dtype=cdt)

    mmd = matmul_dtype
    # Accumulate matmuls in f32 even when storage/compute is bf16.
    acc = jnp.float32 if cdt in (jnp.bfloat16, jnp.float16) else cdt
    prec = _matmul_precision(cdt, mmd, matmul_precision)
    nsp = _split_passes(cdt, mmd, matmul_precision)

    def tile_mat_apply(Mstack, V, vdim_in, fast=False):
        """einsum over the tile axis: Mstack (n|1, out, in) × V.

        ``fast`` ops (the T-wide B/G matmuls on image-sized data) may run
        with bf16 inputs when matmul_dtype requests it, or as compensated
        hi/lo bf16 splits in the f32x3/f32x4 modes; carry-sized ops always
        stay in the compute dtype. Accumulation is always f32."""
        M0 = np.asarray(Mstack)
        if nsp and (fast and V is X or nsp >= 9):
            if M0.shape[0] == 1:
                eq = "os,ans->ano" if last else "os,ansb->anob"
                return _split_einsum(eq, M0[0], V, nsp, acc)
            eq = "nos,ans->ano" if last else "nos,ansb->anob"
            return _split_einsum(eq, M0, V, nsp, acc)
        dt = mmd if (fast and mmd is not None) else cdt
        M = jnp.asarray(M0, dtype=dt)
        Vc = V.astype(dt)
        if M.shape[0] == 1:
            eq = "os,ans->ano" if last else "os,ansb->anob"
            return jnp.einsum(eq, M[0], Vc, preferred_element_type=acc,
                              precision=prec)
        eq = "nos,ans->ano" if last else "nos,ansb->anob"
        return jnp.einsum(eq, M, Vc, preferred_element_type=acc,
                          precision=prec)

    # --- pass A: all local tails in ONE read of X -------------------------
    # (the raw G_i·x terms are independent of the solves; stacking the G
    # rows turns m reads of X into one; rows are zero-padded to >= 8 so XLA
    # lowers the contraction as a dot — below 8 output rows it emits a
    # broadcast+reduce chain costing one full-size stream per row)
    Gcat = pad_rows8(
        np.concatenate([np.asarray(g) for g in mats.G], axis=1))
    braw = tile_mat_apply(Gcat, X, T, fast=True)  # (a, n, >=ΣK, b)
    offs = np.cumsum([0] + mats.orders)

    S = int(sum(mats.orders))
    if braw.shape[2] != S:
        braw = (
            braw[:, :, :S] if last else braw[:, :, :S, :]
        )
    if n <= _CHAIN_MATMUL_MAX_TILES:
        # --- every scan's solve + H-couplings as ONE matmul ---------------
        # (per-op dispatch overhead dominates carry-sized work on this
        # stack; see combined_solve_matrix)
        CM_np = combined_solve_matrix(mats, n)
        if nsp >= 9:
            # integer-exact mode: drop-free solve
            if last:
                Ncat = _split_einsum(
                    "ts,ls->lt", CM_np, braw.astype(acc).reshape(lead, n * S),
                    nsp, acc,
                ).reshape(lead, n, S)
            else:
                bl = braw.astype(acc).reshape(lead, n * S, trail)
                Ncat = _split_einsum(
                    "ts,asb->atb", CM_np, bl, nsp, acc,
                ).reshape(lead, n, S, trail)
        elif last:
            bands = banded_solve_blocks(CM_np, n, S)
            if bands is not None:
                Ncat = _banded_solve_apply_nat(
                    bands, braw.astype(acc), jax.lax.Precision.HIGHEST)
            else:
                CMfull = jnp.asarray(CM_np, dtype=acc)
                Ncat = jnp.einsum(
                    "ls,ts->lt", braw.astype(acc).reshape(lead, n * S),
                    CMfull, preferred_element_type=acc, precision=prec,
                ).reshape(lead, n, S)
        else:
            CMfull = jnp.asarray(CM_np, dtype=acc)
            bl = braw.astype(acc).reshape(lead, n * S, trail)
            Ncat = jnp.einsum(
                "ts,asb->atb", CMfull, bl, preferred_element_type=acc,
                precision=prec,
            ).reshape(lead, n, S, trail)
        # --- pass B: one completion matmul + one carry injection ----------
        Rcat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)
        Y = tile_mat_apply(mats.Btot, X, T, fast=True)
        Y = Y + tile_mat_apply(Rcat, Ncat.astype(cdt), S)
    else:
        # --- large tile counts: log-depth associative scan per scan -------
        # (the (n·k)² chain matrix would be quadratic in n; audio-scale
        # 1-D filters have n ~ 10^4 tiles)
        N = [None] * m
        for i in range(m):
            if last:
                b = braw[:, :, offs[i] : offs[i + 1]]
            else:
                b = braw[:, :, offs[i] : offs[i + 1], :]
            for j in range(i):
                b = b + tile_mat_apply(mats.H[i][j], N[j], mats.orders[j])
            N[i] = _chain_solve_assoc(b, scans[i], T, em, last)
        Y = tile_mat_apply(mats.Btot, X, T, fast=True)
        for j in range(m):
            Y = Y + tile_mat_apply(mats.Rhat[j], N[j], mats.orders[j])

    if epilogue is not None:
        tshape = (lead, n, T) if last else (lead, n, T, trail)
        Y = epilogue(Y, *(_retile_aux(a, Y.dtype, axis, pad, tshape)
                          for a in eaux))
    y = Y.reshape(shape[:axis] + (n * T,) + shape[axis + 1 :])
    if pad:
        y = jax.lax.slice_in_dim(y, 0, w, axis=axis)
    return y





def _shift_mode(y, off: int, axis: int, mode: str):
    """y shifted by ``off`` along ``axis``: pad (edge for "clamp",
    zeros for "zero") + slice — the stencil fallback's building block."""
    n = y.shape[axis]
    lo, hi = max(off, 0), max(-off, 0)
    pads = [(0, 0)] * y.ndim
    pads[axis] = (hi, lo)
    g = jnp.pad(y, pads, mode="edge" if mode == "clamp" else "constant")
    return jax.lax.slice_in_dim(g, lo, lo + n, axis=axis)


def apply_stencil(y, axis: int, taps, start: str = "zero",
                  end: str = "clamp"):
    """Shifted-tap consumer y[i] = Σ c_k·y[i+d_k] along ``axis`` with
    border modes per direction — the XLA fallback twin of the in-kernel
    stencil epilogue (kernels/completion._stencil_rows)."""
    out = None
    for d, c in taps:
        t = y if d == 0 else _shift_mode(y, d, axis, end if d > 0 else start)
        t = float(c) * t
        out = t if out is None else out + t
    return out


def _stencil_taps_for(stencil, slice_idx=None):
    """Resolve the taps list: shared ``[(off, coeff), ...]`` or per-slice
    ``[[(off, coeff), ...], ...]`` (leading channel groups — DoG's dual
    radius)."""
    taps = stencil["taps"]
    per_slice = (bool(taps) and isinstance(taps[0], (list, tuple))
                 and bool(taps[0])
                 and isinstance(taps[0][0], (list, tuple)))
    if per_slice:
        return taps[0 if slice_idx is None else slice_idx]
    return taps


def _stencil_halo(mats, braw_t, Nt8, taps, n, T, pad):
    """Neighbor halo strips for the in-kernel stencil, from the extended
    tails extraction: halo rows of z_t = (Btot rows)·x_t + (Rcat rows)·N_t;
    the first term came out of tails_pass (extra_rows), the second is a
    carry-sized einsum here. Returns (prev, nxt) in the kernel's shifted,
    8-row-quantized layouts."""
    hlo, hhi = _stencil_reach(taps)
    He = hlo + hhi
    halo_base = braw_t[:, 8:8 + He]                  # (n, He, q)
    Rcat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)
    S = Rcat.shape[-1]
    Rrows = np.concatenate([Rcat[:, :hlo, :], Rcat[:, T - hhi:, :]], axis=1)
    Rp = np.zeros((n, He, 8))
    Rp[:, :, :S] = Rrows[np.minimum(np.arange(n), Rrows.shape[0] - 1)]
    halo = halo_base + jnp.einsum(
        "nhs,nsq->nhq", jnp.asarray(Rp, jnp.float32), Nt8,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    head, tail = halo[:, :hlo], halo[:, hlo:]
    prev = nxt = None
    if hhi:
        H8hi = -(-hhi // 8) * 8
        tail_p = jnp.pad(tail, ((0, 0), (H8hi - hhi, 0), (0, 0)))
        prev = jnp.concatenate(
            [jnp.zeros_like(tail_p[:1]), tail_p[:-1]], axis=0)
    if hlo:
        H8lo = -(-hlo // 8) * 8
        head_p = jnp.pad(head, ((0, 0), (0, H8lo - hlo), (0, 0)))
        nxt = jnp.concatenate(
            [head_p[1:], jnp.zeros_like(head_p[:1])], axis=0)
    return prev, nxt


def _stencil_fallback(y, stencil, axis: int):
    """Apply a (possibly per-slice) stencil with plain XLA shifts — the
    correctness path wherever the in-kernel fusion's static gates fail.
    Per-slice taps index the FIRST array axis (negative ``axis`` stays
    valid under that slicing)."""
    taps = stencil["taps"]
    start = stencil.get("start", "zero")
    end = stencil.get("end", "clamp")
    per_slice = (bool(taps) and isinstance(taps[0], (list, tuple))
                 and bool(taps[0])
                 and isinstance(taps[0][0], (list, tuple)))
    if not per_slice:
        return apply_stencil(y, axis, taps, start, end)
    return jnp.stack([
        apply_stencil(y[p], axis, _stencil_taps_for(stencil, p), start, end)
        for p in range(y.shape[0])
    ])


def _stencil_reach(taps):
    """(hlo, hhi): forward reach (rows needed from the NEXT tile's head)
    and backward reach (rows from the PREVIOUS tile's tail)."""
    hlo = max(max((int(d) for d, _ in taps), default=0), 0)
    hhi = max(max((-int(d) for d, _ in taps), default=0), 0)
    return hlo, hhi


def _stencil_extra_rows(mats, taps, T: int):
    """Per-tile (nv, hlo+hhi, T) Btot row stack for tails_pass's
    extra_rows — the x-dependent part of the halo strips."""
    hlo, hhi = _stencil_reach(taps)
    B = np.asarray(mats.Btot)
    return np.concatenate([B[:, :hlo, :], B[:, T - hhi:, :]], axis=1)


def _kernel_epilogue_aux(epilogue, next_tails, rot, lead, P, n, T, rows,
                         PR, pad, eaux):
    """(epilogue-or-None, flat aux arrays) for the px completion kernel:
    eaux re-laid to the kernel's flat output layout. next_tails and
    epilogue never coexist (the epilogue applies only to a filter's final
    pass), so chaining keeps the epilogue outside the kernel."""
    if epilogue is None or next_tails is not None:
        return None, ()
    if rot:
        tshape = (P, n, T) + tuple(rows)
        ke_aux = tuple(
            _retile_aux(a, jnp.float32, len(lead), pad, tshape)
            .reshape(n * T, PR)
            for a in eaux)
    else:
        tshape = (P,) + tuple(rows) + (n, T)
        ke_aux = tuple(
            _retile_aux(a, jnp.float32, -1, pad, tshape)
            .reshape(PR, n * T)
            for a in eaux)
    return epilogue, ke_aux


def _last_axis_pass_t(x, scans, plan, clamp, cdt, mmd, rot_axes,
                      matmul_precision: str = "highest",
                      epilogue=None, eaux=(),
                      tails_in=None, next_tails=None, stencil=None):
    """One dimension pass along the LAST axis, optionally emitting the result
    with the trailing ``rot_axes`` axes rotated one step: the scanned axis
    moves to position ``-rot_axes`` and the other trailing axes shift right.

    The rotated emission rides the completion matmuls' output ordering (free
    in the dot epilogue), so chaining ``D`` of these processes all ``D``
    trailing dimensions entirely in fast lanes-contraction form with no
    standalone relayout copy between passes, and after ``D`` passes the axis
    order is restored exactly — the transpose-chaining executor used by
    :func:`apply_filter_fused` for images (D=2) and volumes (D=3).

    ``rot_axes=1`` emits in place (no rotation).

    Cross-pass tails chaining (px kernel path only): ``tails_in`` is this
    pass's slot-padded transposed tails (n, 8, PR) as produced by the
    PREVIOUS pass's fused completion kernel — when given, the tails read
    of x is skipped entirely (2 HBM touches for this pass). ``next_tails``
    = (Gcat2, n2, T2) asks this pass's completion kernel to extract the
    NEXT pass's tails from the blocks it emits. When ``next_tails`` is not
    None the function returns ``(y, tails_out)`` with ``tails_out`` None
    whenever any static gate kept the fusion off.
    """
    T, n, pad = plan
    m = len(scans)
    mats = prepare_dim_pass(
        scans, T, n, clamp, pad_slots=pad,
        build_cm=n <= _CHAIN_MATMUL_MAX_TILES,
    )
    if pad:
        pads = [(0, 0)] * x.ndim
        pads[-1] = (0, pad)
        x = jnp.pad(x, pads)

    shape = x.shape
    nrow = max(rot_axes - 1, 1)          # distinct row axes kept in einsums
    rows = shape[-1 - nrow : -1]         # trailing row-axis sizes
    rl = "qruvw"[:nrow]                  # einsum letters for the row axes
    lead = shape[: -1 - nrow]
    P = int(np.prod(lead, dtype=np.int64)) if lead else 1
    PR = P * int(np.prod(rows, dtype=np.int64))
    X = x.reshape((P,) + tuple(rows) + (n, T)).astype(cdt)
    acc = jnp.float32 if cdt in (jnp.bfloat16, jnp.float16) else cdt
    prec = _matmul_precision(cdt, mmd, matmul_precision)
    nsp = _split_passes(cdt, mmd, matmul_precision)
    if rot_axes >= 2 and P > 1 and nsp < 9:
        # Measured (dog_sat 4K px6: 12.4 vs 6.3 ms): for rotated passes
        # with a leading channel/batch group, the chunked split einsums
        # lose 2x to plain HIGHEST dots — the transposed-output einsums
        # cannot fuse the 6 partial products, so every chunk round-trips
        # HBM. The per-slice kernel branch below covers the hot case; any
        # remaining fallback einsum runs HIGHEST instead of splitting.
        # (nsp=9 is the integer-exact mode: exactness overrides the perf
        # preference — drop-free splits must stay on.)
        nsp = 0

    def apply(Mstack, V, fast=False, out_t=False):
        out = f"pno{rl}" if out_t else f"p{rl}no"
        M0 = np.asarray(Mstack)
        if nsp and (fast and V is X or nsp >= 9):
            if M0.shape[0] == 1:
                return _split_einsum(f"os,p{rl}ns->{out}", M0[0], V, nsp, acc)
            return _split_einsum(f"nos,p{rl}ns->{out}", M0, V, nsp, acc)
        dt = mmd if (fast and mmd is not None) else cdt
        M = jnp.asarray(M0, dtype=dt)
        Vc = V.astype(dt)
        if M.shape[0] == 1:
            return jnp.einsum(
                f"os,p{rl}ns->{out}", M[0], Vc, preferred_element_type=acc,
                precision=prec,
            )
        return jnp.einsum(
            f"nos,p{rl}ns->{out}", M, Vc, preferred_element_type=acc,
            precision=prec,
        )

    Gcat = np.concatenate([np.asarray(g) for g in mats.G], axis=1)
    S = int(sum(mats.orders))

    # --- px kernel fast path: tails + solve + completion all via the
    # split-bf16 kernels (2 image touches + a read; no HIGHEST einsum
    # copies anywhere). Falls through to the einsum path when the static
    # gates don't hold. Throughput mode rides the kernels only when a
    # structural win exists here: an in-kernel stencil consumer or
    # cross-pass tails chaining (see _kernel_nprod).
    nprod_k = _kernel_nprod(
        cdt, mmd, matmul_precision,
        structural=(stencil is not None or tails_in is not None
                    or next_tails is not None))
    rot = rot_axes >= 2
    if (nprod_k and (P == 1 or not rot)
            and n <= _CHAIN_MATMUL_MAX_TILES):
        from .kernels import completion as _completion

        interp = _interp()
        if _completion.completion_ok(T, PR, n, S, interp):
            sl = _completion.slots_for(S)
            Rcat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)
            xq = X.reshape(PR, n, T)
            # In-kernel shifted-tap stencil consumer: the tails read also
            # extracts the halo base rows (extra_rows), the halo strips
            # complete at solve time, and the completion kernel fuses the
            # tap combine into its emit — the whole consumer costs zero
            # extra image streams.
            st_extra = None
            st_taps = None
            if (stencil is not None and rot and pad == 0
                    and tails_in is None and next_tails is None):
                st_taps = _stencil_taps_for(stencil)
                st_extra = _stencil_extra_rows(mats, st_taps, T)
            if tails_in is not None:
                braw_t = tails_in  # extracted by the previous pass's kernel
            else:
                braw_t = _completion.tails_pass(
                    xq, Gcat, nprod=nprod_k, interpret=interp,
                    extra_rows=st_extra,
                )  # (n, 8(+halo rows), PR) slot-padded transposed tails
            braw8 = braw_t[:, :sl] if st_extra is not None else braw_t
            CMfull = combined_solve_matrix(mats, n)
            bands = banded_solve_blocks(CMfull, n, S)
            if bands is not None:
                # Decaying filters: block-banded solve, O(band·n·S²·lines)
                # instead of the dense (n·S)²·lines matmul (which grows as
                # O(W³) over image sizes — 0.26 ms of the 8K gaussian).
                Nt8 = _banded_solve_apply(bands, braw8, S)
            else:
                CMp = jnp.asarray(
                    _completion.pad_solve_matrix(CMfull, n, S), dtype=acc,
                )
                Nt8 = jnp.einsum(
                    "ts,sl->tl", CMp, braw8.reshape(n * sl, PR),
                    preferred_element_type=acc,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(n, sl, PR)
            st_k = None
            if st_extra is not None:
                prev_h, nxt_h = _stencil_halo(mats, braw_t, Nt8, st_taps,
                                              n, T, pad)
                st_k = dict(taps=st_taps, prev=prev_h, nxt=nxt_h,
                            start=stencil.get("start", "zero"),
                            end=stencil.get("end", "clamp"))
                stencil = None  # consumed in-kernel
            # Elementwise epilogue fused INTO the kernel (applied to each
            # out-block in VMEM). Order contract: a stencil consumer reads
            # the FILTER output, the epilogue the consumer's — so when the
            # stencil could not fuse (pending fallback), the epilogue must
            # defer past it.
            deferred_epi = epilogue is not None and stencil is not None
            k_epi, ke_aux = _kernel_epilogue_aux(
                None if deferred_epi else epilogue, next_tails, rot, lead,
                P, n, T, rows, PR, pad, eaux)
            Yk = _completion.completion_pass(
                xq, np.asarray(mats.Btot), Rcat, Nt8, rot=rot,
                nprod=nprod_k, interpret=interp, carries_transposed=True,
                next_tails=next_tails, epilogue=k_epi, eaux=ke_aux,
                stencil=st_k,
            )
            tails_out = None
            if next_tails is not None:
                Yk, tails_out = Yk
                if tails_out is not None:
                    # (n2, 8, nT, r_a): drop the padded scan-axis columns
                    # (sliced off y below too), then flatten to the next
                    # pass's (n2, 8, PR') line order
                    if pad:
                        tails_out = tails_out[:, :, : n * T - pad]
                    tails_out = tails_out.reshape(
                        tails_out.shape[0], 8, -1
                    )
            if rot:
                Y = Yk.reshape((P, n, T) + tuple(rows))
            else:
                Y = Yk.reshape((P,) + tuple(rows) + (n, T))
            if epilogue is not None and k_epi is None and not deferred_epi:
                if rot:
                    nat_ax, tshape = len(lead), (P, n, T) + tuple(rows)
                else:
                    nat_ax, tshape = -1, (P,) + tuple(rows) + (n, T)
                Y = epilogue(Y, *(_retile_aux(a, Y.dtype, nat_ax, pad, tshape)
                                  for a in eaux))
            if rot:
                y = Y.reshape(lead + (n * T,) + tuple(rows))
                if pad:
                    y = jax.lax.slice_in_dim(
                        y, 0, n * T - pad, axis=-1 - nrow
                    )
            else:
                y = Y.reshape(lead + tuple(rows) + (n * T,))
                if pad:
                    y = jax.lax.slice_in_dim(y, 0, n * T - pad, axis=-1)
            if stencil is not None:
                y = _stencil_fallback(y, stencil, (-1 - nrow) if rot else -1)
                if deferred_epi:
                    y = epilogue(
                        y, *(jnp.asarray(a).astype(y.dtype) for a in eaux))
            return (y, tails_out) if next_tails is not None else y

    if (nprod_k and rot and P > 1 and n <= _CHAIN_MATMUL_MAX_TILES
            and epilogue is None):
        # Rotated emit with a leading channel/batch group (DoG's dual
        # radius, RGB planes): the kernel's transposed write would fold P
        # into the lane axis, so run the P==1 kernel pipeline once per
        # leading slice (P is static and small) and restack — each slice
        # stays 2 HBM touches + a tails read, vs the split-einsum
        # fallback's chunked HBM streams (measured 2x slower here).
        # Cross-pass tails chaining composes per slice: lines flatten
        # P-major, so slice p's incoming tails are tails_in[:, :, p*R:]
        # and the per-slice extracted next-pass tails concatenate along
        # the line axis into exactly the next pass's (n2, 8, PR') layout.
        from .kernels import completion as _completion

        interp = _interp()
        R = PR // P
        if _completion.completion_ok(T, R, n, S, interp):
            sl = _completion.slots_for(S)
            Rcat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)
            CMfull = combined_solve_matrix(mats, n)
            bands = banded_solve_blocks(CMfull, n, S)
            CMp = (None if bands is not None else jnp.asarray(
                _completion.pad_solve_matrix(CMfull, n, S), dtype=acc))
            Btot_np = np.asarray(mats.Btot)
            if tails_in is not None or next_tails is not None:
                # Chained multi-pass executors (RGB pipelines): vmap — the
                # pallas batching rule prepends a grid axis and writes
                # every slice into ONE output buffer, killing the
                # jnp.stack copy (~P·image·4B of HBM traffic per pass).
                # Measured 4K RGB px6: 1.93 vs 2.27 ms for the loop.
                Xs = X.reshape(P, R, n, T)
                if tails_in is not None:
                    braw_t = jnp.moveaxis(
                        tails_in.reshape(tails_in.shape[0], sl, P, R), 2, 0)
                else:
                    braw_t = jax.vmap(lambda xq: _completion.tails_pass(
                        xq, Gcat, nprod=nprod_k, interpret=interp))(Xs)
                if bands is not None:
                    Nt8 = jax.vmap(
                        lambda b: _banded_solve_apply(bands, b, S))(braw_t)
                else:
                    Nt8 = jnp.einsum(
                        "ts,psl->ptl", CMp, braw_t.reshape(P, n * sl, R),
                        preferred_element_type=acc,
                        precision=jax.lax.Precision.HIGHEST,
                    ).reshape(P, n, sl, R)
                Yk = jax.vmap(lambda xq, nt: _completion.completion_pass(
                    xq, Btot_np, Rcat, nt, rot=True, nprod=nprod_k,
                    interpret=interp, carries_transposed=True,
                    next_tails=next_tails))(Xs, Nt8)
                tails_out = None
                if next_tails is not None:
                    Yk, tb = Yk  # tb: (P, n2, 8, nT, r_a) or None
                    if tb is not None:
                        if pad:
                            tb = tb[:, :, :, : n * T - pad]
                        tb = tb.reshape(P, tb.shape[1], 8, -1)
                        # P-major line order: the next pass's (n2, 8, PR')
                        tails_out = jnp.moveaxis(tb, 0, 2).reshape(
                            tb.shape[1], 8, -1)
                y = Yk.reshape(lead + (n * T,) + tuple(rows))
                if pad:
                    y = jax.lax.slice_in_dim(
                        y, 0, n * T - pad, axis=-1 - nrow)
                return (y, tails_out) if next_tails is not None else y
            # Unchained single-dimension stages (dog_sat's SAT2x/SAT2y):
            # a Python loop over the P slices — XLA overlaps the
            # independent per-slice kernel chains, which measured FASTER
            # than one batched grid here (4K dog_sat px6 4.22 vs 5.20 ms
            # vmapped) despite the extra jnp.stack emit.
            ys = []
            for p in range(P):
                xq = X[p].reshape(R, n, T)
                st_taps_p = st_extra_p = None
                if stencil is not None and pad == 0:
                    st_taps_p = _stencil_taps_for(stencil, p)
                    st_extra_p = _stencil_extra_rows(mats, st_taps_p, T)
                braw_t = _completion.tails_pass(
                    xq, Gcat, nprod=nprod_k, interpret=interp,
                    extra_rows=st_extra_p)
                braw8 = braw_t[:, :sl] if st_extra_p is not None else braw_t
                if bands is not None:
                    Nt8 = _banded_solve_apply(bands, braw8, S)
                else:
                    Nt8 = jnp.einsum(
                        "ts,sl->tl", CMp, braw8.reshape(n * sl, R),
                        preferred_element_type=acc,
                        precision=jax.lax.Precision.HIGHEST,
                    ).reshape(n, sl, R)
                st_k = None
                if st_extra_p is not None:
                    prev_h, nxt_h = _stencil_halo(mats, braw_t, Nt8,
                                                  st_taps_p, n, T, pad)
                    st_k = dict(taps=st_taps_p, prev=prev_h, nxt=nxt_h,
                                start=stencil.get("start", "zero"),
                                end=stencil.get("end", "clamp"))
                Yk = _completion.completion_pass(
                    xq, Btot_np, Rcat, Nt8, rot=True, nprod=nprod_k,
                    interpret=interp, carries_transposed=True,
                    stencil=st_k)
                ys.append(Yk.reshape((n, T) + tuple(rows)))
            if stencil is not None and pad == 0:
                stencil = None  # consumed in-kernel per slice
            y = jnp.stack(ys).reshape(lead + (n * T,) + tuple(rows))
            if pad:
                y = jax.lax.slice_in_dim(y, 0, n * T - pad, axis=-1 - nrow)
            if stencil is not None:
                y = _stencil_fallback(y, stencil, -1 - nrow)
            return y

    Gcat = pad_rows8(Gcat)
    braw = apply(Gcat, X, fast=True)[..., :S]  # (P, *rows, n, S)

    if n <= _CHAIN_MATMUL_MAX_TILES:
        CM_np = combined_solve_matrix(mats, n)
        if nsp >= 9:
            # integer-exact mode: the solve must be drop-free too
            Ncat = _split_einsum(
                "ts,ls->lt", CM_np, braw.astype(acc).reshape(PR, n * S),
                nsp, acc,
            ).reshape((P,) + tuple(rows) + (n, S))
        else:
            bands = banded_solve_blocks(CM_np, n, S)
            if bands is not None:
                Ncat = _banded_solve_apply_nat(
                    bands, braw.astype(acc), jax.lax.Precision.HIGHEST)
            else:
                CMfull = jnp.asarray(CM_np, dtype=acc)
                Ncat = jnp.einsum(
                    "ls,ts->lt", braw.astype(acc).reshape(PR, n * S), CMfull,
                    preferred_element_type=acc, precision=prec,
                ).reshape((P,) + tuple(rows) + (n, S))
    else:
        # associative fallback per scan (audio-scale) — reuse the 4-axis
        # solver by treating the row axes as the batch axis
        offs = np.cumsum([0] + mats.orders)
        Ns = []
        for i in range(m):
            b = braw[..., offs[i] : offs[i + 1]].reshape(PR, n, -1)
            for j in range(i):
                prev = Ns[j].reshape(PR, n, -1)
                Hs = jnp.asarray(np.asarray(mats.H[i][j]), dtype=cdt)
                corr = (
                    jnp.einsum("oj,anj->ano", Hs[0], prev)
                    if Hs.shape[0] == 1
                    else jnp.einsum("noj,anj->ano", Hs, prev)
                )
                b = b + corr
            Ns.append(
                _chain_solve_assoc(b, scans[i], T, lambda M: jnp.asarray(M, acc), True)
                .reshape((P,) + tuple(rows) + (n, -1))
            )
        Ncat = jnp.concatenate(Ns, axis=-1)

    Rcat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)
    rot = rot_axes >= 2
    Y = None
    tails_out = None
    nprod_k = _kernel_nprod(
        cdt, mmd, matmul_precision,
        structural=(stencil is not None or tails_in is not None
                    or next_tails is not None))
    if nprod_k and (P == 1 or not rot):
        from .kernels import completion as _completion

        interp = _interp()
        if _completion.completion_ok(T, PR, n, S, interp):
            k_epi, ke_aux = _kernel_epilogue_aux(
                epilogue, next_tails, rot, lead, P, n, T, rows, PR, pad,
                eaux)
            Yk = _completion.completion_pass(
                X.reshape(PR, n, T), np.asarray(mats.Btot), Rcat,
                Ncat.reshape(PR, n, S), rot=rot, nprod=nprod_k,
                interpret=interp, next_tails=next_tails,
                epilogue=k_epi, eaux=ke_aux,
            )
            epilogue = None if k_epi is not None else epilogue
            if next_tails is not None:
                Yk, tails_out = Yk
                if tails_out is not None:
                    if pad:
                        tails_out = tails_out[:, :, : n * T - pad]
                    tails_out = tails_out.reshape(
                        tails_out.shape[0], 8, -1
                    )
            if rot:
                Y = Yk.reshape((P, n, T) + tuple(rows))
            else:
                Y = Yk.reshape((P,) + tuple(rows) + (n, T))
    if Y is None:
        # px modes fall back to true-f32 HIGHEST einsums when the kernel's
        # static constraints don't hold (non-128 tile, tiny strips, P>1 rot).
        Y = apply(mats.Btot, X, fast=True, out_t=rot)
        Y = Y + apply(Rcat, Ncat.astype(cdt), out_t=rot)

    if epilogue is not None and stencil is None:
        # Natural output layout: rot → lead + (nT,) + rows (scanned axis at
        # len(lead)); in-place → lead + rows + (nT,).
        if rot:
            nat_ax, tshape = len(lead), (P, n, T) + tuple(rows)
        else:
            nat_ax, tshape = -1, (P,) + tuple(rows) + (n, T)
        Y = epilogue(Y, *(_retile_aux(a, Y.dtype, nat_ax, pad, tshape)
                          for a in eaux))

    if rot:
        y = Y.reshape(lead + (n * T,) + tuple(rows))
        if pad:
            y = jax.lax.slice_in_dim(y, 0, n * T - pad, axis=-1 - nrow)
    else:
        y = Y.reshape(lead + tuple(rows) + (n * T,))
        if pad:
            y = jax.lax.slice_in_dim(y, 0, n * T - pad, axis=-1)
    if stencil is not None:
        # stencil before epilogue (the consumer-order contract)
        y = _stencil_fallback(y, stencil, (-1 - nrow) if rot else -1)
        if epilogue is not None:
            y = epilogue(y, *(jnp.asarray(a).astype(y.dtype) for a in eaux))
    return (y, tails_out) if next_tails is not None else y

def dim_pass_stages(x, axis: int, scans: Sequence[Scan], tile_width: int,
                    border: str = BorderMode.ZERO):
    """Every internal stage value of one fused dimension pass, computed
    from the SHIPPING executor's matrices (prepare_dim_pass /
    combined-solve algebra) — the debugging surface behind
    ``RecFilter.func(name)`` (``lib/recfilter.h:296-302``).

    Returns a dict with per-scan lists (i indexes ``scans``):

      * ``intra[i]``  — raw local tails G_i·x, shape lead + (n, k_i)
        (the reference's Intra/Intra_Tail terms, ``lib/split.cpp:256-499``)
      * ``tdeps[i]``  — cross-scan residual Σ_{j<i} H_ij·N_j onto scan i's
        tails (``create_tail_residual_term``, ``lib/split.cpp:912-1004``)
      * ``ctail[i]``  — completed carries N_i (the natural incoming
        vectors; ``create_complete_tail_term``, ``lib/split.cpp:743-867``)
      * ``deps[i]``   — per-tile injection residual Rhat_i·N_i in image
        layout lead + (n, T) (``create_final_residual_term``,
        ``lib/split.cpp:1008-1130``)
      * ``final[i]``  — the image after scans 0..i of this dimension
        (x's shape; the prefix scans[:i+1] completion)

    ``lead`` are x's other axes (scanned axis moved last). Raises when the
    dimension is untileable (order exceeds any legal tile / clamp with no
    divisor) — stage views are defined by the tiled algebra.
    """
    clamp = border == BorderMode.CLAMP
    w = x.shape[axis]
    kmax = max(s.order for s in scans)
    plan = _plan_tiles(w, tile_width, kmax, clamp)
    if plan is None:
        raise ValueError(
            "dimension not tileable; per-stage view undefined (the "
            "executor would route this case to the lax.scan core)"
        )
    T, n, pad = plan
    if pad:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, pad)
        x = jnp.pad(x, pads)
    xm = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    lead = xm.shape[:-1]
    X = xm.reshape(lead + (n, T))
    hi = jax.lax.Precision.HIGHEST

    def ap(Mstack, V):
        M = np.asarray(Mstack, np.float64)
        Mn = jnp.asarray(
            M[np.minimum(np.arange(n), M.shape[0] - 1)], jnp.float32)
        return jnp.einsum("nos,...ns->...no", Mn, V,
                          preferred_element_type=jnp.float32, precision=hi)

    mats = prepare_dim_pass(scans, T, n, clamp, pad_slots=pad)
    m = len(scans)
    out = {"intra": [], "tdeps": [], "ctail": [], "deps": [], "final": []}
    N = []
    for i in range(m):
        k = scans[i].order
        b = ap(mats.G[i], X)
        td = jnp.zeros_like(b)
        for j in range(i):
            td = td + ap(mats.H[i][j], N[j])
        bi = b + td
        CM = jnp.asarray(mats.CM[i], jnp.float32)
        lines = bi.reshape(-1, n * k)
        Ni = jnp.einsum("ls,ts->lt", lines, CM,
                        preferred_element_type=jnp.float32,
                        precision=hi).reshape(lead + (n, k))
        N.append(Ni)
        out["intra"].append(b)
        out["tdeps"].append(td)
        out["ctail"].append(Ni)
        out["deps"].append(ap(mats.Rhat[i], Ni))
        # the prefix scans[:i+1] completion IS the image after scan i
        mp = mats if i == m - 1 else prepare_dim_pass(
            scans[: i + 1], T, n, clamp, pad_slots=pad)
        y = ap(mp.Btot, X)
        for j in range(i + 1):
            y = y + ap(mp.Rhat[j], N[j])
        y = jnp.moveaxis(y.reshape(lead + (n * T,)), -1, axis)
        if pad:
            y = jax.lax.slice_in_dim(y, 0, w, axis=axis)
        out["final"].append(y)
    return out


def _moments_tails_2d(x, sc1, plan1, sc2, plan2, clamp, interp, nprod=0):
    """Both passes' raw tails from ONE read of the image (2-D px chain).

    The chained-tails mechanism extracts pass 2's tails inside pass 1's
    completion kernel; that extraction costs ~0.06 ms/4K of VPU re-split
    work per pass (measured). Here the overlap identity does it on
    carry-sized data instead: the moments kernel (one read) produces the
    x-dim raw tails U AND the y-dim raw tails of the RAW image bA; pass
    2's raw tails of the x-completed image follow from

        Gy ∘ Y1 = Btot_x ∘ (Gy ∘ x) + Rcat_x ∘ (Gy ∘ N_x)

    (operators on different axes commute — ``lib/split.cpp:1215-1633``'s
    role, the same identity as overlap2d, specialized to the rotation-
    chained px pipeline's layouts). Both completion kernels then run
    extraction-free. Returns (braw_x, braw_y) in the slot-padded
    transposed (n, 8, lines) layouts the px pass consumes, or None when
    the geometry gates fail (caller keeps the in-kernel chaining)."""
    from .kernels import completion as _completion
    from .kernels import final2d as k2d

    h, w = x.shape
    T1, n1, pad1 = plan1   # pass-1 dim (lanes, w)
    T2, n2, pad2 = plan2   # pass-2 dim (sublanes, h)
    if pad1 or pad2 or T1 != 128 or T2 != 128:
        return None
    if n1 > _CHAIN_MATMUL_MAX_TILES or n2 > _CHAIN_MATMUL_MAX_TILES:
        return None
    m1 = prepare_dim_pass(sc1, T1, n1, clamp)
    m2 = prepare_dim_pass(sc2, T2, n2, clamp)
    Kx = int(sum(m1.orders))
    Ky = int(sum(m2.orders))
    if Kx > 8 or Ky > 8:
        return None
    Gx = np.concatenate([np.asarray(g) for g in m1.G], axis=1)
    Gy = np.concatenate([np.asarray(g) for g in m2.G], axis=1)

    X4 = x.reshape(1, n2, T2, w).astype(jnp.float32)
    if nprod:
        # Split-bf16 moments kernel: same accuracy grade as the px
        # completion kernels, no HIGHEST operand-conversion copies.
        bA_t, U_t = k2d.moments2d_px(X4, Gy, Gx, nprod=nprod,
                                     interpret=interp)[:2]
        bA = bA_t[:, :, :Ky]                       # (1, n2, Ky, w)
        # U_t (1, n2, n1*8, T2) → pass-1 lines layout (n1, 8, h)
        braw_x = jnp.transpose(
            U_t[0].reshape(n2, n1, 8, T2), (1, 2, 0, 3)
        ).reshape(n1, 8, h)
    else:
        bA, U = k2d.moments2d(X4, Gy, Gx, interp)
        # U (1, n2, n1, T2, Kx) → pass-1 lines layout (n1, 8, h)
        braw_x = jnp.transpose(U[0], (1, 3, 0, 2)).reshape(n1, Kx, h)
        if Kx < 8:
            braw_x = jnp.pad(braw_x, ((0, 0), (0, 8 - Kx), (0, 0)))

    # Solve N_x for the carry-sized y-tails identity (pass 1 re-solves the
    # identical system from the same raw tails — XLA CSE merges them).
    CMpx = jnp.asarray(
        _completion.pad_solve_matrix(combined_solve_matrix(m1, n1), n1, Kx),
        jnp.float32,
    )
    Nx8 = jnp.einsum(
        "ts,sl->tl", CMpx, braw_x.reshape(n1 * 8, h),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(n1, 8, h)

    hi = jax.lax.Precision.HIGHEST
    Btx = jnp.asarray(np.asarray(m1.Btot), jnp.float32)
    Rcx = jnp.asarray(
        np.concatenate([np.asarray(r) for r in m1.Rhat], axis=2), jnp.float32
    )
    Gys = jnp.asarray(Gy, jnp.float32)
    bA4 = bA[0].reshape(n2, Ky, n1, T1)
    if Btx.shape[0] == 1:
        Z1 = jnp.einsum("os,akns->akno", Btx[0], bA4,
                        preferred_element_type=jnp.float32, precision=hi)
    else:
        Z1 = jnp.einsum("nos,akns->akno", Btx, bA4,
                        preferred_element_type=jnp.float32, precision=hi)
    NxR = Nx8[:, :Kx, :].reshape(n1, Kx, n2, T2)
    if Gys.shape[0] == 1:
        GN = jnp.einsum("kt,nxat->aknx", Gys[0], NxR,
                        preferred_element_type=jnp.float32, precision=hi)
    else:
        GN = jnp.einsum("akt,nxat->aknx", Gys, NxR,
                        preferred_element_type=jnp.float32, precision=hi)
    if Rcx.shape[0] == 1:
        T2term = jnp.einsum("ox,aknx->akno", Rcx[0], GN,
                            preferred_element_type=jnp.float32, precision=hi)
    else:
        T2term = jnp.einsum("nox,aknx->akno", Rcx, GN,
                            preferred_element_type=jnp.float32, precision=hi)
    braw_y = (Z1 + T2term).reshape(n2, Ky, w)
    if Ky < 8:
        braw_y = jnp.pad(braw_y, ((0, 0), (0, 8 - Ky), (0, 0)))
    return braw_x, braw_y


# ---------------------------------------------------------------------------
# Hierarchical two-level chain: tiles -> supertiles (VERDICT r3 #4)
# ---------------------------------------------------------------------------


def _chain_prefix_axis(b, scan: Scan, seg: int, D: int, prec):
    """In-chip Kogge–Stone carry-chain solve over a supertile ARRAY axis:
    ``parallel.sharding._ks_chain`` with zero-filled jnp shifts along axis
    -2 of ``b`` (..., D, k) in place of ``ppermute`` (the zero fill IS the
    zero-state boundary condition). log₂(D) einsum steps against k×k
    transfer powers — no (D·k)² matrix at any point. Returns the natural
    incoming vectors N (..., D, k) consumed by the Rcat correction."""
    k = scan.order
    W = coeffs.tail_weight_matrix(scan.feedback, seg)
    Jk = np.asarray(coeffs.antidiagonal(k))

    def mat(M):
        return jnp.asarray(np.asarray(M), jnp.float32)

    def shift(a, s):
        # causal: recv_d = a_{d-s}; anticausal: recv_d = a_{d+s}
        z = jnp.zeros_like(a[..., :s, :])
        if scan.causal:
            return jnp.concatenate([z, a[..., : D - s, :]], axis=-2)
        return jnp.concatenate([a[..., s:, :], z], axis=-2)

    if scan.causal:
        # u_d = Jk b_d; inclusive s_d = Σ_{i≤d} W^{d-i} u_i; N_d = Jk s_{d-1}
        u = jnp.einsum("ij,...j->...i", mat(Jk), b, precision=prec,
                       preferred_element_type=jnp.float32)
    else:
        # natural order IS W-order; inclusive from the right; N_d = s_{d+1}
        u = b
    s_ = u
    sh = 1
    Wp = np.asarray(W, np.float64).copy()
    while sh < D:
        s_ = s_ + jnp.einsum("ij,...j->...i", mat(Wp), shift(s_, sh),
                             precision=prec,
                             preferred_element_type=jnp.float32)
        sh *= 2
        Wp = Wp @ Wp
    s_prev = shift(s_, 1)
    if scan.causal:
        return jnp.einsum("ij,...j->...i", mat(Jk), s_prev, precision=prec,
                          preferred_element_type=jnp.float32)
    return s_prev


def hierarchical_dim_pass(x, axis: int, scans: Sequence[Scan], border: str,
                          matmul_precision: str):
    """Audio-scale dimension pass via a TWO-LEVEL chain so n ~ 10^4 tile
    counts ride the px completion kernels (whose gates cap the dense
    combined solve at n <= 512 lane tiles of 128).

    Level 1: reshape the scan axis into (n_sup, seg) supertiles of
    seg = 256·128 samples and run each scan's zero-state local pass with
    the supertile axis as LINES — the kernels get real line counts
    (PR = lead·n_sup) instead of the 1-D signal's skinny batch, and every
    supertile's chain solves densely at n = 256 tiles. Level 2: one
    (n_sup·ΣK)² combined solve over the supertile boundary carries — the
    device-level exchange algebra (``parallel.sharding``) applied at the
    in-chip level, with the same clamp rank-1 edge corrections and pad
    projector — then a rank-ΣK correction closes every supertile.

    The internal tile width is 128 regardless of the caller's (the blocked
    algebra's result is tile-invariant). Returns None when a gate fails
    (ΣK > 64, > 512 supertiles ≈ 16.7M samples at ΣK ≤ 8 — the S>8
    Kogge–Stone route runs to 4096 ≈ 134M — tiny effective
    last segment, non-px precision) — callers keep the associative-scan
    path. Reference headline workload:
    ``apps/audio/audio_filter_high_order.cpp:38-93``.
    """
    S = int(sum(s.order for s in scans))
    kmax = max(s.order for s in scans)
    # ΣK ≤ 8: one 8-sublane carry slot — dense (n_sup·ΣK)² combined solve
    # (measured route). Past 8, the dense matrix grows quadratically in
    # n_sup·ΣK (315 MB at 10M samples / order 29), so level 2 switches to
    # per-scan Kogge–Stone transfer chains over the supertile axis — the
    # in-chip analog of parallel.sharding._ks_chain — and level-1 locals
    # ride the banded einsum solve. Covers the reference's full audio
    # sweep (orders 1..29, biquads 1..30 → overlapped order ≤ 60:
    # apps/audio/audio_filter_high_order.cpp:38-93).
    if S > 64:
        return None
    # px modes ride the completion kernels inside the supertile locals;
    # throughput mode ("default") rides the same structure through plain
    # einsum locals — the dense 256-tile supertile solves beat the
    # associative chain either way (A/B: px6 1.06 -> 0.46 ms at 10M/ord2).
    if (_kernel_nprod(jnp.float32, None, matmul_precision) < 3
            and matmul_precision != "default"):
        return None
    w = x.shape[axis]
    T = 128
    seg = _CHAIN_MATMUL_MAX_TILES * T  # 256 tiles: the kernel-eligible max
    n_sup = -(-w // seg)
    # The dense (n_sup·S)² level-2 solve caps at 512 supertiles (~16.7M
    # samples); the S>8 Kogge–Stone route has no quadratic term and runs
    # to 4096 supertiles (~134M samples) — log₂ shift/einsum steps on
    # carry-sized arrays only.
    if n_sup < 2 or n_sup > (512 if S <= 8 else 4096):
        return None
    pad = n_sup * seg - w
    if seg - pad <= kmax + 1:
        return None
    clamp = border == BorderMode.CLAMP

    from .parallel import sharding as _sh

    xm = jnp.moveaxis(x, axis, -1) if axis != x.ndim - 1 else x
    lead = xm.shape[:-1]
    if pad:
        xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, pad)])
    y = xm.reshape(lead + (n_sup, seg)).astype(jnp.float32)

    cs = []
    for s in scans:
        k = s.order
        if clamp:
            e_seg = 0 if s.causal else n_sup - 1
            e_pos = 0 if s.causal else seg - 1 - pad
            x_edge = y[..., e_seg, e_pos][..., None, None]
        y = fused_dim_pass(y, y.ndim - 1, [s], T, BorderMode.ZERO,
                           matmul_precision=matmul_precision)
        if clamp:
            v = _sh._clamp_col(s, seg if s.causal else seg - pad, total=seg)
            vj = jnp.asarray(v, y.dtype)
            upd = y[..., e_seg, :] + vj * x_edge[..., 0, :]
            y = y.at[..., e_seg, :].set(upd)
        if pad:
            y = y.at[..., n_sup - 1, seg - pad:].set(0.0)
        c = y[..., seg - k:] if s.causal else y[..., :k]
        cs.append(c)
    ccat = jnp.concatenate(cs, axis=-1)  # (..., n_sup, S)

    orders, H, CMs, Rcats = _sh._segment_exchange_mats(
        scans, seg, n_sup, clamp, pad, build_cm=S <= 8)
    hi = jax.lax.Precision.HIGHEST
    if S <= 8:
        CMfull = _sh._combined_solve(orders, H, CMs, n_sup)  # (n_sup·S)²
        N = jnp.einsum(
            "ts,...s->...t", jnp.asarray(CMfull, jnp.float32),
            ccat.reshape(lead + (n_sup * S,)),
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(lead + (n_sup, S))
    else:
        # Per-scan Kogge–Stone chains over the supertile ARRAY axis: only
        # k×k transfer powers as constants (vs the (n_sup·S)² dense
        # matrix); cross-scan H couplings injected scan by scan, exactly
        # as the device-level ring route does (_seq_solve_ring).
        offs2 = np.cumsum([0] + orders)
        Ns = []
        for i, s in enumerate(scans):
            b = ccat[..., offs2[i]:offs2[i + 1]]
            for j in range(i):
                Hs = np.asarray(H[i][j])  # (1|n_sup, k_i, k_j)
                eq = ("ok,...nk->...no" if Hs.shape[0] == 1
                      else "nok,...nk->...no")
                Hm = Hs[0] if Hs.shape[0] == 1 else Hs
                b = b + jnp.einsum(eq, jnp.asarray(Hm, jnp.float32), Ns[j],
                                   preferred_element_type=jnp.float32,
                                   precision=hi)
            Ns.append(_chain_prefix_axis(b, s, seg, n_sup, hi))
        N = jnp.concatenate(Ns, axis=-1)

    # Rank-S correction: interior columns on every supertile, plus edge
    # deltas on the globally-first/last supertiles under clamp/pad.
    Rint = Rcats[0 if Rcats.shape[0] == 1 else 1]
    y = y + jnp.einsum("ts,...ns->...nt", jnp.asarray(Rint, jnp.float32), N,
                       preferred_element_type=jnp.float32, precision=hi)
    if Rcats.shape[0] == 3:
        for sel, si in ((0, 0), (2, n_sup - 1)):
            dR = np.asarray(Rcats[sel]) - np.asarray(Rint)
            corr = jnp.einsum(
                "ts,...s->...t", jnp.asarray(dR, jnp.float32),
                N[..., si, :], preferred_element_type=jnp.float32,
                precision=hi)
            y = y.at[..., si, :].add(corr)

    y = y.reshape(lead + (n_sup * seg,))
    if pad:
        y = jax.lax.slice_in_dim(y, 0, w, axis=-1)
    if axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Exact tiled integer execution (VERDICT r3 #3)
# ---------------------------------------------------------------------------


def _int_cast_scans(spec: FilterSpec):
    """Coefficients cast into the image type, as the reference does
    (``lib/recfilter.cpp:324-341``) and as the integer oracle does
    (scan_core.oracle_apply / apply_filter): int16 coeffs wrap at int16.
    Returns float-valued Scans with exactly-integral coefficients, or None
    if a cast coefficient cannot be held exactly in float64 (never for
    itemsize <= 4)."""
    t = np.dtype(spec.dtype).type
    out = []
    for s in spec.scans:
        ff = float(int(t(s.feedfwd)))
        fb = tuple(float(int(t(c))) for c in s.feedback)
        out.append(Scan(s.axis, s.causal, ff, fb))
    return out


def _int_abs_gain(scans, extent: int, border: str) -> float:
    """Worst-case growth of one dimension pass: ∏ over the dim's scans of
    ``Σ|h_s| (+ max|clamp column|)`` — the entrywise-absolute operator norm
    ‖ |B_m|⋯|B_1| ‖_∞ bound, from each scan's SIGNED impulse response
    (float64). Every intermediate of the blocked algebra — tails, carries,
    corrections, AND every partial sum inside its dots — is an entry (or
    partial sum) of a product of per-scan impulse blocks with {0,1}
    projections, so entrywise |∏ B_s| ≤ ∏ |B_s| bounds them all. (An
    abs-COEFFICIENT cascade is exponentially loose for signed feedbacks
    like box2's (2,-1), whose signed operator grows only polynomially.)

    Clamp: B_clamp = B + v·e_edgeᵀ is rank-1 off the zero-border operator
    (see parallel.sharding._clamp_col), so Σ|B_clamp| ≤ Σ|h| + max|v|."""
    from . import scan_core

    g = 1.0
    for s in scans:
        e = np.zeros((extent, 1), np.float64)
        e[0 if s.causal else extent - 1, 0] = 1.0
        h = scan_core.oracle_apply_scan(
            e, 0, s.causal, s.feedfwd, list(s.feedback), BorderMode.ZERO
        )
        gs = float(np.abs(h).sum())
        if border == BorderMode.CLAMP:
            hc = scan_core.oracle_apply_scan(
                e, 0, s.causal, s.feedfwd, list(s.feedback), BorderMode.CLAMP
            )
            gs += float(np.abs(hc - h).max())
        g *= max(gs, 1.0)
        if not np.isfinite(g) or g >= 2 ** 23:
            return float("inf")
    return g


def _int_limbs(v, lb: int, nl: int):
    """Split int32 ``v`` into ``nl`` signed limbs of ``lb`` bits:
    v = Σ limb_i · 2^(lb·i) exactly (two's complement low-bits with borrow
    propagation — no intermediate overflow)."""
    half = jnp.int32(1 << (lb - 1))
    mask = jnp.int32((1 << lb) - 1)
    out = []
    for _ in range(nl - 1):
        low = v & mask
        limb = (low ^ half) - half  # sign-extended low lb bits
        out.append(limb)
        v = (v >> lb) + (low >= half).astype(jnp.int32)
    out.append(v)
    return out


def apply_filter_int_exact(spec: FilterSpec, x, tile_default: int = 32):
    """Integer filters through the TILED executor, bit-exact vs the integer
    oracle (modular wrap semantics), by mantissa-limb decomposition:

    Per scanned dimension, split the int32 accumulator into signed limbs
    small enough that the limb pass's worst-case magnitude (limb range ×
    the entry-abs cascade gain) stays under 2^22; run each limb through
    the tiled dimension pass in the drop-free ``f32x9`` mode — 3-chunk
    bf16 splits represent any integer < 2^24 exactly (every chunk is
    itself an integer), chunk products are exact bf16×bf16→f32, f32
    partial sums below 2^24 are exact, and ALL NINE chunk products are
    kept in every image matmul, carry solve, and injection (6-product
    schemes like px6/HIGHEST drop the low cross terms, whose sums grow
    past ±0.5 at large gains — measured as off-by-one at box2 scale) —
    then recombine with wrapping shifts (mod 2^32 ≡ per-step wrap at the
    image type, by ring homomorphism). The reference runs integers through
    its ONE tiled pipeline by casting coefficients into the image type
    (``lib/recfilter.cpp:324-341``, ``tests/test_type_invariance.cpp:17-63``);
    this is that, the TPU way.

    Returns None when exactness is not provable (itemsize > 4, or a
    dimension's gain leaves < 2 limb bits) — callers fall back to the
    sequential lax.scan core.
    """
    from .kernels import int_scan as _is

    dtype = np.dtype(spec.dtype)
    if dtype.itemsize > 4:
        return None
    scans = _int_cast_scans(spec)
    groups = spec.scans_by_axis()
    # Per-dim gate first (no partial work on fallback).
    #
    # Fast route per dimension: if EVERY scan of the dim is unit-feedback
    # (order 1, a = ±1, one integral tap — the SAT/integral-image class)
    # and the border is ZERO, the whole dim runs the wrapping additive
    # kernel (pure VPU adds, 2 HBM touches, exact mod 2^32 by
    # construction — no gain gate at all). Otherwise the limb route: a
    # dim whose scan cascade's combined gain leaves < 2 limb bits is
    # split into consecutive scan chunks with limb recombination between
    # (each chunk is its own exact mod-2^32 linear pass).
    plan_dims = []
    xi = jnp.asarray(x).astype(jnp.int32)
    bits = dtype.itemsize * 8

    def _limb_chunks(ax, ids, bits_in):
        """Chunked limb plan for one dim, or None past the provable gate.
        Returns (plan_entries, bits_out)."""
        chunk, gc = [], 1.0
        chunks = []
        for i in ids:
            gi = _int_abs_gain([scans[i]], xi.shape[ax], spec.border)
            if not np.isfinite(gi) or gi >= 2 ** 21:
                return None
            if chunk and gc * gi >= 2 ** 21:
                chunks.append((chunk, gc))
                chunk, gc = [], 1.0
            chunk.append(i)
            gc *= gi
        chunks.append((chunk, gc))
        out, b = [], bits_in
        for chunk, gc in chunks:
            lg = max(int(np.ceil(np.log2(gc))), 0)
            lb = 23 - lg
            if lb < 2:
                return None
            nl = -(-min(b, 32) // lb)
            out.append(("limb", tuple(chunk), lb, nl))
            b = min(b + lg, 32)
        return out, b

    for ax, ids in groups.items():
        unit = (
            [_is.unit_scans_of(scans[i]) for i in ids]
            if spec.border == BorderMode.ZERO else [None]
        )
        if all(u is not None for u in unit):
            flat = [u for us in unit for u in us]
            # Limb fallback planned at the conservative bits=32 input (the
            # kernel can still decline on geometry — awkward VMEM fits).
            fb = _limb_chunks(ax, ids, 32)
            plan_dims.append((ax, [("unit", flat)] + (fb[0] if fb else [])))
            bits = 32  # wrapped values occupy the full word downstream
            continue
        plan = _limb_chunks(ax, ids, bits)
        if plan is None:
            return None
        plan_dims.append((ax, plan[0]))
        bits = plan[1]

    tiles = spec.tile_widths or (0,) * spec.ndim
    for ax, routes in plan_dims:
        if routes and routes[0][0] == "unit":
            y = _is.int_unit_dim_pass(xi, routes[0][1], ax, _interp())
            if y is not None:
                xi = y
                continue
            routes = routes[1:]  # kernel declined; the limb fallback plan
            if not routes:
                return None
        for route in routes:
            _, ids, lb, nl = route
            sc = [scans[i] for i in ids]
            T = min(tiles[ax] or tile_default, xi.shape[ax])
            kmax = max(s.order for s in sc)
            p = _plan_tiles(xi.shape[ax], T, kmax,
                            spec.border == BorderMode.CLAMP)
            if p is not None and p[1] > _CHAIN_MATMUL_MAX_TILES:
                # the associative audio-scale solver is not drop-free audited
                return None
            limbs = _int_limbs(xi, lb, nl)
            acc = None
            for i, limb in enumerate(limbs):
                y = fused_dim_pass(
                    limb.astype(jnp.float32), ax, sc, T, spec.border,
                    matmul_precision="f32x9",
                )
                yi = jnp.round(y).astype(jnp.int32)
                acc = yi if acc is None else acc + (yi << jnp.int32(lb * i))
            xi = acc
    return xi.astype(jnp.dtype(spec.dtype))


def apply_filter_fused(spec: FilterSpec, x, tile_default: int = 32,
                       matmul_dtype=None, matmul_precision: str = "highest",
                       epilogue=None, eaux=(), stencil2d=None):
    """Whole-filter executor: one fused pass per scanned dimension.

    ``epilogue(out, *eaux)`` — optional elementwise combine fused into the
    LAST dimension pass's completion matmul (eaux arrays share the filter's
    output shape/layout); the TPU analog of the reference's ``compute_at``
    of a pointwise consumer into the filter's final kernel
    (``apps/usm/unsharp_mask_optimized.cpp:61-71``).

    ``stencil2d`` — per-channel 2-D shifted-tap consumer banks
    ``[[(dy, dx, coeff), ...], ...]`` over the trailing two axes (border
    semantics per ``kernels.stencil2d.stencil2d_pass``); fused into the
    3-touch 2-D executor's emit when its gates hold, else applied as the
    standalone stencil kernel / XLA shifts on the filter output. Returns
    a TUPLE of per-channel arrays. Mutually exclusive with ``epilogue``."""
    from . import scan_core

    if stencil2d is not None:
        assert epilogue is None and not eaux

        def _st_fallback(y):
            from .kernels import stencil2d as st2d

            if y.ndim == 2 and jax.default_backend() == "tpu":
                out = st2d.stencil2d_pass(y, stencil2d)
                if out is not None:
                    return out if isinstance(out, tuple) else (out,)
            return st2d.stencil2d_ref(y, stencil2d)

    dtype = jnp.dtype(spec.dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        y = apply_filter_int_exact(spec, x, tile_default)
        if y is None:
            y = scan_core.apply_filter(spec, x)
        if epilogue is not None:
            y = epilogue(y, *eaux)
        if stencil2d is not None:
            return _st_fallback(y)
        return y
    if dtype == jnp.bfloat16:
        # Production bf16 mode: bf16 storage between passes (half the HBM
        # traffic), bf16 MXU matmuls, f32 accumulation and carry solves.
        cdt = jnp.bfloat16
        matmul_dtype = jnp.bfloat16
    else:
        cdt = jnp.float32 if dtype == jnp.float16 else dtype
    x = x.astype(cdt)
    tiles = spec.tile_widths or (0,) * spec.ndim
    groups = spec.scans_by_axis()
    nd = x.ndim
    clamp = spec.border == BorderMode.CLAMP

    # Rotation-chaining fast path: the scanned dims are the trailing D>=2
    # array axes. Process the LAST axis first (cross-dim scans commute) and
    # emit with the trailing-D group rotated one step, so the next scanned
    # dim lands on the last axis; after D passes the axis order is restored
    # exactly. Every pass contracts over lanes and no standalone relayout
    # copy sits between the passes (D=2: images; D=3: volumes).
    Ds = len(groups)

    # 3-touch px overlapped path for trailing-2-D filters: both dims'
    # carries from one read (moments kernel + overlap identity), then ONE
    # fused dual-completion kernel (dim-A completion never touches HBM).
    # Strictly fewer image touches than the rotation chain below (3 vs 5)
    # at the same compensated product counts.
    if _OVERLAP_PX_2D and Ds == 2 and set(groups) == {nd - 2, nd - 1}:
        nprod = _kernel_nprod(cdt, matmul_dtype, matmul_precision,
                              structural=True)
        # f32 px modes (compensated products), the bf16 storage mode
        # (nprod=1: plain products, bf16 image touches — half the traffic
        # of the f32 modes on the same 3-touch structure), AND the f32
        # throughput mode ("default" = XLA's own single-pass bf16 dots —
        # one plain kernel product is the same rounding class, and the
        # 3-touch structure beats the einsum chain's 5 touches: 8K
        # gaussian3 measured 4.40 ms on the einsum chain at default).
        if (cdt == jnp.float32 and nprod >= 1) or (
                cdt == jnp.bfloat16 and nprod == 1):
            from . import overlap2d

            ax_a, ax_b = nd - 2, nd - 1
            y = overlap2d.fused_2d_px(
                x, ax_a, [spec.scans[i] for i in groups[ax_a]],
                ax_b, [spec.scans[i] for i in groups[ax_b]],
                spec.border, nprod, _interp(),
                epilogue=epilogue, eaux=eaux, stencil2d=stencil2d,
            )
            if y is not None:
                if stencil2d is not None:
                    return tuple(c.astype(dtype) for c in y)
                return y.astype(dtype)

    # Volumes (trailing 3 scanned axes): leading scan axis through the
    # sublane rows-pass kernels (lanes = the flattened trailing plane),
    # then the 3-touch 2-D executor on the trailing pair — 6 image
    # touches total vs the rotation chain's 7, and every pass contracts
    # full-width lanes (the chain's 256-lane volume passes run well off
    # the flat band).
    if (_OVERLAP_PX_2D and Ds == 3 and stencil2d is None
            and set(groups) == set(range(nd - 3, nd))):
        nprod = _kernel_nprod(cdt, matmul_dtype, matmul_precision,
                              structural=True)
        if (cdt == jnp.float32 and nprod >= 1) or (
                cdt == jnp.bfloat16 and nprod == 1):
            from . import overlap2d

            interp = _interp()
            z = overlap2d.fused_rows_px(
                x, nd - 3, [spec.scans[i] for i in groups[nd - 3]],
                spec.border, nprod, interp)
            if z is not None:
                y = overlap2d.fused_2d_px(
                    z, nd - 2, [spec.scans[i] for i in groups[nd - 2]],
                    nd - 1, [spec.scans[i] for i in groups[nd - 1]],
                    spec.border, nprod, interp,
                    epilogue=epilogue, eaux=eaux,
                )
                if y is not None:
                    return y.astype(dtype)
                # trailing-pair gates failed: finish via the chain on the
                # remaining two axes
                x = z
                groups = {k: v for k, v in groups.items() if k != nd - 3}
                Ds = 2

    if 2 <= Ds <= 5 and set(groups) == set(range(nd - Ds, nd)):
        order = [nd - 1 - i for i in range(Ds)]
        plans = {}
        ok = True
        for ax in order:
            sc = [spec.scans[i] for i in groups[ax]]
            plans[ax] = _plan_tiles(
                x.shape[ax],
                tiles[ax] or tile_default,
                max(s.order for s in sc),
                clamp,
            )
            ok = ok and plans[ax] is not None
        if ok:
            # After D rotated passes the axis order is restored, so the last
            # pass's natural output layout equals the input's — eaux arrays
            # in the filter's own layout fuse straight into its emit.
            #
            # px tails chaining (images, D=2): each non-final pass's fused
            # completion kernel extracts the NEXT pass's local tails from
            # the blocks it emits, so every pass after the first touches
            # HBM only twice (read x, write y) — the reference's
            # shared-memory-residency analog in the shipping backend.
            # (f32 px modes AND the bf16 storage mode both run the fused
            # kernels; the latter with one plain bf16 product)
            # Multi-pass chain: tails chaining is itself the structural
            # win that justifies throughput-mode kernels (_kernel_nprod).
            fuse_tails = _kernel_nprod(cdt, matmul_dtype,
                                       matmul_precision,
                                       structural=True) > 0
            tails_next = None
            # 2-D images: derive BOTH passes' raw tails from one read via
            # the moments kernel + overlap identity — the completion
            # kernels then run extraction-free (the in-kernel next_tails
            # re-split costs ~0.06 ms/4K). f32 px modes only (the moments
            # kernel computes HIGHEST-grade f32 tails; bf16 storage keeps
            # the in-kernel chain).
            moments = None
            if (_MOMENTS_CHAIN and fuse_tails and Ds == 2 and x.ndim == 2
                    and cdt == jnp.float32):
                moments = _moments_tails_2d(
                    x,
                    [spec.scans[j] for j in groups[order[0]]], plans[order[0]],
                    [spec.scans[j] for j in groups[order[1]]], plans[order[1]],
                    clamp, _interp(),
                    nprod=_kernel_nprod(cdt, matmul_dtype, matmul_precision,
                                        structural=True),
                )
                if moments is not None:
                    tails_next = moments[0]
            for i, ax in enumerate(order):
                sc = [spec.scans[j] for j in groups[ax]]
                final = i == len(order) - 1
                nt = None  # (moments path: pass 2's tails already derived)
                if moments is None and fuse_tails and not final:
                    ax2 = order[i + 1]
                    sc2 = [spec.scans[j] for j in groups[ax2]]
                    T2, n2, pad2 = plans[ax2]
                    S2 = sum(s.order for s in sc2)
                    if pad2 == 0 and T2 == 128 and S2 <= 8 and n2 <= 512:
                        mats2 = prepare_dim_pass(
                            sc2, T2, n2, clamp, pad_slots=0, build_cm=False
                        )
                        Gcat2 = np.concatenate(
                            [np.asarray(g) for g in mats2.G], axis=1
                        )
                        nt = (Gcat2, n2, T2)
                r = _last_axis_pass_t(
                    x, sc, plans[ax], clamp, cdt, matmul_dtype,
                    rot_axes=Ds, matmul_precision=matmul_precision,
                    epilogue=epilogue if final else None,
                    eaux=eaux if final else (),
                    tails_in=tails_next, next_tails=nt,
                )
                if moments is not None:
                    x = r
                    tails_next = None if final else moments[1]
                else:
                    x, tails_next = r if nt is not None else (r, None)
            if stencil2d is not None:
                return _st_fallback(x.astype(dtype))
            return x.astype(dtype)

    axes = list(groups)
    for axis in axes:
        ids = groups[axis]
        T = tiles[axis] or tile_default
        final = axis == axes[-1]
        # Non-last-axis scans: the sublane rows-pass kernels beat the
        # einsum form at the px grades — the split "ansb" einsums lower
        # to convolutions ~4x off bandwidth (ROADMAP's DoG xplane). NOT
        # at "default": XLA's single-product conv lowering is fine there
        # and the kernels lose fusion with surrounding stages (measured
        # 0.304 vs 0.205 ms per 4K pass, `scripts/rows_default_ab.py` —
        # the staged-cascade app regression this round caught). So no
        # structural claim here; px/bf16 grades still route.
        if (_OVERLAP_PX_2D and axis < nd - 1
                and (epilogue is None or not final)):
            nprod_r = _kernel_nprod(cdt, matmul_dtype, matmul_precision)
            if (cdt == jnp.float32 and nprod_r >= 1) or (
                    cdt == jnp.bfloat16 and nprod_r == 1):
                from . import overlap2d

                y = overlap2d.fused_rows_px(
                    x, axis, [spec.scans[i] for i in ids], spec.border,
                    nprod_r, _interp())
                if y is not None:
                    x = y
                    continue
        x = fused_dim_pass(
            x,
            axis,
            [spec.scans[i] for i in ids],
            T,
            spec.border,
            compute_dtype=cdt,
            matmul_dtype=matmul_dtype,
            matmul_precision=matmul_precision,
            epilogue=epilogue if final else None,
            eaux=eaux if final else (),
        )
    if stencil2d is not None:
        return _st_fallback(x.astype(dtype))
    return x.astype(dtype)


def apply_filter_rotated(
    spec: FilterSpec,
    x,
    rot_axes: int = 2,
    tile_default: int = 32,
    matmul_dtype=None,
    matmul_precision: str = "highest",
    epilogue=None,
    eaux=(),
    stencil=None,
):
    """Layout-chained executor for SINGLE-dimension filters.

    The input ``x`` must carry the spec's (one) scanned dimension as its
    LAST array axis — whatever that dimension's nominal position in the spec
    — and the result is emitted with the trailing ``rot_axes`` axes rotated
    one step (the scanned axis lands at position ``-rot_axes``). The rotated
    emission rides the completion matmuls' output ordering, so it costs
    nothing; chaining two such filters (x-scan then y-scan) runs BOTH in the
    fast lanes-contraction form with no relayout copy in between and
    restores the natural axis order — inter-filter rotation chaining, the
    pipeline-level analog of what :func:`apply_filter_fused` does internally
    for multi-dimension filters. Used by the DoG app, whose reference
    pipeline interleaves single-dimension integral stages with pointwise
    differencing (``apps/DoG/diff_gauss.cpp:72-110``).

    ``rot_axes=1`` emits in place (scanned axis stays last).

    ``epilogue(out, *eaux)`` — optional elementwise combine fused into the
    pass's emit; eaux arrays must be given in the ROTATED output layout.

    ``stencil`` — optional shifted-tap consumer fused into the pass
    (``{"taps": [(offset, coeff), ...], "start": "zero"|"clamp",
    "end": "zero"|"clamp"}``; taps may be a per-slice list-of-lists over
    the leading axis). Offsets address the SCANNED axis of the filter
    output; the px kernel path folds the taps into the completion kernel
    via neighbor halo strips (zero extra image streams — the TPU analog of
    the reference's ``compute_at`` of a stencil consumer,
    ``lib/recfilter.cpp:507-573``); every fallback applies the same taps
    as XLA shifts. The stencil applies BEFORE any ``epilogue``.
    """
    groups = spec.scans_by_axis()
    if len(groups) != 1:
        raise ValueError(
            "apply_filter_rotated requires a single scanned dimension; "
            f"{spec.name} scans {len(groups)}"
        )
    if not 1 <= rot_axes <= min(x.ndim, 6):
        raise ValueError(f"rot_axes {rot_axes} out of range for ndim {x.ndim}")
    (axis,) = groups
    ids = groups[axis]
    scans = [spec.scans[i] for i in ids]
    dtype = jnp.dtype(spec.dtype)

    def emit_rotated(y):  # fallback paths: pay the transpose explicitly
        return y if rot_axes == 1 else jnp.moveaxis(y, -1, -rot_axes)

    if jnp.issubdtype(dtype, jnp.integer):
        from . import scan_core

        for s in scans:
            x = scan_core.apply_scan(
                x, x.ndim - 1, s.causal, s.feedfwd, s.feedback, spec.border
            )
        y = emit_rotated(x)
        if stencil is not None:
            y = _stencil_fallback(y, stencil, -rot_axes)
        if epilogue is not None:
            y = epilogue(y, *eaux)
        return y

    if dtype == jnp.bfloat16:
        cdt = jnp.bfloat16
        matmul_dtype = jnp.bfloat16
    else:
        cdt = jnp.float32 if dtype == jnp.float16 else dtype
    x = x.astype(cdt)

    if x.shape[-1] != spec.dims[axis].extent:
        raise ValueError(
            f"last axis has {x.shape[-1]} elements, spec dim "
            f"{spec.dims[axis].name} expects {spec.dims[axis].extent}"
        )
    tiles = spec.tile_widths or (0,) * spec.ndim
    T = tiles[axis] or tile_default
    if x.ndim == 1:  # rot_axes is necessarily 1; the plain pass is the fast form
        if stencil is not None:
            y1 = fused_dim_pass(
                x, 0, scans, T, spec.border, compute_dtype=cdt,
                matmul_dtype=matmul_dtype, matmul_precision=matmul_precision,
            )
            y1 = _stencil_fallback(y1, stencil, -1)
            if epilogue is not None:
                y1 = epilogue(y1, *eaux)
            return y1.astype(dtype)
        return fused_dim_pass(
            x, 0, scans, T, spec.border, compute_dtype=cdt,
            matmul_dtype=matmul_dtype, matmul_precision=matmul_precision,
            epilogue=epilogue, eaux=eaux,
        ).astype(dtype)
    clamp = spec.border == BorderMode.CLAMP
    kmax = max(s.order for s in scans)
    plan = _plan_tiles(x.shape[-1], T, kmax, clamp)
    if plan is None:
        from . import scan_core

        # f32 carries even in bf16-storage mode (scan_core contract)
        xs = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
        for s in scans:
            xs = scan_core.apply_scan(
                xs, x.ndim - 1, s.causal, s.feedfwd, s.feedback, spec.border
            )
        y = emit_rotated(xs)
        if stencil is not None:
            y = _stencil_fallback(y, stencil, -rot_axes)
        if epilogue is not None:
            y = epilogue(y, *(jnp.asarray(a).astype(y.dtype) for a in eaux))
        return y.astype(dtype)

    y = _last_axis_pass_t(
        x, scans, plan, clamp, cdt, matmul_dtype,
        rot_axes=rot_axes, matmul_precision=matmul_precision,
        epilogue=epilogue, eaux=eaux, stencil=stencil,
    )
    return y.astype(dtype)
