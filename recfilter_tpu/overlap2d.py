"""Full 2-D overlapped execution: both dimensions' carries from one read.

The reference's deepest machinery — cross-dimension residuals
(``add_prev_dimension_residual_to_tails``, ``lib/split.cpp:1215-1633``) —
rebuilt as tensor-product identities. For a filter with scans on dims A then
B (cross-dimension scans commute, so any interleaving regroups legally):

Dim-A completion per tile (from :mod:`dimfuse`):

    Z = Btot_A ∘_A x + Σ_j Rhat_{A,j} ∘_A N_{A,j}

Dim-B local tails act on Z along B; because A- and B-operators act on
different axes they commute, so with U_l = G_{B,l} ∘_B x (computed while x
is being read for the A-tails):

    b_{B,l} = Btot_A ∘_A U_l + Σ_j Rhat_{A,j} ∘_A (G_{B,l} ∘_B N_{A,j})
              [+ Σ_{l'<l} H_{B,l,l'} ∘_B N_{B,l'}]

Everything on the right is carry-sized — the B-dimension's tails cost NO
extra pass over the image. Execution:

    pass 1 (read x):   A-tails b_A, B-moments U
    solves (tiny):     N_A per A-scan, then b_B → N_B per B-scan
    pass 2 (read x):   Z = A-completion            (write Z)
    pass 3 (read Z):   Y = B-completion            (write Y)

5 HBM touches for the whole 2-D filter vs 6 for dimension-by-dimension; the
Pallas fusion of passes 2+3 (Z lives only in VMEM) brings it to 3 — see
``kernels/final2d.py``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import dimfuse
from .spec import BorderMode, FilterSpec, Scan


def _prec(cdt):
    """True-f32 matmuls (see dimfuse._matmul_precision)."""
    return (
        jax.lax.Precision.HIGHEST
        if cdt not in (jnp.bfloat16, jnp.float16)
        else None
    )


def _axis_prep(x, axis_a: int, axis_b: int, Ta: int, Tb: int):
    """Reshape x to the canonical 7-D (p, na, sa, q, nb, sb, r) view."""
    assert axis_a < axis_b
    shape = x.shape
    wa, wb = shape[axis_a], shape[axis_b]
    na, nb = wa // Ta, wb // Tb
    p = int(np.prod(shape[:axis_a], dtype=np.int64)) if axis_a else 1
    q = int(np.prod(shape[axis_a + 1 : axis_b], dtype=np.int64))
    r = int(np.prod(shape[axis_b + 1 :], dtype=np.int64))
    return x.reshape(p, na, Ta, q, nb, Tb, r), (p, q, r, na, nb)


def _apply_a(Mstack, V, cdt):
    """Apply a dim-A matrix stack (na|1, o, s) over the 'sa' axis."""
    M = jnp.asarray(Mstack, dtype=cdt)
    if M.shape[0] == 1:
        return jnp.einsum("os,pasqbtr->paoqbtr", M[0], V,
                          preferred_element_type=cdt, precision=_prec(cdt))
    return jnp.einsum("aos,pasqbtr->paoqbtr", M, V,
                      preferred_element_type=cdt, precision=_prec(cdt))


def _apply_b(Mstack, V, cdt):
    """Apply a dim-B matrix stack (nb|1, o, t) over the 'sb' axis."""
    M = jnp.asarray(Mstack, dtype=cdt)
    if M.shape[0] == 1:
        return jnp.einsum("ot,pasqbtr->pasqbor", M[0], V,
                          preferred_element_type=cdt, precision=_prec(cdt))
    return jnp.einsum("bot,pasqbtr->pasqbor", M, V,
                      preferred_element_type=cdt, precision=_prec(cdt))


def _solve_chain_a(b, CM, cdt):
    """b: (p, na, k, q, nb, t, r) → N of the same shape (chain over na)."""
    p, na, k, q, nb, t, r = b.shape
    lines = jnp.moveaxis(b, (1, 2), (5, 6)).reshape(-1, na * k)
    N = jnp.einsum("ls,ts->lt", lines, jnp.asarray(CM, dtype=cdt),
                   precision=_prec(cdt))
    N = N.reshape(p, q, nb, t, r, na, k)
    return jnp.moveaxis(N, (5, 6), (1, 2))


def _solve_chain_b(b, CM, cdt):
    """b: (p, na, s, q, nb, k, r) → N of the same shape (chain over nb)."""
    p, na, s, q, nb, k, r = b.shape
    lines = jnp.moveaxis(b, (4, 5), (5, 6)).reshape(-1, nb * k)
    N = jnp.einsum("ls,ts->lt", lines, jnp.asarray(CM, dtype=cdt),
                   precision=_prec(cdt))
    N = N.reshape(p, na, s, q, r, nb, k)
    return jnp.moveaxis(N, (5, 6), (4, 5))


# -- 5-axis helpers for the Pallas-kernel path (p, na, sa, nb, sb) ----------


def _apply_a5(Mstack, V, cdt):
    M = jnp.asarray(Mstack, dtype=cdt)
    if M.shape[0] == 1:
        return jnp.einsum("os,pasbt->paobt", M[0], V,
                          preferred_element_type=cdt, precision=_prec(cdt))
    return jnp.einsum("aos,pasbt->paobt", M, V, preferred_element_type=cdt,
                      precision=_prec(cdt))


def _apply_b5(Mstack, V, cdt):
    M = jnp.asarray(Mstack, dtype=cdt)
    if M.shape[0] == 1:
        return jnp.einsum("ot,pasbt->pasbo", M[0], V,
                          preferred_element_type=cdt, precision=_prec(cdt))
    return jnp.einsum("bot,pasbt->pasbo", M, V, preferred_element_type=cdt,
                      precision=_prec(cdt))


def _solve_a5(b, CM, cdt):
    p, na, k, nb, t = b.shape
    lines = jnp.moveaxis(b, (1, 2), (3, 4)).reshape(-1, na * k)
    N = jnp.einsum("ls,ts->lt", lines, jnp.asarray(CM, dtype=cdt),
                   precision=_prec(cdt)).reshape(p, nb, t, na, k)
    return jnp.moveaxis(N, (3, 4), (1, 2))


def _solve_b5(b, CM, cdt):
    p, na, s, nb, k = b.shape
    lines = b.reshape(-1, nb * k)
    N = jnp.einsum("ls,ts->lt", lines, jnp.asarray(CM, dtype=cdt),
                   precision=_prec(cdt)).reshape(p, na, s, nb, k)
    return N


def _fused_2d_kernel_path(X4, nb, Tb, ma, mb, scans_a, scans_b, cdt,
                          interpret, matmul_dtype=jnp.float32):
    """3-touch pipeline: moments kernel → tiny solves → fused final kernel.

    ``X4`` is (p, na, Ta, nb·Tb) float32.
    """
    from .kernels import final2d as k2d

    p, na, Ta, W = X4.shape
    Ga_cat = np.concatenate([np.asarray(g) for g in ma.G], axis=1)
    Gb_cat = np.concatenate([np.asarray(g) for g in mb.G], axis=1)
    bA_raw, U_all = k2d.moments2d(X4, Ga_cat, Gb_cat, interpret)
    bA_raw = bA_raw.reshape(p, na, -1, nb, Tb)  # (p, na, Ka, nb, Tb)
    # U: kernel emits (p, na, nb, Ta, Kb) → helper layout (p, na, Ta, nb, Kb)
    U_all = jnp.swapaxes(U_all, 2, 3)
    Ra_cat = np.concatenate([np.asarray(r) for r in ma.Rhat], axis=2)
    Rb_cat = np.concatenate([np.asarray(r) for r in mb.Rhat], axis=2)

    # Combined-solve treatment (see the einsum path): one (n·ΣK)² matmul
    # per dimension replaces the per-scan solve/H-correction loops.
    NA_cat5 = _solve_a5(
        bA_raw, dimfuse.combined_solve_matrix(ma, na), cdt
    )  # (p, na, Ka, nb, Tb)
    bb = _apply_a5(ma.Btot, U_all, cdt) + _apply_a5(
        Ra_cat, _apply_b5(Gb_cat, NA_cat5, cdt), cdt)
    NB_cat5 = _solve_b5(
        bb, dimfuse.combined_solve_matrix(mb, nb), cdt
    )  # (p, na, Ta, nb, Kb)

    # kernel layouts: NA (p, na, Ka, nb*Tb) row form; NB (p, na, nb, Ta, Kb)
    NA_cat = NA_cat5.reshape(NA_cat5.shape[:3] + (-1,))
    NB_cat = jnp.swapaxes(NB_cat5, 2, 3)
    return k2d.final2d(
        X4, ma.Btot, Ra_cat, mb.Btot, Rb_cat, NA_cat, NB_cat, interpret,
        matmul_dtype=matmul_dtype,
    )


def fused_2d_px(x, axis_a: int, scans_a: Sequence[Scan],
                axis_b: int, scans_b: Sequence[Scan],
                border: str, nprod: int, interpret: bool,
                epilogue=None, eaux=(), stencil2d=None,
                seq_hook=None, seq_dim=None):
    """Split-bf16 (px) 3-touch 2-D executor — the shipping twin of the
    ``use_kernels`` path: ``moments2d_px`` (one read → both dims' raw
    tails) → HIGHEST carry solves → ``final2d_px`` (one read → Y, dim-A
    completion VMEM-resident). Same compensated product counts as the px
    completion kernels, at 3 image touches instead of dimfuse's 5.

    Requires the scanned dims to be the TRAILING two axes (leading axes
    fold into the kernel grid). Returns None when a static gate fails
    (tiny extents, clamp with non-dividing width, huge tile counts,
    carries past the 8-slot sublane quantum) — callers fall back to the
    rotation-chained dimfuse pipeline.

    ``seq_hook``/``seq_dim``: sequence-sharding integration (round-5,
    VERDICT r4 #3). ``seq_dim`` names the device-sharded dim ("a" = axis
    -2, "b" = axis -1); the executor derives the device's OUTGOING
    natural tails from its own raw-tails pass at carry scale
    (``dimfuse.seq_seed_maps``'s Out map — no extra image read), calls
    ``seq_hook(c_dev) -> N_dev`` (the caller runs the collective carry
    exchange there), and SEEDS its solved carries with ``K·N_dev`` so the
    completion emits the exact global result — sequence sharding at zero
    extra image streams. Zero border and no pad on the sharded dim
    (callers gate).

    ``stencil2d``: per-channel 2-D shifted-tap banks
    ``[[(dy, dx, coeff), ...], ...]`` fused into the final kernel's emit
    (border semantics per ``kernels.stencil2d.stencil2d_pass``) — the
    filter output then NEVER touches HBM (DoG's dual-radius SAT
    differencing, ``apps/DoG/diff_gauss.cpp:29-38``). The moments kernel
    emits tile-edge completion partials in its existing skinny dots (free
    MXU row slack); carries complete them into row-halo strips here.
    Returns a TUPLE of per-channel arrays. Mutually exclusive with
    ``epilogue``.
    """
    from .kernels import final2d as k2d
    from .kernels.completion import _SLOTS, _expand_stack, pad_solve_matrix

    import os

    nd = x.ndim
    if axis_a != nd - 2 or axis_b != nd - 1:
        return None
    T = k2d.LANE_TILE
    # The dim-A completion's MXU MAC count scales LINEARLY with the
    # sublane tile Ta (T MACs per output pixel), and nothing ties Ta to
    # the 128-lane quantum — only Tb is lane-tiled. MEASURED DEAD END
    # (scripts/ta_sweep.py, 4K px6): Ta=64 0.566 ms / Ta=32 1.078 vs
    # Ta=128 0.479 — M<128 dot passes cost nearly the same as full-M
    # passes (issue/pipeline-latency bound), so halving Ta doubles the
    # pass count at half utilization and skinnies the moments dots too.
    # The knob stays as the documented escape hatch; the stencil-fused
    # path always keeps Ta=Tb (its halo geometry assumes square tiles).
    Ta = int(os.environ.get("RECFILTER_PX2D_TA", "0")) or T
    if stencil2d is not None or Ta % 8 or Ta > T:
        Ta = T
    wa, wb = x.shape[axis_a], x.shape[axis_b]
    if wa < Ta or wb < T:
        return None
    clamp = border == BorderMode.CLAMP
    na, nb = -(-wa // Ta), -(-wb // T)
    pad_a, pad_b = na * Ta - wa, nb * T - wb
    if clamp and (pad_a or pad_b):
        return None
    if seq_hook is not None:
        assert epilogue is None and stencil2d is None and not clamp
        if (seq_dim == "a" and pad_a) or (seq_dim == "b" and pad_b):
            return None
    if na > dimfuse._CHAIN_MATMUL_MAX_TILES or \
            nb > dimfuse._CHAIN_MATMUL_MAX_TILES:
        return None
    ma = dimfuse.prepare_dim_pass(scans_a, Ta, na, clamp, pad_slots=pad_a)
    mb = dimfuse.prepare_dim_pass(scans_b, T, nb, clamp, pad_slots=pad_b)
    Ka, Kb = int(sum(ma.orders)), int(sum(mb.orders))
    if Ka > _SLOTS or Kb > _SLOTS:
        return None

    h8 = 0
    if stencil2d is not None:
        if epilogue is not None or pad_a or pad_b:
            return None
        dys = [dy for taps in stencil2d for dy, _, _ in taps]
        dxs = [dx for taps in stencil2d for _, dx, _ in taps]
        h8 = -(-max(max(map(abs, dys), default=1), 1) // 8) * 8
        if h8 > T or max(map(abs, dxs), default=0) > T:
            return None

    shape = x.shape
    if pad_a or pad_b:
        pads = [(0, 0)] * nd
        pads[axis_a], pads[axis_b] = (0, pad_a), (0, pad_b)
        x = jnp.pad(x, pads)
    p = int(np.prod(shape[:axis_a], dtype=np.int64)) if axis_a else 1
    W = nb * T
    X4 = x.reshape(p, na, Ta, W)

    hi = jax.lax.Precision.HIGHEST
    Ga_cat = np.concatenate([np.asarray(g) for g in ma.G], axis=1)
    Gb_cat = np.concatenate([np.asarray(g) for g in mb.G], axis=1)
    Ra_cat = np.concatenate([np.asarray(r) for r in ma.Rhat], axis=2)
    Rb_cat = np.concatenate([np.asarray(r) for r in mb.Rhat], axis=2)

    # ---- pass 1 (one read of x): dim-A raw tails + dim-B moments ---------
    # (term1_mats: the kernel emits Btot_a·U directly where its gates
    # hold — the bB assembly's biggest glue einsum and U's HBM round trip
    # disappear; used_t1 reports whether the fold engaged. solve_mats:
    # the kernel can ALSO emit the SOLVED dim-A carries — bA never
    # touches HBM; gated off for banded solves and the dim-A seq hook,
    # which consumes the raw tails.)
    CMa = dimfuse.combined_solve_matrix(ma, na)
    bands_a = dimfuse.banded_solve_blocks(CMa, na, Ka)
    naf_ok = (bands_a is None and h8 == 0
              and not (seq_hook is not None and seq_dim == "a"))
    moments = k2d.moments2d_px(
        X4, Ga_cat, Gb_cat, nprod=nprod, interpret=interpret,
        edge_mats=(ma.Btot, h8) if h8 else None, term1_mats=ma.Btot,
        solve_mats=(pad_solve_matrix(CMa, na, Ka) if naf_ok else None))
    used_t1, used_naf = moments[-2], moments[-1]
    if h8:
        bA_t, U_t, ht_m, hb_m = moments[:-2]
    else:
        bA_t, U_t = moments[:-2]

    # ---- dim-A chain solve (slot-padded transposed layout) ---------------
    if used_naf:
        NA_t = bA_t.reshape(p, na, _SLOTS, W)  # already solved in-kernel
    elif bands_a is not None:
        NA_t = jax.vmap(
            lambda b: dimfuse._banded_solve_apply(bands_a, b, Ka))(bA_t)
    else:
        # MEASURED: a compensated split dot here regressed the pipeline
        # 0.529 -> 0.579 ms (the transposed-solve chunk products don't
        # fuse; each round-trips HBM) — HIGHEST keeps the solve at 0.03.
        CMa_p = jnp.asarray(pad_solve_matrix(CMa, na, Ka), jnp.float32)
        NA_t = jnp.einsum(
            "ts,psl->ptl", CMa_p, bA_t.reshape(p, na * _SLOTS, W),
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(p, na, _SLOTS, W)

    if seq_hook is not None and seq_dim == "a":
        # Device-sharded dim A: outgoing tails from the raw-tails pass
        # (carry scale), exchange via the hook, seed the solved carries.
        OutA, KA = dimfuse.seq_seed_maps(scans_a, Ta, na)
        OutP = np.zeros((Ka, na * _SLOTS))
        for t in range(na):
            OutP[:, t * _SLOTS:t * _SLOTS + Ka] = OutA[:, t * Ka:(t + 1) * Ka]
        c_dev = jnp.einsum(
            "sz,pzw->psw", jnp.asarray(OutP, jnp.float32),
            bA_t.reshape(p, na * _SLOTS, W),
            preferred_element_type=jnp.float32, precision=hi)  # (p, Ka, W)
        N_dev = seq_hook(c_dev)
        KP = np.zeros((na, _SLOTS, Ka))
        KP[:, :Ka] = KA
        NA_t = NA_t + jnp.einsum(
            "tsu,puw->ptsw", jnp.asarray(KP, jnp.float32), N_dev,
            preferred_element_type=jnp.float32, precision=hi)

    # ---- dim-B raw tails from carry-sized data only ----------------------
    # Gb ∘_B Z = Btot_A ∘_A (Gb ∘_B x) + Ra_cat ∘_A (Gb ∘_B N_A)
    CMb = dimfuse.combined_solve_matrix(mb, nb)
    bands_b = dimfuse.banded_solve_blocks(CMb, nb, Kb)
    # Fused carry-glue kernel (round-5 A/B, default OFF — MEASURED LOSS
    # on chip: the kernel costs 0.295 ms at 4K vs the ~0.04 ms XLA glue
    # it replaces, xplane /tmp/tr4k_r5c). The GN contraction is
    # structurally hostile to an in-kernel Mosaic dot: per-b it is 32
    # independent (8×128)×(128×8) products, which as ONE dot needs either
    # a block-diagonal operand (32× dense-zero MACs at HIGHEST) or a
    # K=4096/N=8 shape at 1/16 MXU lane utilization ×6 HIGHEST passes;
    # XLA's batched-dot lowering of the same einsum runs it in 8µs. The
    # kernel stays as the measured dead end + escape hatch.
    use_bk = (used_t1 and not h8 and bands_b is None
              and not (seq_hook is not None and seq_dim == "b")
              and nb * _SLOTS * W * 4 <= 6 * 1024 * 1024
              and os.environ.get("RECFILTER_PX2D_BK", "0") == "1")
    if use_bk:
        NB_t = k2d.bsolve_pass(
            NA_t, U_t.reshape(p, na, nb * _SLOTS, Ta), Gb_cat, Ra_cat,
            pad_solve_matrix(CMb, nb, Kb), interpret=interpret)
    elif os.environ.get("RECFILTER_PX2D_GLUE", "0") == "1" and not h8:
        # Glue-lean carry chain (round-5 A/B, default OFF — measured a
        # wash on chip: 0.476 vs 0.474 ms; XLA's binarization of the
        # three-operand einsum reproduces the same fusions): Gbn
        # pre-padded to the full slot count so bB needs no later pad op,
        # and the GN/term2 contractions handed to XLA as ONE
        # three-operand einsum (no GN materialization between).
        Ran = _expand_stack(Ra_cat, na)                   # (na, Ta, Ka)
        Gbn = _expand_stack(Gb_cat, nb)                   # (nb, Kb, Tb)
        Gb8 = np.zeros((Gbn.shape[0], _SLOTS, Gbn.shape[2]), np.float32)
        Gb8[:, :Kb] = Gbn
        if used_t1:
            term1 = U_t.reshape(p, na, nb, _SLOTS, Ta)
        else:
            Ban = _expand_stack(ma.Btot, na)
            U = U_t.reshape(p, na, nb, _SLOTS, Ta)
            term1 = jnp.einsum("aos,pabks->pabko", Ban, U, precision=hi,
                               preferred_element_type=jnp.float32)
        NAr = NA_t[:, :, :Ka].reshape(p, na, Ka, nb, T)
        term2 = jnp.einsum("aoj,bkt,pajbt->pabko", Ran, Gb8, NAr,
                           precision=hi,
                           preferred_element_type=jnp.float32)
        bB = term1 + term2                                # (p,na,nb,8,Ta)
    else:
        Ran = _expand_stack(Ra_cat, na)                   # (na, Ta, Ka)
        Gbn = _expand_stack(Gb_cat, nb)                   # (nb, Kb, Tb)
        if used_t1:
            # the moments kernel already emitted term1 = Btot_a·U
            term1 = U_t.reshape(p, na, nb, _SLOTS, Ta)[:, :, :, :Kb]
        else:
            Ban = _expand_stack(ma.Btot, na)              # (na, Ta, Ta)
            U = U_t.reshape(p, na, nb, _SLOTS, Ta)[:, :, :, :Kb]
            term1 = jnp.einsum("aos,pabks->pabko", Ban, U, precision=hi,
                               preferred_element_type=jnp.float32)
        NAr = NA_t[:, :, :Ka].reshape(p, na, Ka, nb, T)
        GN = jnp.einsum("bkt,pajbt->pabkj", Gbn, NAr, precision=hi,
                        preferred_element_type=jnp.float32)
        term2 = jnp.einsum("aoj,pabkj->pabko", Ran, GN, precision=hi,
                           preferred_element_type=jnp.float32)
        bB = term1 + term2                                # (p,na,nb,Kb,Ta)
        if Kb < _SLOTS:
            bB = jnp.pad(
                bB, ((0, 0), (0, 0), (0, 0), (0, _SLOTS - Kb), (0, 0)))

    # ---- dim-B chain solve (the fused kernel above already solved) -------
    if not use_bk:
        if bands_b is not None:
            bBl = jnp.moveaxis(bB, 2, 0).reshape(nb, _SLOTS, -1)
            NBl = dimfuse._banded_solve_apply(bands_b, bBl, Kb)
            NB_t = jnp.moveaxis(
                NBl.reshape(nb, _SLOTS, p, na, Ta), 0, 2
            ).reshape(p, na, nb * _SLOTS, Ta)
        else:
            CMb_p = jnp.asarray(pad_solve_matrix(CMb, nb, Kb), jnp.float32)
            NB_t = jnp.einsum(
                "ts,qsl->qtl", CMb_p,
                bB.reshape(p * na, nb * _SLOTS, Ta),
                preferred_element_type=jnp.float32, precision=hi,
            ).reshape(p, na, nb * _SLOTS, Ta)

    if seq_hook is not None and seq_dim == "b":
        # Device-sharded dim B: the raw B-tails bB live on the
        # A-COMPLETED array, and the exchange/solve commute with the
        # A-completion (disjoint axes), so exchanging THESE tails already
        # carries the deferral — no dim-A processing of N needed.
        OutB, KB = dimfuse.seq_seed_maps(scans_b, T, nb)
        OutP = np.zeros((Kb, nb * _SLOTS))
        for t in range(nb):
            OutP[:, t * _SLOTS:t * _SLOTS + Kb] = OutB[:, t * Kb:(t + 1) * Kb]
        c_dev = jnp.einsum(
            "sz,pazl->pasl", jnp.asarray(OutP, jnp.float32),
            bB.reshape(p, na, nb * _SLOTS, Ta),
            preferred_element_type=jnp.float32, precision=hi)
        N_dev = seq_hook(c_dev)  # (p, na, Kb, Ta)
        KPb = np.zeros((nb, _SLOTS, Kb))
        KPb[:, :Kb] = KB
        dNB = jnp.einsum(
            "tsu,paul->patsl", jnp.asarray(KPb, jnp.float32), N_dev,
            preferred_element_type=jnp.float32, precision=hi)
        NB_t = NB_t + dNB.reshape(p, na, nb * _SLOTS, Ta)

    # ---- row-halo strips for a fused 2-D stencil consumer ----------------
    # The stencil's row taps read the completed output of the NEIGHBOR
    # a-tiles: finish the moments kernel's tile-edge completion partials
    # (ht/hb = Btot_a edge rows · x) with both dims' carries — h8/T ≈ 12%
    # of one completion's work, in einsums (carry-sized operands).
    if h8:
        # (Ran already built above for the dim-B raw-tails coupling)
        Bbn = _expand_stack(mb.Btot, nb)                  # (nb, Tb, Tb)
        Rbn = _expand_stack(Rb_cat, nb)                   # (nb, Tb, Kb)
        NAk = NA_t[:, :, :Ka]
        NBr = NB_t.reshape(p, na, nb, _SLOTS, T)[:, :, :, :Kb]

        def _bcomp(Z, NBrows):
            # dim-B completion of an (p, na, h8, W) strip
            Zr = Z.reshape(p, na, h8, nb, T)
            y = (jnp.einsum("bot,pahbt->pahbo", Bbn, Zr, precision=hi,
                            preferred_element_type=jnp.float32)
                 + jnp.einsum("bok,pabkh->pahbo", Rbn, NBrows, precision=hi,
                              preferred_element_type=jnp.float32))
            return y.reshape(p, na, h8, W)

        zpad = jnp.zeros((p, 1, h8, W), jnp.float32)
        Ztop = ht_m + jnp.einsum("ahk,pakw->pahw", Ran[:, :h8], NAk,
                                 precision=hi,
                                 preferred_element_type=jnp.float32)
        Zbot = hb_m + jnp.einsum("ahk,pakw->pahw", Ran[:, T - h8:], NAk,
                                 precision=hi,
                                 preferred_element_type=jnp.float32)
        nbpad = jnp.zeros((p, 1, nb, Kb, h8), jnp.float32)
        # block a's top halo = tile a-1's bottom rows; bottom = a+1's top
        halo_top = _bcomp(
            jnp.concatenate([zpad, Zbot[:, :na - 1]], axis=1),
            jnp.concatenate([nbpad, NBr[:, :na - 1, :, :, T - h8:]], axis=1))
        halo_bot = _bcomp(
            jnp.concatenate([Ztop[:, 1:], zpad], axis=1),
            jnp.concatenate([NBr[:, 1:, :, :, :h8], nbpad], axis=1))
        Ys = k2d.final2d_px(
            X4, ma.Btot, Ra_cat, mb.Btot, Rb_cat, NA_t, NB_t,
            nprod=nprod, interpret=interpret,
            stencil2d={"taps_c": stencil2d, "h8": h8},
            halo_top=halo_top, halo_bot=halo_bot)
        return tuple(Y4.reshape(shape) for Y4 in Ys)

    # ---- fused passes 2+3: read x once, emit Y ---------------------------
    k_eaux = ()
    if epilogue is not None:
        k_eaux = []
        for a_ in eaux:
            a_ = jnp.asarray(a_, jnp.float32)
            if pad_a or pad_b:
                pads = [(0, 0)] * a_.ndim
                pads[axis_a], pads[axis_b] = (0, pad_a), (0, pad_b)
                a_ = jnp.pad(a_, pads)
            k_eaux.append(a_.reshape(p, na, Ta, W))
    Y4 = k2d.final2d_px(X4, ma.Btot, Ra_cat, mb.Btot, Rb_cat, NA_t, NB_t,
                        nprod=nprod, interpret=interpret,
                        epilogue=epilogue, eaux=k_eaux)
    y = Y4.reshape(x.shape)
    if pad_a:
        y = jax.lax.slice_in_dim(y, 0, wa, axis=axis_a)
    if pad_b:
        y = jax.lax.slice_in_dim(y, 0, wb, axis=axis_b)
    return y


def fused_rows_px(x, axis: int, scans: Sequence[Scan], border: str,
                  nprod: int, interpret: bool):
    """Single-dimension px pass with the scanned axis on SUBLANES: tails
    kernel → chain solve → completion kernel, everything after the scan
    axis flattened into lanes. The fast path for a scan that is NOT the
    last array axis (the einsum form there lowers to convolutions);
    volumes run their leading scan axis through it before the 3-touch
    2-D executor takes the trailing two. Returns None when a static gate
    fails — callers fall back to the rotation-chained pipeline.
    """
    from .kernels import final2d as k2d
    from .kernels.completion import _SLOTS, pad_solve_matrix

    nd = x.ndim
    if not 0 <= axis < nd - 1:
        return None
    T = k2d.LANE_TILE
    L = x.shape[axis]
    W = int(np.prod(x.shape[axis + 1:], dtype=np.int64))
    if L < T or L % T or W % T:
        return None
    n = L // T
    if n > dimfuse._CHAIN_MATMUL_MAX_TILES:
        return None
    clamp = border == BorderMode.CLAMP
    mats = dimfuse.prepare_dim_pass(scans, T, n, clamp, pad_slots=0)
    K = int(sum(mats.orders))
    if K > _SLOTS:
        return None

    shape = x.shape
    p = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    X4 = x.reshape(p, n, T, W)
    G_cat = np.concatenate([np.asarray(g) for g in mats.G], axis=1)
    R_cat = np.concatenate([np.asarray(r) for r in mats.Rhat], axis=2)

    bA_t = k2d.rows_tails_px(X4, G_cat, nprod=nprod, interpret=interpret)
    CM = dimfuse.combined_solve_matrix(mats, n)
    bands = dimfuse.banded_solve_blocks(CM, n, K)
    if bands is not None:
        NA_t = jax.vmap(
            lambda b: dimfuse._banded_solve_apply(bands, b, K))(bA_t)
    else:
        CM_p = jnp.asarray(pad_solve_matrix(CM, n, K), jnp.float32)
        NA_t = jnp.einsum(
            "ts,psl->ptl", CM_p, bA_t.reshape(p, n * _SLOTS, W),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(p, n, _SLOTS, W)
    Y4 = k2d.rows_final_px(X4, mats.Btot, R_cat, NA_t, nprod=nprod,
                           interpret=interpret)
    return Y4.reshape(shape)


def fused_2d_pass(
    x,
    axis_a: int,
    scans_a: Sequence[Scan],
    Ta: int,
    axis_b: int,
    scans_b: Sequence[Scan],
    Tb: int,
    border: str = BorderMode.ZERO,
    compute_dtype=jnp.float32,
    use_kernels: bool = False,
    interpret: bool = False,
    matmul_dtype=jnp.float32,
    matmul_precision: str = "highest",
):
    """Apply dim-A scans then dim-B scans with cross-dimension carry fusion.

    Falls back to two :func:`dimfuse.fused_dim_pass` calls when a dimension
    needs the scan-core path (tiny/prime clamp widths) or huge tile counts.

    With ``use_kernels`` and a px ``matmul_precision``, the pass runs the
    split-bf16 3-touch pipeline (:func:`fused_2d_px` — the shipping 2-D
    default); HIGHEST keeps the original f32-dot kernels.
    """
    clamp = border == BorderMode.CLAMP
    cdt = compute_dtype
    if axis_a > axis_b:
        # normalize order: caller guarantees scans_a precede scans_b in the
        # filter, which is all that matters (cross-dim scans commute)
        return fused_2d_pass(
            jnp.swapaxes(x, axis_a, axis_b), axis_b, scans_a, Ta,
            axis_a, scans_b, Tb, border, cdt,
            use_kernels=use_kernels, interpret=interpret,
            matmul_dtype=matmul_dtype, matmul_precision=matmul_precision,
        ).swapaxes(axis_a, axis_b)
    if use_kernels and cdt == jnp.float32:
        nprod = {"px3": 3, "px4": 4, "px6": 6}.get(matmul_precision, 0)
        if nprod and axis_b == x.ndim - 1 and axis_a == x.ndim - 2:
            y = fused_2d_px(x, axis_a, scans_a, axis_b, scans_b, border,
                            nprod, interpret)
            if y is not None:
                return y

    wa, wb = x.shape[axis_a], x.shape[axis_b]
    ka = max(s.order for s in scans_a)
    kb = max(s.order for s in scans_b)
    Ta = int(min(max(Ta, ka), wa))
    Tb = int(min(max(Tb, kb), wb))
    if use_kernels and not interpret:
        # Mosaic: static lane slices must be 128-aligned → the minor-axis
        # tile is pinned to the lane width on real hardware.
        from .kernels.final2d import LANE_TILE

        Tb = int(min(LANE_TILE, -(-wb // LANE_TILE) * LANE_TILE))
    na, nb = -(-wa // Ta), -(-wb // Tb)
    pad_a, pad_b = na * Ta - wa, nb * Tb - wb

    def fallback():
        y = dimfuse.fused_dim_pass(x, axis_a, scans_a, Ta, border, cdt)
        return dimfuse.fused_dim_pass(y, axis_b, scans_b, Tb, border, cdt)

    if clamp and (pad_a or pad_b):
        # exact tiling needed for clamp; dimfuse has the divisor fallback
        return fallback()
    if na > dimfuse._CHAIN_MATMUL_MAX_TILES or nb > dimfuse._CHAIN_MATMUL_MAX_TILES:
        return fallback()
    if Ta < ka or Tb < kb:
        return fallback()

    ma = dimfuse.prepare_dim_pass(scans_a, Ta, na, clamp, pad_slots=pad_a)
    mb = dimfuse.prepare_dim_pass(scans_b, Tb, nb, clamp, pad_slots=pad_b)

    if pad_a or pad_b:
        pads = [(0, 0)] * x.ndim
        pads[axis_a] = (0, pad_a)
        pads[axis_b] = (0, pad_b)
        x = jnp.pad(x, pads)

    # Kernel path: contiguous trailing image axes (q == r == 1).
    if (
        use_kernels
        and axis_b == x.ndim - 1
        and axis_b == axis_a + 1
        and cdt == jnp.float32
    ):
        shape = x.shape
        p0 = int(np.prod(shape[:axis_a], dtype=np.int64)) if axis_a else 1
        X4 = x.reshape(p0, na, Ta, nb * Tb).astype(cdt)
        Y4 = _fused_2d_kernel_path(
            X4, nb, Tb, ma, mb, scans_a, scans_b, cdt, interpret,
            matmul_dtype=matmul_dtype,
        )
        y = Y4.reshape(shape)
        if pad_a:
            y = jax.lax.slice_in_dim(y, 0, wa, axis=axis_a)
        if pad_b:
            y = jax.lax.slice_in_dim(y, 0, wb, axis=axis_b)
        return y

    X, dims = _axis_prep(x.astype(cdt), axis_a, axis_b, Ta, Tb)
    p, q, r, _, _ = dims

    # Combined-solve op-count treatment (same as dimfuse): every scan's
    # chain solve and all cross-scan H-couplings of a dimension fold into
    # ONE (n·ΣK)² matmul per dimension; the stacked G/Rhat forms turn the
    # per-scan einsum loops into one einsum each. Per-op dispatch overhead
    # dominates carry-sized work on this stack (ROADMAP / VERDICT r1).
    Ka = int(sum(ma.orders))
    Kb = int(sum(mb.orders))
    Ga_cat = dimfuse.pad_rows8(
        np.concatenate([np.asarray(g) for g in ma.G], axis=1))
    Gb_cat = dimfuse.pad_rows8(
        np.concatenate([np.asarray(g) for g in mb.G], axis=1))
    Ra_cat = np.concatenate([np.asarray(m) for m in ma.Rhat], axis=2)
    Rb_cat = np.concatenate([np.asarray(m) for m in mb.Rhat], axis=2)
    CMa = dimfuse.combined_solve_matrix(ma, na)
    CMb = dimfuse.combined_solve_matrix(mb, nb)

    # ---- pass 1 (one read of x): dim-A raw tails + dim-B moments ---------
    bA = _apply_a(Ga_cat, X, cdt)[:, :, :Ka]
    U = _apply_b(Gb_cat, X, cdt)[..., :Kb, :]
    NA = _solve_chain_a(bA, CMa, cdt)

    # ---- dim-B raw tails from carry-sized data only ----------------------
    # Gb∘Z = Btot_A∘(Gb∘X) + Ra_cat∘(Gb∘NA_cat)   (A/B operators commute)
    bb = _apply_a(ma.Btot, U, cdt) + _apply_a(
        Ra_cat, _apply_b(Gb_cat[:, :Kb] if Gb_cat.shape[1] != Kb else Gb_cat,
                         NA, cdt), cdt)
    NB = _solve_chain_b(bb, CMb, cdt)

    # ---- pass 2: dim-A completion (Z); pass 3: dim-B completion ----------
    Z = _apply_a(ma.Btot, X, cdt) + _apply_a(Ra_cat, NA, cdt)
    Y = _apply_b(mb.Btot, Z, cdt) + _apply_b(Rb_cat, NB, cdt)

    shape = x.shape
    y = Y.reshape(shape)
    if pad_a:
        y = jax.lax.slice_in_dim(y, 0, wa, axis=axis_a)
    if pad_b:
        y = jax.lax.slice_in_dim(y, 0, wb, axis=axis_b)
    return y


def apply_filter_overlap(spec: FilterSpec, x, tile_default: int = 32,
                         use_kernels: bool = False, interpret: bool = False,
                         matmul_dtype=jnp.float32,
                         matmul_precision: str = "highest"):
    """Whole-filter executor with 2-D cross-dimension fusion where possible.

    Scanned dims are consumed pairwise (in first-appearance order) through
    :func:`fused_2d_pass`; an odd remaining dim runs through dimfuse. With
    ``use_kernels`` the big passes run as Pallas kernels (3 HBM touches per
    2-D pair).
    """
    from . import scan_core

    dtype = jnp.dtype(spec.dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        return scan_core.apply_filter(spec, x)
    cdt = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype
    x = x.astype(cdt)
    tiles = spec.tile_widths or (0,) * spec.ndim
    groups = list(spec.scans_by_axis().items())
    if len(groups) >= 3 and not use_kernels:
        # n-D overlap beyond pairs: every dimension's carries from one read
        # (2D+1 image touches vs 3D dimension-by-dimension).
        y = fused_nd_pass(
            x,
            [(ax, [spec.scans[j] for j in ids], tiles[ax] or tile_default)
             for ax, ids in groups],
            spec.border, cdt,
        )
        if y is not None:
            return y.astype(dtype)
    i = 0
    while i < len(groups):
        if i + 1 < len(groups):
            (ax_a, ids_a), (ax_b, ids_b) = groups[i], groups[i + 1]
            x = fused_2d_pass(
                x,
                ax_a, [spec.scans[j] for j in ids_a],
                tiles[ax_a] or tile_default,
                ax_b, [spec.scans[j] for j in ids_b],
                tiles[ax_b] or tile_default,
                spec.border, cdt,
                use_kernels=use_kernels, interpret=interpret,
                matmul_dtype=matmul_dtype, matmul_precision=matmul_precision,
            )
            i += 2
        else:
            ax, ids = groups[i]
            x = dimfuse.fused_dim_pass(
                x, ax, [spec.scans[j] for j in ids],
                tiles[ax] or tile_default, spec.border, cdt,
            )
            i += 1
    return x.astype(dtype)


def fused_nd_pass(
    x,
    groups,
    border: str = BorderMode.ZERO,
    compute_dtype=jnp.float32,
):
    """All D scanned dimensions' carries from ONE read of x (D ≥ 2).

    The n-D generalization of :func:`fused_2d_pass` — the reference's
    cross-dimension machinery (``add_prev_dimension_residual_to_tails``,
    ``lib/split.cpp:1215-1633``) extended past pairs: with Y_e the image
    after dims 0..e's completions, dim d's raw tails satisfy (operators on
    different axes commute)

        G_d ∘ Y_{d-1} = V_{d-1},   V_{-1} = G_d ∘ x  (a pass-1 moment)
        V_e = Btot_e ∘ V_{e-1} + Rcat_e ∘ (G_d ∘ N_e)

    — every term after pass 1 is carry-sized. Execution: one read of x for
    dim-0 tails + all moments, D chained carry derivations/solves (tiny),
    then D completion einsums over the image (2 HBM touches each): 2D+1
    image touches for the whole filter vs 3D dimension-by-dimension.

    ``groups``: ordered [(axis, scans, tile_width), ...]. Returns None when
    any dimension needs a fallback (clamp with non-dividing width, order
    exceeding tiles, audio-scale tile counts) — callers then run the
    pairwise/dimfuse route.
    """
    clamp = border == BorderMode.CLAMP
    cdt = compute_dtype
    D = len(groups)
    infos = []
    for axis, scans, T in groups:
        w = x.shape[axis]
        k = max(s.order for s in scans)
        T = int(min(max(T, k), w))
        n = -(-w // T)
        pad = n * T - w
        if (clamp and pad) or T < k or n > dimfuse._CHAIN_MATMUL_MAX_TILES:
            return None
        infos.append(dict(axis=axis, scans=scans, T=T, n=n, pad=pad, w=w))

    pads = [(0, 0)] * x.ndim
    for inf in infos:
        pads[inf["axis"]] = (0, inf["pad"])
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)

    for inf in infos:
        m = dimfuse.prepare_dim_pass(
            inf["scans"], inf["T"], inf["n"], clamp, pad_slots=inf["pad"]
        )
        inf["K"] = int(sum(m.orders))
        inf["Gp"] = dimfuse.pad_rows8(
            np.concatenate([np.asarray(g) for g in m.G], axis=1))
        inf["G"] = inf["Gp"][:, : inf["K"]]
        inf["R"] = np.concatenate([np.asarray(r) for r in m.Rhat], axis=2)
        inf["B"] = m.Btot
        inf["CM"] = dimfuse.combined_solve_matrix(m, inf["n"])

    # Canonical tiled view + einsum letter plumbing ("z" reserved for the
    # output axis of a dim-apply).
    letters = iter("abcdefghijklmnop")
    tiled = {inf["axis"]: i for i, inf in enumerate(infos)}
    view, axl = [], []
    for ax in range(x.ndim):
        if ax in tiled:
            inf = infos[tiled[ax]]
            nl, sl = next(letters), next(letters)
            inf["nl"], inf["sl"] = nl, sl
            view += [inf["n"], inf["T"]]
            axl += [nl, sl]
        else:
            view.append(x.shape[ax])
            axl.append(next(letters))
    in_str = "".join(axl)
    X = x.reshape(view).astype(cdt)

    def apply_d(Mstack, V, d):
        inf = infos[d]
        out = in_str.replace(inf["sl"], "z")
        M = jnp.asarray(np.asarray(Mstack), dtype=cdt)
        if M.shape[0] == 1:
            eq = f"z{inf['sl']},{in_str}->{out}"
            return jnp.einsum(eq, M[0], V, preferred_element_type=cdt,
                              precision=_prec(cdt))
        eq = f"{inf['nl']}z{inf['sl']},{in_str}->{out}"
        return jnp.einsum(eq, M, V, preferred_element_type=cdt,
                          precision=_prec(cdt))

    def slice_k(V, d):
        inf = infos[d]
        ax = in_str.index(inf["sl"])
        return jax.lax.slice_in_dim(V, 0, inf["K"], axis=ax)

    def solve_d(V, d):
        inf = infos[d]
        i_n, i_s = in_str.index(inf["nl"]), in_str.index(inf["sl"])
        rest = [i for i in range(V.ndim) if i not in (i_n, i_s)]
        perm = rest + [i_n, i_s]
        bt = jnp.transpose(V, perm)
        shp = bt.shape
        N = jnp.einsum(
            "ls,ts->lt", bt.reshape(-1, inf["n"] * inf["K"]),
            jnp.asarray(inf["CM"], dtype=cdt),
            preferred_element_type=cdt, precision=_prec(cdt),
        ).reshape(shp)
        inv = np.argsort(perm)
        return jnp.transpose(N, inv)

    # ---- pass 1 (one read of x): dim-0 raw tails + every moment ----------
    N = [solve_d(slice_k(apply_d(infos[0]["Gp"], X, 0), 0), 0)]
    for d in range(1, D):
        V = slice_k(apply_d(infos[d]["Gp"], X, d), d)
        for e in range(d):
            GN = apply_d(infos[d]["G"], N[e], d)     # carry² sized
            V = apply_d(infos[e]["B"], V, e) + apply_d(infos[e]["R"], GN, e)
        N.append(solve_d(V, d))

    # ---- D completion einsums over the image ------------------------------
    Y = X
    for e in range(D):
        Y = apply_d(infos[e]["B"], Y, e) + apply_d(infos[e]["R"], N[e], e)

    y = Y.reshape(x.shape)
    for inf in infos:
        if inf["pad"]:
            y = jax.lax.slice_in_dim(y, 0, inf["w"], axis=inf["axis"])
    return y
