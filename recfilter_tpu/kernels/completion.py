"""Split-bf16 completion-pass kernel: accurate f32 at near-default-dot cost.

The VMEM-resident twin of dimfuse's completion step

    Y = Btot·X  +  Rcat·Ncat        (per tile, optionally emitted rotated)

for the compensated precision modes. XLA's ``Precision.HIGHEST`` einsums in
the transpose-emitting composite forms materialize operand-conversion
copies (~0.3 ms/iter at 4K — xplane evidence in the round-1 notes), and the
hand-split ``f32x3`` einsum mode materializes the bf16 operand chunks in
HBM. Here both problems disappear: each x block is split into bf16 chunks
IN VMEM, the compensated cross products run as independent MXU dots with
f32 accumulation, the carry injection (small contraction, error-dominant —
kept at true-f32 HIGHEST) is added in-register, and the block is emitted
directly in the rotated layout. HBM traffic: read X + read the (tiny)
carries + write Y — the same two image touches as the throughput mode.

Accuracy (max rel err vs the f64 oracle; single pass microbench / full
gaussian3 4K pipeline):
  * 3 products (``px3``):  ~6e-6 / ~5e-5  — dropped terms at 2^-16
  * 4 products (``px4``):  ~2e-6 / ~5e-5  — 2-chunk representation (2^-17)
  * 6 products (``px6``):  3-chunk operands — true-f32 grade (~2e-6
    pipeline), at 6 MXU products
All sit within the float32-SNR bar the oracle suite enforces (the
reference's CheckResult, ``lib/recfilter.h:793-855``).

Mosaic layout notes: T must be the 128-lane tile; the carries ride a
transposed (n·8, q) array — 8 sublane slots per tile (order padded up) —
because an (Lb, S<128) lane block is not expressible; the per-tile carry
dot contracts over those 8 sublanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024
_SLOTS = 8  # sublane quantum: carries ride 8-row slots
_MAX_S = 56  # max ΣK: ⌈S/8⌉ sublane slots per tile (round-5 — the
# reference's audio sweep runs single scans to order 29 and overlapped
# biquads to order 60's neighborhood; multi-slot carries keep those on
# the kernel path instead of the chunk-materializing split einsums)


def slots_for(S: int) -> int:
    """Slot-padded carry rows for ΣK = S (multiple of the sublane quantum)."""
    return -(-int(S) // _SLOTS) * _SLOTS
# Chained-tails extraction strategy: False = explicit acc re-split + chunk
# concats (the px product pairs); True = one f32 HIGHEST dot per sub-tile
# (Mosaic's own compensated lowering). Measured on chip (gaussian3 4K px6,
# /tmp/tails_exp pattern): split 0.538 ms vs f32-dot 0.547 — the explicit
# split stays the default; the toggle remains for future Mosaic versions.
_TAILS_F32_DOT = False


def _split_const_np(M, nchunks: int):
    """Trace-time bf16 chunk split of a matrix stack (float64-exact,
    pure numpy — reinspectable under jit tracing); 3 chunks carry the
    full f32 mantissa."""
    import ml_dtypes

    rem = np.asarray(M, np.float64)
    out = []
    for _ in range(nchunks):
        c = rem.astype(np.float32).astype(ml_dtypes.bfloat16)
        out.append(c)
        rem = rem - c.astype(np.float64)
    return out


def _split_const(M, nchunks: int):
    """Alias of :func:`_split_const_np` — NUMPY chunks on purpose. A jnp
    constant bound as a pallas_call operand inside a shard_map trace leaks
    a tracer into the linearized jaxpr ("No constant handler for
    DynamicJaxprTracer" under jax.grad of the sharded executor); numpy
    operands embed as fresh literals wherever they are staged."""
    return list(_split_const_np(M, nchunks))


def _split_vmem(x, nchunks: int):
    """In-register bf16 chunk split of an f32 array (VMEM, no HBM cost)."""
    out = []
    rem = x
    for _ in range(nchunks - 1):
        c = rem.astype(jnp.bfloat16)
        out.append(c)
        rem = rem - c.astype(jnp.float32)
    out.append(rem.astype(jnp.bfloat16))
    return out


def _stack_split(x, nc: int, axis: int = 0):
    """f32 → bf16 chunk scratch stacked highest chunk index first along
    ``axis`` (the contraction axis), so M-stacked level constants
    (:func:`_level_groups` layout) index it contiguously. One aligned-block
    concat instead of per-pair operand concats (no chunk duplication)."""
    if nc == 1:
        return x.astype(jnp.bfloat16)
    chunks = []
    rem = x
    for _ in range(nc - 1):
        c = rem.astype(jnp.bfloat16)
        chunks.append(c)
        rem = rem - c.astype(jnp.float32)
    chunks.append(rem.astype(jnp.bfloat16))
    return jnp.concatenate(chunks[::-1], axis=axis)


def _level_groups(nprod: int):
    """:func:`_prods` pairs grouped by level i+j, smallest-magnitude level
    first (the f32 accumulation order every kernel uses)."""
    pairs = _prods(nprod)
    return [[(i, j) for i, j in pairs if i + j == lvl]
            for lvl in sorted({i + j for i, j in pairs}, reverse=True)]


def _mstack_level_const(chunks, lgs, nc: int, xp):
    """M-stacked level-constant layout — THE single builder shared by
    :func:`tails_pass` (numpy), the chained-tails extraction inside
    :func:`completion_pass` (numpy), :func:`tails_pass_traced` (in-graph),
    and final2d's ``_cat_split_mstack``: level block g holds chunk ``i``
    at lane block ``nc-1-j`` for each (i, j) pair of the level — matching
    ``_stack_split``'s reversed (highest-chunk-first) scratch order, so
    ONE dot against the chunk-stacked scratch streams every level's
    K-tiles once. Within a level all j are distinct, so placement never
    sums. ``chunks``: per-chunk constant arrays (..., rows, T); ``xp`` is
    numpy or jax.numpy. Returns (..., nlev·rows, nc·T)."""
    zero = xp.zeros_like(chunks[0])
    blocks = []
    for lvl_pairs in lgs:
        cols = [zero] * nc
        for i, j in lvl_pairs:
            cols[nc - 1 - j] = chunks[i]
        blocks.append(xp.concatenate(cols, axis=-1))
    return xp.concatenate(blocks, axis=-2)


def _prods(nprod: int):
    """(i, j) chunk-product index pairs, smallest-magnitude first.
    ``nprod=1`` is the bf16 storage mode: one plain product, operands
    already rounded by the storage dtype."""
    if nprod >= 6:
        return [(0, 2), (1, 1), (2, 0), (0, 1), (1, 0), (0, 0)]
    if nprod >= 4:
        return [(1, 1), (0, 1), (1, 0), (0, 0)]
    if nprod >= 3:
        return [(0, 1), (1, 0), (0, 0)]
    return [(0, 0)]


def _nchunks(nprod: int) -> int:
    return 3 if nprod >= 6 else (2 if nprod >= 3 else 1)


def _stencil_rows(acc, prev, nxt, t_id, *, taps, hhi8, hlo8, n, T,
                  start: str, end: str):
    """Shifted-tap combine along the scan axis (block rows), in VMEM.

    ``acc`` (T, Lb) is the completed tile; ``prev``/``nxt`` are the
    neighbor tiles' halo strips (top-/bottom-aligned inside their 8-row
    quanta). Global borders: "zero" reads 0 past the array (the zero
    halo strips at tiles 0/n-1 provide it); "clamp" replicates the
    global first/last row — the reference's ``compute_at`` stencil
    consumers read the producer at shifted, edge-clamped coordinates
    (``apps/DoG/diff_gauss.cpp:93-101``)."""
    Lb = acc.shape[1]
    parts = [acc]
    if hhi8:
        parts.insert(0, prev)
    if hlo8:
        parts.append(nxt)
    zext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else acc
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, Lb), 0)
    out = None
    for d, c in taps:
        term = jax.lax.slice(zext, (hhi8 + d, 0), (hhi8 + d + T, Lb)) \
            if (hhi8 + d or hhi8 + d + T != zext.shape[0]) else zext
        if d > 0 and end == "clamp":
            lastrow = jnp.broadcast_to(acc[T - 1:T], (T, Lb))
            term = jnp.where((t_id == n - 1) & (rows >= T - d), lastrow,
                             term)
        if d < 0 and start == "clamp":
            firstrow = jnp.broadcast_to(acc[0:1], (T, Lb))
            term = jnp.where((t_id == 0) & (rows < -d), firstrow, term)
        term = term * c
        out = term if out is None else out + term
    return out


def _completion_kernel(*refs, nprod: int, rot: bool, kt: int = 0,
                       t2: int = 0, ka: int = 0, naux: int = 0,
                       epilogue=None, stencil=None):
    """One (Lb, T) x-block + (8, Lb) carry block -> (T, Lb) (rot) or
    (Lb, T) out-block.

    Stacked-contraction formulation: the ``nprod`` compensated chunk
    products run as ONE MXU dot over a ``nprod*T`` contraction axis —
    B chunks pre-concatenated at trace time (``B_ref``: (T, nprod*T)),
    x chunks concatenated in VMEM — measured ~10% faster than ``nprod``
    separate dots (better MXU pipelining, one accumulator pass;
    ``scripts/px6_stack_exp.py``). The carry injection is a second stacked
    dot over ``nprod*8`` (a HIGHEST skinny dot costs ~0.08 ms/pass in
    Mosaic's multi-pass lowering — the splits are cheaper).

    With ``kt`` > 0 (rot only) the kernel ALSO extracts the next
    dimension's local tails from the block it is about to emit — the
    next pass then starts at its solve with one whole HBM read of the
    image saved (the fused analog of the reference's shared-memory
    residency, ``lib/schedule.cpp:219-293``). Two lane regimes:

    * images (``ka == 0``): the block's lanes are a contiguous slice of
      the next scanned axis — ``kt`` sub-tiles of width ``t2``, each
      contracted against its own tile's split G rows (G block indexed
      by the lane-grid coordinate);
    * volumes (``ka`` > 0): the lanes span ``ka`` whole next-axis
      extents (other row axes vary) — ``ka × kt`` sub-tiles, the G
      block (all ``kt`` tiles) constant across the grid."""
    if kt:
        B_ref, R_ref, N_ref, x_ref, G2_ref = refs[:5]
        aux_refs = refs[5:5 + naux]
        o_ref, o2_ref = refs[5 + naux:]
    else:
        B_ref, R_ref, N_ref, x_ref = refs[:4]
        i = 4
        prev_ref = nxt_ref = None
        if stencil is not None and stencil["hhi8"]:
            prev_ref = refs[i]
            i += 1
        if stencil is not None and stencil["hlo8"]:
            nxt_ref = refs[i]
            i += 1
        aux_refs = refs[i:i + naux]
        o_ref = refs[i + naux]
    nc = _nchunks(nprod)
    pairs = _prods(nprod)
    xs = _split_vmem(x_ref[:], nc)
    ns = _split_vmem(N_ref[0], nc)  # (8, Lb) carries
    xcat = jnp.concatenate([xs[j] for _, j in pairs], axis=1)  # (Lb, np*T)
    ncat = jnp.concatenate([ns[j] for _, j in pairs], axis=0)  # (np*8, Lb)
    if rot:
        dn = (((1,), (1,)), ((), ()))  # (T,np*T)x(Lb,np*T) -> (T,Lb)
        dc = (((1,), (0,)), ((), ()))  # (T,np*8)x(np*8,Lb) -> (T,Lb)
        acc = jax.lax.dot_general(B_ref[0], xcat, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(R_ref[0], ncat, dc,
                                        preferred_element_type=jnp.float32)
    else:
        dn = (((1,), (1,)), ((), ()))  # (Lb,np*T)x(T,np*T) -> (Lb,T)
        dc = (((0,), (1,)), ((), ()))  # (np*8,Lb)x(T,np*8) -> (Lb,T)
        acc = jax.lax.dot_general(xcat, B_ref[0], dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(ncat, R_ref[0], dc,
                                        preferred_element_type=jnp.float32)
    # Shifted-tap stencil consumer fused into the emit (rot only): combine
    # neighbor-halo strips with the completed tile in VMEM — the TPU analog
    # of the reference's ``compute_at`` fusion of a stencil consumer
    # (``lib/recfilter.cpp:507-573``). Applies BEFORE any pointwise
    # epilogue (the stencil reads filter output, the epilogue reads the
    # consumer's).
    if stencil is not None:
        acc = _stencil_rows(
            acc, None if prev_ref is None else prev_ref[:],
            None if nxt_ref is None else nxt_ref[:], pl.program_id(0),
            taps=stencil["taps"], hhi8=stencil["hhi8"],
            hlo8=stencil["hlo8"], n=stencil["n"], T=stencil["T"],
            start=stencil["start"], end=stencil["end"])
    # Fused pointwise epilogue: the combine rides the out-block in VMEM —
    # the px-mode analog of the XLA dot-output fusion the einsum path gets
    # for free (reference: ``apps/usm/unsharp_mask_optimized.cpp:61-71``).
    # Next-dim tails (kt) are extracted from the PRE-epilogue filter output,
    # so the two never coexist (callers assert this).
    out = acc if epilogue is None else epilogue(acc, *(a[:] for a in aux_refs))
    o_ref[:] = out.astype(o_ref.dtype)
    if kt and _TAILS_F32_DOT:
        # Direct f32 HIGHEST dots on the accumulator: Mosaic's own
        # compensated lowering replaces the explicit acc re-split + chunk
        # concats (G2_ref is then the unchunked f32 rows).
        dgf = (((1,), (1,)), ((), ()))  # (8,t2)x(T,t2) -> (8,T)
        for a in range(max(ka, 1)):
            for c in range(kt):
                off = a * kt * t2 + c * t2
                g32 = G2_ref[c * _SLOTS:(c + 1) * _SLOTS, :]
                t = jax.lax.dot_general(
                    g32, acc[:, off:off + t2], dgf,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                if ka:
                    o2_ref[a, c * _SLOTS:(c + 1) * _SLOTS, :] = t
                else:
                    o2_ref[c * _SLOTS:(c + 1) * _SLOTS, :] = t
    elif kt:
        # M-stacked level dots (see _tails_kernel): per sub-tile, ONE dot
        # of the (nlev·8)-row level constant against the chunk-stacked acc
        # slice — nc K-tiles instead of nprod, no chunk duplication.
        nlev = len(_level_groups(nprod))
        rg = nlev * _SLOTS
        dg = (((1,), (1,)), ((), ()))  # (nlev*8,nc*t2)x(T,nc*t2) -> (.,T)

        def _sub_tails(g, sub):
            t = jax.lax.dot_general(g, _stack_split(sub, nc, axis=1), dg,
                                    preferred_element_type=jnp.float32)
            t8 = t[:_SLOTS]
            for gi in range(1, nlev):  # smallest-magnitude level first
                t8 = t8 + t[gi * _SLOTS:(gi + 1) * _SLOTS]
            return t8

        if ka:
            # volumes: ka whole next-axis extents of kt tiles each. The
            # a-axis leads the out block (block extent ka has no Mosaic
            # alignment constraint there; trailing (n2·8, T) dims are
            # sublane/lane aligned).
            for a in range(ka):
                for c in range(kt):
                    off = a * kt * t2 + c * t2
                    o2_ref[a, c * _SLOTS:(c + 1) * _SLOTS, :] = _sub_tails(
                        G2_ref[c * rg:(c + 1) * rg, :],
                        acc[:, off:off + t2])
        else:
            for c in range(kt):
                o2_ref[c * _SLOTS:(c + 1) * _SLOTS, :] = _sub_tails(
                    G2_ref[c * rg:(c + 1) * rg, :],
                    acc[:, c * t2:(c + 1) * t2])


def _block_geom(q: int, T: int, nprod: int, naux: int):
    """(Lb, qp): row-block size from the VMEM budget and the padded row
    count. Measured on the chained px6 pipeline (gaussian3): a 2048-row
    block is fastest at 4K (0.512 vs 0.522 ms at 4096) and 4096 at 8K
    (2.38 vs 2.52 at 2048) — fewer grid steps win once the row count
    outgrows the cap. When the chosen cap does not divide q, Lb is
    rebalanced downward so the same number of blocks splits q with <128
    rows of padding waste each (an unbalanced split can pad up to ~50%:
    q=8192 at Lb=6144 would pad to 12288)."""
    per_line = T * 4 * (2 + naux)
    lb_cap = 2048 if q <= 4096 else 4096
    Lb = max(8, min(((_VMEM_BUDGET // per_line) // 128) * 128, lb_cap))
    if q < Lb:
        Lb = max(8, min(((q + 7) // 8) * 8, Lb))
    elif q > Lb:
        nb = -(-q // Lb)
        per_blk = -(-q // nb)
        Lb = -(-per_blk // 128) * 128
    qp = -(-q // Lb) * Lb
    return Lb, qp


def _tails_gate(rot: bool, q: int, qp: int, Lb: int, next_tails):
    """(kt, ka): static geometry gates for in-kernel next-dim tails — rot
    emit, no lane padding, and either the lane axis IS the next pass's
    tiled scan axis (images) or lane blocks hold whole next-axis extents
    (volumes)."""
    kt = ka = 0
    if next_tails is not None:
        Gcat2, n2, T2 = next_tails
        if np.asarray(Gcat2).shape[1] > _SLOTS:
            return kt, ka  # multi-slot next pass: no chaining
        q2 = n2 * T2
        if rot and qp == q and Lb % T2 == 0:
            if q == q2:
                kt = Lb // T2
            elif q % q2 == 0 and Lb % q2 == 0:
                kt, ka = n2, Lb // q2
    return kt, ka


def _expand_stack(M, n: int):
    """(nv, ...) matrix stack -> per-tile (n, ...) float32 (min-index
    broadcast of a uniform stack).

    Returns NUMPY, not jnp: these stacks are closed over by custom-VJP
    bwd twins, and a jnp constant materialized at build/trace time breaks
    the shard_map+jit transpose (see CLAUDE.md / dimfuse._split_einsum).
    jnp.einsum embeds a numpy operand at whatever trace level consumes it.
    """
    M = np.asarray(M, np.float64)
    return np.asarray(M[np.minimum(np.arange(n), M.shape[0] - 1)],
                      np.float32)


def _stencil_flat(yf, taps, start: str, end: str):
    """Global-shift twin of :func:`_stencil_rows` on the flat (n·T, q)
    rot layout — per-tile halo slices equal global shifts."""
    L, q = yf.shape
    out = None
    for d, c in taps:
        if d > 0:
            tail = (jnp.broadcast_to(yf[L - 1:L], (d, q)) if end == "clamp"
                    else jnp.zeros((d, q), yf.dtype))
            sh = jnp.concatenate([yf[d:], tail], axis=0)
        elif d < 0:
            head = (jnp.broadcast_to(yf[0:1], (-d, q)) if start == "clamp"
                    else jnp.zeros((-d, q), yf.dtype))
            sh = jnp.concatenate([head, yf[:d]], axis=0)
        else:
            sh = yf
        t = c * sh
        out = t if out is None else out + t
    return out


def _completion_ref(x, Ncat, eaux, *, Btot, Rcat, S, rot,
                    carries_transposed, next_tails, kt, ka, epilogue,
                    st_static=None):
    """Einsum twin of the completion kernel — mathematically identical
    (f32 grade), used as the transpose/VJP rule (pallas_call itself has no
    autodiff). Must mirror the kernel's output STRUCTURE exactly."""
    q, n, T = x.shape
    Bn = _expand_stack(Btot, n)              # (n, T, T)
    Rn = _expand_stack(Rcat, n)              # (n, T, S)
    xf = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # TPU default f32 dot is bf16-grade;
    # the twin must match the kernel's f32 grade or TPU gradients degrade
    if carries_transposed:
        Ncore = Ncat.astype(jnp.float32)[:, :S, :]         # (n, S, q)
        y = (jnp.einsum("nos,qns->qno", Bn, xf, precision=hi)
             + jnp.einsum("nou,nuq->qno", Rn, Ncore, precision=hi))
    else:
        y = (jnp.einsum("nos,qns->qno", Bn, xf, precision=hi)
             + jnp.einsum("nou,qnu->qno", Rn,
                          Ncat.astype(jnp.float32), precision=hi))
    braw2 = None
    if next_tails is not None and kt:
        Gcat2, n2, T2 = next_tails
        nv2, S2, _ = np.asarray(Gcat2).shape
        Gp2 = np.zeros((n2, _SLOTS, T2), np.float64)
        Gp2[:, :S2] = np.asarray(Gcat2, np.float64)[
            np.minimum(np.arange(n2), nv2 - 1)
        ]
        G2n = jnp.asarray(Gp2, jnp.float32)
        yflat = jnp.transpose(y, (1, 2, 0)).reshape(n * T, q)
        if ka:
            ra = q // (n2 * T2)
            yq = yflat.reshape(n * T, ra, n2, T2)
            braw2 = jnp.einsum("cst,ract->csra", G2n, yq, precision=hi)
        else:
            yq = yflat.reshape(n * T, n2, T2)
            braw2 = jnp.einsum("cst,rct->csr", G2n, yq,
                               precision=hi)[..., None]
    if st_static is not None or epilogue is not None:
        flat = (jnp.transpose(y, (1, 2, 0)).reshape(n * T, q)
                if rot else y.reshape(q, n * T))
        if st_static is not None:
            flat = _stencil_flat(flat, st_static["taps"],
                                 st_static["start"], st_static["end"])
        if epilogue is not None:
            flat = epilogue(flat, *(jnp.asarray(a, jnp.float32)
                                    for a in eaux))
        y = (flat.reshape(n, T, q) if rot
             else flat.reshape(q, n, T))
    elif rot:
        y = jnp.transpose(y, (1, 2, 0))
    y = y.astype(x.dtype)
    if next_tails is not None:
        return y, braw2
    return y


def completion_pass(x, Btot, Rcat, Ncat, *, rot: bool, nprod: int = 4,
                    interpret: bool = False,
                    carries_transposed: bool = False,
                    next_tails=None, epilogue=None, eaux=(), stencil=None):
    """Split-bf16 completion over a (q, n, T) array.

    ``x``: (q, n, T) f32 — or bf16 with ``nprod=1`` (the bf16 storage mode:
    plain single-product dots, bf16 emit, f32 carries/accumulation; half
    the HBM traffic of the f32 modes); ``Btot``: (nv, T, T)
    with nv in {1, n} (per-tile variant stack for clamp/pad); ``Rcat``:
    (nv, T, S); ``Ncat``: (q, n, S) f32 incoming carries (S = ΣK ≤ 8) — or,
    with ``carries_transposed``, already in the kernel's slot-padded
    (n, 8, q) layout (as :func:`tails_pass`/``pad_solve_matrix`` produce).
    Returns (n, T, q) when ``rot`` else (q, n, T).

    ``epilogue(out, *aux)``: elementwise combine applied to each out-block
    IN VMEM before it is written — no separate post-kernel stream. Each
    array in ``eaux`` must already be in the kernel's flat OUTPUT layout:
    (n·T, q) when ``rot`` else (q, n·T). Mutually exclusive with
    ``next_tails`` (the chained tails are pre-epilogue filter state).

    ``next_tails=(Gcat2, n2, T2)`` (rot only): also extract the NEXT
    dimension pass's local tails from the emitted blocks — ``Gcat2``:
    (nv2, S2, T2) per-scan tail rows of the next pass, whose scan axis is
    this pass's innermost lane axis (q == n2·T2 for images; q a multiple
    of n2·T2 for volumes, where the other rotated row axes ride the
    lanes too). Returns ``(y, braw2)`` where ``braw2`` is the
    (n2, 8, n·T, q/(n2·T2)) slot-padded transposed tails whose trailing
    two axes flatten into the next pass's line order — or ``(y, None)``
    when the static geometry gates fail (caller falls back to
    :func:`tails_pass`).
    """
    q, n, T = x.shape
    S = np.asarray(Rcat).shape[-1]
    assert S <= _MAX_S, "carry slots exceed the kernel's multi-slot quantum"
    sl = slots_for(S)
    assert epilogue is None or next_tails is None, (
        "epilogue and next_tails are mutually exclusive (chained tails are "
        "pre-epilogue filter state)"
    )
    nv = np.asarray(Btot).shape[0]
    assert nv in (1, n), "Btot stack must be uniform or per-tile"
    nc = _nchunks(nprod)
    pairs = _prods(nprod)
    Bs = _split_const(Btot, nc)
    # Stacked contraction: B chunks tiled along one nprod*T axis (and R
    # chunks along nprod*sl), matching the kernel's in-VMEM x/carry concat.
    Bcat_k = np.concatenate([Bs[i] for i, _ in pairs], axis=-1)
    Rp = np.zeros((max(nv, n), T, sl), np.float64)
    Rp[:, :, :S] = np.asarray(Rcat, np.float64)[
        np.minimum(np.arange(n), nv - 1)
    ]
    Rs = _split_const(Rp, nc)
    Rcat_k = np.concatenate([Rs[i] for i, _ in pairs], axis=-1)

    Lb, qp = _block_geom(q, T, nprod, len(eaux))
    # Cross-pass tails chaining assumes the single-slot carry layout on
    # both sides (image pipelines, ΣK ≤ 8); multi-slot passes skip it.
    kt, ka = (_tails_gate(rot, q, qp, Lb, next_tails) if sl == _SLOTS
              else (0, 0))
    if next_tails is not None:
        Gcat2, n2, T2 = next_tails

    # Shifted-tap stencil consumer (rot only): prev/nxt are the neighbor
    # tiles' completed halo strips (see dimfuse's halo derivation); zero
    # strips at the global ends give "zero" border semantics, in-kernel
    # row selects give "clamp". Halo inputs get ZERO cotangents — the VJP
    # twin recomputes the stencil from the global output, so the (x, Ncat)
    # cotangents already carry the full consumer gradient.
    st_static = None
    halos = ()
    if stencil is not None:
        assert rot and next_tails is None, (
            "stencil epilogue requires rot emit and no tails chaining"
        )
        prev_h = stencil.get("prev")
        nxt_h = stencil.get("nxt")
        halos = tuple(a for a in (prev_h, nxt_h) if a is not None)
        st_static = dict(
            taps=tuple((int(d), float(c)) for d, c in stencil["taps"]),
            hhi8=0 if prev_h is None else int(prev_h.shape[1]),
            hlo8=0 if nxt_h is None else int(nxt_h.shape[1]),
            n=n, T=T, start=stencil.get("start", "zero"),
            end=stencil.get("end", "zero"))
    nhalo = len(halos)

    def _run(x, Ncat, *rest):
        halos_r, eaux = rest[:nhalo], rest[nhalo:]
        if qp != q:
            x = jnp.pad(x, ((0, qp - q), (0, 0), (0, 0)))
        xf = x.reshape(qp, n * T)
        if carries_transposed:
            Nt = Ncat.astype(jnp.float32)  # (n, 8, q)
            if qp != q:
                Nt = jnp.pad(Nt, ((0, 0), (0, 0), (0, qp - q)))
        else:
            Nc = Ncat
            if qp != q:
                Nc = jnp.pad(Nc, ((0, qp - q), (0, 0), (0, 0)))
            # Carries transposed to (n, sl, qp): slot-padded sublane layout.
            Nt = jnp.transpose(Nc.astype(jnp.float32), (1, 2, 0))
            if S < sl:
                Nt = jnp.pad(Nt, ((0, 0), (0, sl - S), (0, 0)))
        bidx = (lambda t, l: (t, 0, 0)) if nv > 1 else (lambda t, l: (0, 0, 0))
        kern = partial(_completion_kernel, nprod=nprod, rot=rot, kt=kt,
                       t2=(T2 if kt else 0), ka=ka, naux=len(eaux),
                       epilogue=epilogue, stencil=st_static)
        # Output dtype follows the storage dtype (bf16 mode emits bf16
        # blocks — half the write traffic); extracted tails stay f32.
        out_shape = (
            jax.ShapeDtypeStruct((n * T, qp), x.dtype)
            if rot
            else jax.ShapeDtypeStruct((qp, n * T), x.dtype)
        )
        out_spec = (
            pl.BlockSpec((T, Lb), lambda t, l: (t, l),
                         memory_space=pltpu.VMEM)
            if rot
            else pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                              memory_space=pltpu.VMEM)
        )
        in_specs = [
            pl.BlockSpec((1, T, nprod * T), bidx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, nprod * sl), lambda t, l: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sl, Lb), lambda t, l: (t, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                         memory_space=pltpu.VMEM),
        ]
        operands = [Bcat_k, Rcat_k, Nt, xf]
        if kt:
            nv2, S2, _ = np.asarray(Gcat2).shape
            Gp2 = np.zeros((n2, _SLOTS, T2), np.float64)
            Gp2[:, :S2] = np.asarray(Gcat2, np.float64)[
                np.minimum(np.arange(n2), nv2 - 1)
            ]
            if _TAILS_F32_DOT:
                g2rows, g2w = _SLOTS, T2
                G2k = np.asarray(Gp2, np.float32).reshape(
                    n2 * _SLOTS, T2)
            else:
                # M-stacked level constant (see _tails_kernel): per tile
                # (nlev·8, nc·T2), chunk i at the column block of x_j.
                lgs2 = _level_groups(nprod)
                g2rows, g2w = len(lgs2) * _SLOTS, nc * T2
                Gs2 = _split_const_np(Gp2, nc)
                G2k = _mstack_level_const(Gs2, lgs2, nc, np).reshape(
                    n2 * g2rows, nc * T2)
            if ka:
                in_specs.append(
                    pl.BlockSpec((n2 * g2rows, g2w),
                                 lambda t, l: (0, 0),
                                 memory_space=pltpu.VMEM)
                )
                ra = q // (n2 * T2)
                out_shape = (
                    out_shape,
                    jax.ShapeDtypeStruct((ra, n2 * _SLOTS, n * T),
                                         jnp.float32),
                )
                out_spec = (
                    out_spec,
                    pl.BlockSpec((ka, n2 * _SLOTS, T),
                                 lambda t, l: (l, 0, t),
                                 memory_space=pltpu.VMEM),
                )
            else:
                in_specs.append(
                    pl.BlockSpec((kt * g2rows, g2w),
                                 lambda t, l: (l, 0),
                                 memory_space=pltpu.VMEM)
                )
                out_shape = (
                    out_shape,
                    jax.ShapeDtypeStruct((n2 * _SLOTS, n * T), jnp.float32),
                )
                out_spec = (
                    out_spec,
                    pl.BlockSpec((kt * _SLOTS, T), lambda t, l: (l, t),
                                 memory_space=pltpu.VMEM),
                )
            operands.append(G2k)
        for h in halos_r:
            if qp != q:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, qp - q)))
            operands.append(h)
            hr = h.shape[1]
            in_specs.append(
                pl.BlockSpec((None, hr, Lb), lambda t, l: (t, 0, l),
                             memory_space=pltpu.VMEM)
            )
        for a in eaux:
            a = jnp.asarray(a, jnp.float32)
            if qp != q:
                a = (jnp.pad(a, ((0, 0), (0, qp - q))) if rot
                     else jnp.pad(a, ((0, qp - q), (0, 0))))
            operands.append(a)
            in_specs.append(
                pl.BlockSpec((T, Lb), lambda t, l: (t, l),
                             memory_space=pltpu.VMEM)
                if rot
                else pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                                  memory_space=pltpu.VMEM)
            )
        y = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(n, qp // Lb),
            in_specs=in_specs,
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(*operands)
        braw2 = None
        if kt:
            y, y2 = y
            # Uniform (n2, 8, nT, r_a) layout: flattening the last two axes
            # yields the NEXT pass's line order (scan-axis-major).
            if ka:
                ra = q // (n2 * T2)
                braw2 = jnp.transpose(
                    y2.reshape(ra, n2, _SLOTS, n * T), (1, 2, 3, 0)
                )
            else:
                braw2 = y2.reshape(n2, _SLOTS, n * T, 1)
        if rot:
            y = y.reshape(n, T, qp)
            y = y[..., :q] if qp != q else y
        else:
            y = y.reshape(qp, n, T)
            y = y[:q] if qp != q else y
        if next_tails is not None:
            return y, braw2
        return y

    # The pass is (piecewise-)differentiable math but pallas_call has no
    # autodiff rule; forward runs the kernel, the VJP runs through the
    # einsum twin (jax transposes einsums natively). Keeps jax.grad
    # working through the shipping px/bf16 defaults.
    def _ref(x, Ncat, *eaux):
        return _completion_ref(
            x, Ncat, eaux, Btot=Btot, Rcat=Rcat, S=S, rot=rot,
            carries_transposed=carries_transposed, next_tails=next_tails,
            kt=kt, ka=ka, epilogue=epilogue, st_static=st_static)

    f = jax.custom_vjp(_run)

    def _fwd(x, Ncat, *rest):
        return _run(x, Ncat, *rest), (x, Ncat, rest)

    def _bwd(res, ct):
        x0, N0, rest0 = res
        cts = jax.vjp(
            lambda xx, nn, *ee: _ref(xx, nn, *ee), x0, N0, *rest0[nhalo:]
        )[1](ct)
        return (cts[0], cts[1],
                *(jnp.zeros_like(h) for h in rest0[:nhalo]), *cts[2:])

    f.defvjp(_fwd, _bwd)
    return f(x, Ncat, *halos, *eaux)


def _tails_kernel(G_ref, x_ref, o_ref, *, nprod: int, nlev: int, rows: int):
    """One (Lb, T) x-block -> (rows, Lb) slot-padded transposed tails block.

    M-stacked level dots (see final2d's ``_cat_split_mstack``): every
    compensated level rides ONE dot against the chunk-stacked scratch
    (nc K-tiles instead of the pair-concat's nprod, and no 2x chunk
    duplication in the operand); the level sum is (nlev-1) row-group adds
    on the skinny output — measured 2x fewer scratch K-passes on the 4K
    px6 moments twin (0.513 -> 0.480 ms pipeline)."""
    nc = _nchunks(nprod)
    xstk = _stack_split(x_ref[:], nc, axis=1)
    dn = (((1,), (1,)), ((), ()))  # (nlev*rows,nc*T)x(Lb,nc*T) -> (.,Lb)
    acc = jax.lax.dot_general(G_ref[0], xstk, dn,
                              preferred_element_type=jnp.float32)
    out = acc[:rows]
    for g in range(1, nlev):  # smallest-magnitude level first
        out = out + acc[g * rows:(g + 1) * rows]
    o_ref[:] = out


def tails_pass(x, Gcat, *, nprod: int = 4, interpret: bool = False,
               extra_rows=None):
    """Split-bf16 local-tails extraction over a (q, n, T) array.

    ``Gcat``: (nv, S, T) stacked per-scan tail rows (nv in {1, n}).
    Returns the transposed slot-padded layout (n, 8, q) that
    :func:`pad_solve_matrix`'s solve and :func:`completion_pass`'s carry
    input consume directly — one read of X, no HIGHEST einsum copies.

    ``extra_rows``: optional (nv2, He, T) per-tile row stack appended BELOW
    the ⌈S/8⌉·8 tail slots — the same read then also emits ``E·x`` per tile
    (stencil-halo base rows, see ``completion_pass``'s stencil). Output
    grows to (n, sl + ceil8(He), q); rows [sl, sl+He) carry E·x.
    """
    q, n, T = x.shape
    nv, S, _ = np.asarray(Gcat).shape
    assert S <= _MAX_S and nv in (1, n)
    sl = slots_for(S)
    He = 0 if extra_rows is None else int(np.asarray(extra_rows).shape[1])
    He8 = -(-He // _SLOTS) * _SLOTS
    rows = sl + He8
    nc = _nchunks(nprod)
    Gp = np.zeros((max(nv, n), rows, T), np.float64)
    Gp[:, :S] = np.asarray(Gcat, np.float64)[np.minimum(np.arange(n), nv - 1)]
    if He:
        E = np.asarray(extra_rows, np.float64)
        Gp[:, sl:sl + He] = E[np.minimum(np.arange(n), E.shape[0] - 1)]
    Gs = _split_const_np(Gp, nc)
    lgs = _level_groups(nprod)
    nlev = len(lgs)
    Gcat_k = _mstack_level_const(Gs, lgs, nc, np)  # numpy (operand const)

    Lb, qp = _block_geom(q, T, nprod, 0)

    def _run(x):
        if qp != q:
            x = jnp.pad(x, ((0, qp - q), (0, 0), (0, 0)))
        xf = x.reshape(qp, n * T)
        y = pl.pallas_call(
            partial(_tails_kernel, nprod=nprod, nlev=nlev, rows=rows),
            out_shape=jax.ShapeDtypeStruct((n * rows, qp), jnp.float32),
            grid=(n, qp // Lb),
            in_specs=(
                [pl.BlockSpec((1, nlev * rows, nc * T),
                              lambda t, l: (t, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                              memory_space=pltpu.VMEM)]
            ),
            out_specs=pl.BlockSpec((rows, Lb), lambda t, l: (t, l),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(Gcat_k, xf)
        y = y.reshape(n, rows, qp)
        return y[..., :q] if qp != q else y

    # VJP via the einsum twin (see completion_pass): y = Gp ∘ x, linear.
    # numpy, not jnp — bwd closure constant (see _expand_stack's note).
    Gn = np.asarray(Gp, np.float32)

    def _ref(x):
        return jnp.einsum("nst,qnt->nsq", Gn, x.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)

    f = jax.custom_vjp(_run)
    f.defvjp(lambda x: (_run(x), x),
             lambda x0, ct: jax.vjp(_ref, x0)[1](ct))
    return f(x)


def tails_pass_traced(x, Gcat, *, nprod: int = 6, interpret: bool = False):
    """Traced-matrix twin of :func:`tails_pass` (uniform stack).

    ``Gcat`` is a TRACED (S, T) jnp matrix — the learnable executor's
    coefficient-dependent tail rows. Same kernel; the chunk operands are
    built with in-graph bf16 splits (3 chunks of an f32 matrix are exact),
    and the custom VJP returns cotangents for BOTH ``x`` and ``Gcat`` via
    the einsum twin, so coefficient training differentiates through the
    kernel path."""
    q, n, T = x.shape
    S = int(Gcat.shape[0])
    assert S <= _SLOTS
    nc = _nchunks(nprod)
    lgs = _level_groups(nprod)
    nlev = len(lgs)
    Lb, qp = _block_geom(q, T, nprod, 0)

    def _run(x, Gcat):
        Gp = jnp.pad(Gcat.astype(jnp.float32), ((0, _SLOTS - S), (0, 0)))
        Gs = _split_vmem(Gp, nc)
        # M-stacked level constant, built IN-GRAPH from the traced matrix
        # (same single builder as the numpy static paths).
        Gcat_k = _mstack_level_const(Gs, lgs, nc, jnp)[None]
        if qp != q:
            x = jnp.pad(x, ((0, qp - q), (0, 0), (0, 0)))
        xf = x.reshape(qp, n * T)
        y = pl.pallas_call(
            partial(_tails_kernel, nprod=nprod, nlev=nlev, rows=_SLOTS),
            out_shape=jax.ShapeDtypeStruct((n * _SLOTS, qp), jnp.float32),
            grid=(n, qp // Lb),
            in_specs=[
                pl.BlockSpec((1, nlev * _SLOTS, nc * T),
                             lambda t, l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_SLOTS, Lb), lambda t, l: (t, l),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(Gcat_k, xf)
        y = y.reshape(n, _SLOTS, qp)
        return y[..., :q] if qp != q else y

    def _ref(x, Gcat):
        Gp = jnp.pad(Gcat.astype(jnp.float32), ((0, _SLOTS - S), (0, 0)))
        return jnp.einsum("st,qnt->nsq", Gp, x.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)

    f = jax.custom_vjp(_run)
    f.defvjp(lambda x, G: (_run(x, G), (x, G)),
             lambda res, ct: jax.vjp(_ref, res[0], res[1])[1](ct))
    return f(x, Gcat)


def completion_pass_traced(x, Btot, Rcat, Nt8, *, nprod: int = 6,
                           interpret: bool = False):
    """Traced-matrix twin of :func:`completion_pass` (rot=False, uniform
    stack, transposed carries).

    ``Btot`` (T, T) and ``Rcat`` (T, S) are TRACED jnp matrices; ``Nt8``
    is the slot-padded transposed carry array (n, 8, q). Same kernel as
    the static path; the custom VJP differentiates through x, the
    matrices, AND the carries (einsum twin) — the learnable executor's
    pass-B at px-kernel speed."""
    q, n, T = x.shape
    S = int(Rcat.shape[-1])
    assert S <= _SLOTS
    nc = _nchunks(nprod)
    pairs = _prods(nprod)
    Lb, qp = _block_geom(q, T, nprod, 0)
    kern = partial(_completion_kernel, nprod=nprod, rot=False, naux=0,
                   epilogue=None, stencil=None)

    def _run(x, Btot, Rcat, Nt8):
        Bs = _split_vmem(Btot.astype(jnp.float32), nc)
        Bcat_k = jnp.concatenate([Bs[i] for i, _ in pairs], axis=-1)[None]
        Rp = jnp.pad(Rcat.astype(jnp.float32),
                     ((0, 0), (0, _SLOTS - S)))
        Rs = _split_vmem(Rp, nc)
        Rcat_k = jnp.concatenate([Rs[i] for i, _ in pairs], axis=-1)[None]
        if qp != q:
            x = jnp.pad(x, ((0, qp - q), (0, 0), (0, 0)))
            Nt8 = jnp.pad(Nt8, ((0, 0), (0, 0), (0, qp - q)))
        xf = x.reshape(qp, n * T)
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((qp, n * T), jnp.float32),
            grid=(n, qp // Lb),
            in_specs=[
                pl.BlockSpec((1, T, nprod * T), lambda t, l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, nprod * _SLOTS), lambda t, l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _SLOTS, Lb), lambda t, l: (t, 0, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Lb, T), lambda t, l: (l, t),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(Bcat_k, Rcat_k, Nt8.astype(jnp.float32), xf)
        y = y.reshape(qp, n, T)
        return y[:q] if qp != q else y

    def _ref(x, Btot, Rcat, Nt8):
        hi = jax.lax.Precision.HIGHEST
        return (jnp.einsum("os,qns->qno", Btot.astype(jnp.float32),
                           x.astype(jnp.float32), precision=hi)
                + jnp.einsum("ou,nuq->qno", Rcat.astype(jnp.float32),
                             Nt8.astype(jnp.float32)[:, :S, :],
                             precision=hi))

    f = jax.custom_vjp(_run)
    f.defvjp(
        lambda x, B, R, N: (_run(x, B, R, N), (x, B, R, N)),
        lambda res, ct: jax.vjp(_ref, *res)[1](ct),
    )
    return f(x, Btot, Rcat, Nt8)


def pad_solve_matrix(CMfull, n: int, S: int) -> np.ndarray:
    """Embed the (n·S, n·S) combined-solve matrix into the slot-padded
    layout: (n·sl, n·sl) with sl = ⌈S/8⌉·8, zero rows/cols on the pad
    slots — so the solve can run directly on :func:`tails_pass` output and
    feed :func:`completion_pass` without any slot repacking."""
    CM = np.asarray(CMfull)
    sl = slots_for(S)
    out = np.zeros((n * sl, n * sl), CM.dtype)
    for t in range(n):
        for u in range(n):
            out[t * sl:t * sl + S, u * sl:u * sl + S] = (
                CM[t * S:(t + 1) * S, u * S:(u + 1) * S]
            )
    return out


def completion_ok(T: int, q: int, n: int, S: int, interpret: bool) -> bool:
    """Static applicability gate: the Mosaic path needs the 128-lane tile,
    carries within the multi-slot quantum (⌈S/8⌉ 8-sublane slots, S ≤ 56),
    and a bounded tile count (the audio-scale n ~ 10^4 chain keeps the
    einsum path). Interpret mode accepts the same shapes so CPU tests
    cover the kernel structure."""
    return T == 128 and S <= _MAX_S and n <= 512 and q >= 8
